"""Shared helpers: stable hashing, timestamp formatting, table utils."""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pyarrow as pa


def stable_hash(values) -> np.ndarray:
    """Deterministic uint64 hash of a column, stable across processes and
    nodes (pandas' fixed-key siphash). Used for hash partitioning,
    dedupe keys and salted-key skew mitigation — never exposed in query
    results."""
    # local import: pandas costs ~0.4s of every fresh worker
    # process's cold start (this module is on the import path of every
    # actor and task) and only these helpers need it
    import pandas as pd

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pandas()
    elif isinstance(values, np.ndarray):
        values = pd.Series(values)
    return pd.util.hash_pandas_object(values, index=False).to_numpy()


def salted_partition(keys, num_partitions: int, salt_bits: int = 0) -> np.ndarray:
    """Partition id per key: ``hash(key) % P``; with ``salt_bits`` the
    ROW POSITION (mod ``2**salt_bits``) is folded into the hash so a
    hot key's rows spread across up to ``2**salt_bits`` partitions
    (requires a downstream re-combine pass keyed on the unsalted key).
    The salt must vary per row — a salt derived from the key hash
    alone is a pure function of the key and provides zero skew
    relief."""
    h = stable_hash(keys)
    if salt_bits:
        salt = (np.arange(len(h), dtype=np.uint64)
                & np.uint64((1 << salt_bits) - 1))
        h = h ^ ((salt + np.uint64(1))
                 * np.uint64(0x9E3779B97F4A7C15))
    return (h % np.uint64(num_partitions)).astype(np.int64)


def rfc3339nano(ts_us: int) -> str:
    """Go ``time.RFC3339Nano`` formatting of a UTC microsecond timestamp:
    fractional seconds with trailing zeros trimmed, omitted when zero,
    ``Z`` suffix — matches the reference's ``window_end_timestamp``
    metadata (buffer_system_window.go:376)."""
    sec, micro = divmod(int(ts_us), 1_000_000)
    base = datetime.fromtimestamp(sec, tz=timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
    if micro:
        frac = f".{micro:06d}".rstrip("0")
        return f"{base}{frac}Z"
    return base + "Z"


def cluster_cpus(default: int = 8) -> int:
    """CPU count of the running cluster (``default`` when no Ray
    session is reachable) — the one probe every stage shares."""
    try:
        import ray

        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def resolve_concurrency(c: int | None, cap: int = 4) -> int:
    """An explicit concurrency wins; None falls back to
    :func:`default_concurrency` (the shared actor-pool sizing
    policy — previously copy-pasted as ``_conc`` in five modules)."""
    return c if c is not None else default_concurrency(cap)


def default_concurrency(cap: int = 4) -> int:
    """Actor-pool size that leaves CPU headroom: an actor pool sized at
    or above the CPU count starves the surrounding task stages (and can
    stall an execution waiting for actors that never get slots)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, min(cap, cpus // 2))


def duckdb_round(a, digits: int = 4) -> np.ndarray:
    """Bit-exact emulation of DuckDB's ROUND(x, d) on DOUBLE
    (std::round half-away-from-zero after scaling): used so Ray-side
    aggregate outputs hash identically to the DuckDB oracle."""
    a = np.asarray(a, np.float64)
    f = 10.0 ** digits
    return np.trunc(a * f + np.where(a >= 0, 0.5, -0.5)) / f


def to_table(batch) -> pa.Table:
    """Normalise a map_batches input to a pyarrow Table."""
    if isinstance(batch, pa.Table):
        return batch
    if isinstance(batch, pa.RecordBatch):
        return pa.Table.from_batches([batch])
    import pandas as pd

    if isinstance(batch, pd.DataFrame):
        return pa.Table.from_pandas(batch, preserve_index=False).replace_schema_metadata(None)
    if isinstance(batch, dict):
        return pa.table(batch)
    raise TypeError(f"unsupported batch type {type(batch)}")


def empty_like(schema: pa.Schema) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([], type=f.type) for f in schema], schema=schema
    )


class _BenignEmptySchemaDivergence:
    """Logging filter for one known-benign Ray Data warning.

    Ray's sort-based shuffle (used by groupby/aggregate) represents
    empty key partitions as a schemaless ``pa.table({})``
    (ray/data/_internal/arrow_block.py: ``_empty_table`` at the
    find-partition paths), so downstream operators emit 0-row
    RefBundles whose schema is EMPTY and the executor logs "Operator
    produced a RefBundle with a different schema … new schema: ."
    for every one. Zero-row + empty-schema divergence is harmless
    (the executor itself early-exits the symmetric case where the
    OLD schema is empty); we cannot give those Ray-internal blocks a
    schema from user code, so we drop exactly that message.
    Divergences with a real (non-empty) new schema still surface."""

    def filter(self, record) -> bool:  # logging.Filter protocol
        msg = record.getMessage()
        if "RefBundle with a different schema" not in msg:
            return True
        # empty-Arrow ("new schema: .") and empty-pandas variants of
        # the same Ray-internal empty-partition block
        return not ("new schema: ." in msg
                    or "new schema: PandasBlockSchema(names=[]" in msg)


def quiet_benign_ray_warnings() -> None:
    import logging

    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _BenignEmptySchemaDivergence)
               for f in lg.filters):
        lg.addFilter(_BenignEmptySchemaDivergence())
