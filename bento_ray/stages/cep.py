"""Complex-event-processing primitives (the north rule names CEP
alongside windows/watermarks/joins; the reference engine reaches the
same use cases through Bloblang + cache state —
`/root/reference/internal/impl/pure/processor_cache.go` patterns —
here it is a first-class distributed operator).

``match_event_sequence`` finds CONSECUTIVE per-key event-type
sequences (MATCH_RECOGNIZE's strict contiguity / Flink CEP `next`)
completed within a time bound. Distributed shape: one hash exchange
co-locates each key's events (coarse partitions — P vectorized scans,
not one Python callback per key), then a numpy lexsort + shifted-
comparison pass detects matches with zero per-row Python. State never
outlives a partition scan; skewed keys cost only their share of one
partition (salt upstream if one key dominates a partition's RAM).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["match_event_sequence"]


def match_event_sequence(ds, pattern: list[str], *, within_us: int,
                         key_col: str = "user_id", ts_col: str = "ts",
                         type_col: str = "event_type",
                         id_col: str = "event_id",
                         num_parts: int | None = None):
    """Emit one row per completed match: (key, first_event_id,
    last_event_id, span_us). A match is ``len(pattern)`` CONSECUTIVE
    events of one key (ordered by ts, id — deterministic under ties)
    whose types equal ``pattern`` and whose total span ≤ within_us.
    Overlapping matches all report (no skip-past-last-row policy)."""
    if len(pattern) < 2:
        raise ValueError("pattern needs at least two steps")
    from bento_ray.util import stable_hash

    if num_parts is None:
        from bento_ray.util import cluster_cpus
        num_parts = max(4, cluster_cpus())
    P = num_parts
    k = len(pattern)

    def _part(t: pa.Table) -> pa.Table:
        h = stable_hash(t.column(key_col)) % np.uint64(P)
        return t.append_column("part", pa.array(h.astype(np.int64)))

    def _scan(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        ts = t.column(ts_col).cast(pa.int64()).to_numpy()
        typ = t.column(type_col).to_numpy(zero_copy_only=False)
        eid = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, key))
        key, ts, typ, eid = key[order], ts[order], typ[order], eid[order]
        n = len(key)
        if n < k:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                "first_event_id": pa.array([], pa.int64()),
                "last_event_id": pa.array([], pa.int64()),
                "span_us": pa.array([], pa.int64()),
            })
        m = np.ones(n - k + 1, bool)
        for j, want in enumerate(pattern):
            m &= typ[j:n - k + 1 + j] == want
        m &= key[k - 1:] == key[:n - k + 1]          # same key throughout
        span = ts[k - 1:] - ts[:n - k + 1]
        m &= span <= within_us
        idx = np.flatnonzero(m)
        return pa.table({
            key_col: pa.array(key[idx], pa.int64()),
            "first_event_id": pa.array(eid[idx], pa.int64()),
            "last_event_id": pa.array(eid[idx + k - 1], pa.int64()),
            "span_us": pa.array(span[idx], pa.int64()),
        })

    return (ds.map_batches(_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda t: _scan(t.drop_columns(["part"])),
                        batch_format="pyarrow"))
