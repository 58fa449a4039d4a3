"""Deduplication.

Reference: ``dedupe`` processor
(/root/reference/internal/impl/pure/processor_dedupe.go:160-209): per
message, interpolate a key and ``cache.Add(key)``; drop when the key
exists. ``strategy: FIFO`` keeps the FIRST occurrence per key, ``LIFO``
the LAST (reverse scan + prepend) — both emit survivors in original
positional order.

Two scopes here:

- ``dedupe_pane``: exact reference semantics within one semantic batch
  (window pane) — pure, ordered, vectorized.
- ``dedupe_exact``: dataset-global streaming-safe dedupe. Ray-Data-first
  design: a cheap per-batch partial pass (drops intra-batch dupes with
  zero shuffle) followed by a hash-partitioned ``groupby(key)`` final
  pass keeping the first/last row by an ordering column. The groupby is
  the one unavoidable all-to-all; the partial pass bounds its input to
  ≤ one row per key per batch. Cross-epoch streaming dedupe state lives
  in the actor-pool stage (bento_ray.streaming.actors.PartitionWorker).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from bento_ray.util import to_table


def dedupe_pane(t: pa.Table, key_cols: list[str], strategy: str = "FIFO") -> pa.Table:
    """Bento dedupe within one semantic batch. FIFO keeps first
    occurrence per key, LIFO keeps last; output preserves the original
    position of each kept row (processor_dedupe.go:165-201)."""
    t = to_table(t)
    df = t.select(key_cols).to_pandas()
    keep_last = strategy.upper() == "LIFO"
    mask = ~df.duplicated(keep="last" if keep_last else "first")
    return t.filter(pa.array(mask.to_numpy()))


def _partial_dedupe(key_cols: list[str], order_cols: list[str] | None, keep: str):
    def _f(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if order_cols:
            asc = keep == "first"
            df = df.sort_values(order_cols, ascending=asc, kind="stable")
            df = df.drop_duplicates(subset=key_cols, keep="first")
        else:
            df = df.drop_duplicates(subset=key_cols, keep=keep)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    return _f


def dedupe_exact(ds, key_cols: list[str], keep: str = "first",
                 order_cols: list[str] | None = None):
    """Global exact dedupe: keep the first/last row per key.

    ``order_cols`` define first/last (e.g. ``["warc_ts", "event_id"]``
    — include a unique tie-break column for determinism); without them,
    "first" is arbitrary-but-deterministic within Ray's block order.
    Two-phase: batch-local partial dedupe (no shuffle) → groupby(key)
    final (hash shuffle over ≤ unique-keys-per-block rows)."""
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    ds = ds.map_batches(_partial_dedupe(key_cols, order_cols, keep),
                        batch_format="pyarrow")

    # Final pass: co-locate keys by a COARSE hash partition and run the
    # vectorized drop_duplicates once per partition — P Python calls
    # total, not one per distinct key (groupby(key).map_groups pays a
    # Python callback per group; ruinous at 10^12 distinct keys).
    import numpy as np

    from bento_ray.util import stable_hash

    from bento_ray.util import cluster_cpus

    P = max(4, cluster_cpus())

    def _pid(t: pa.Table) -> pa.Table:
        h = np.zeros(len(t), np.uint64)
        for c in key_cols:
            h = h * np.uint64(1_000_003) + stable_hash(t.column(c))
        return t.append_column(
            "__dpid", pa.array((h % np.uint64(P)).astype(np.int64)))

    final = _partial_dedupe(key_cols, order_cols, keep)

    def _final_part(t: pa.Table) -> pa.Table:
        return final(t.drop_columns(["__dpid"]))

    return (ds.map_batches(_pid, batch_format="pyarrow")
              .groupby("__dpid")
              .map_groups(_final_part, batch_format="pyarrow"))
