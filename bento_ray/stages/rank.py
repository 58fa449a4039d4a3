"""Order-sensitive per-group operators: top-k per group and rolling
per-key aggregates (the reference reaches these via Bloblang +
cache/window state — `/root/reference/internal/impl/pure/processor_cache.go`,
`buffer_system_window.go` patterns; here they are first-class
distributed operators with combiner-shaped shuffles).

``topk_per_group``: per-block prune to ≤k rows per group (the
combiner — the shuffle then moves at most k × groups × blocks rows,
never the input), ONE hash exchange on the group key, per-partition
vectorized final selection. Deterministic under ties via the id
column.

``rolling_aggregate``: event-ordered moving sum/average per key over
the last ``window`` rows (Flink's OVER ROWS window). ONE hash
exchange on the key, then P vectorized partition scans — a shifted
cumulative sum per partition, zero per-row Python. Values are summed
on an integer micro-unit grid so the result is order-independent and
bit-identical to the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["topk_per_group", "rolling_aggregate"]


def _group_topk_table(t: pa.Table, group_cols: list[str],
                      order_col: str, id_col: str, k: int,
                      descending: bool) -> pa.Table:
    """Vectorized per-table top-k per group: lexsort by
    (group…, order, id), detect group runs, keep rank < k. Ties on
    the order column break by ascending id — deterministic."""
    n = len(t)
    if n == 0:
        return t
    order = t.column(order_col).to_numpy(zero_copy_only=False)
    if descending and not np.issubdtype(order.dtype, np.signedinteger) \
            and not np.issubdtype(order.dtype, np.floating):
        raise TypeError(
            f"descending top-k needs a signed-numeric order column; "
            f"got {order.dtype} (negate-based sort would wrap/fail)")
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    gcols = [t.column(c).to_numpy(zero_copy_only=False)
             for c in group_cols]
    sort_order = np.lexsort(
        (ids, -order if descending else order, *reversed(gcols)))
    gsorted = [g[sort_order] for g in gcols]
    new_group = np.zeros(n, bool)
    new_group[0] = True
    for g in gsorted:
        new_group[1:] |= g[1:] != g[:-1]
    starts = np.flatnonzero(new_group)
    rank = np.arange(n) - np.repeat(starts, np.diff(
        np.concatenate([starts, [n]])))
    keep = sort_order[rank < k]
    return t.take(pa.array(np.sort(keep)))


def topk_per_group(ds, group_cols: list[str], order_col: str,
                   id_col: str, k: int, descending: bool = True,
                   num_parts: int | None = None):
    """Top-k rows per group, combiner-pruned.

    Phase 1 (map_batches): each block keeps at most k rows per group —
    any row outside its block-local top-k cannot be in the global
    top-k. Phase 2: hash exchange on the group key + the same
    vectorized selection per partition. The shuffle volume is bounded
    by k × |groups| × blocks regardless of input size; a hot group
    still moves only k rows per block."""
    from bento_ray.util import cluster_cpus, stable_hash

    P = num_parts or max(4, cluster_cpus())

    def _prune(t: pa.Table) -> pa.Table:
        out = _group_topk_table(t, group_cols, order_col, id_col, k,
                                descending)
        h = (stable_hash(out.column(group_cols[0]))
             % np.uint64(P)).astype(np.int64)
        return out.append_column("part", pa.array(h))

    def _final(t: pa.Table) -> pa.Table:
        return _group_topk_table(t.drop_columns(["part"]), group_cols,
                                 order_col, id_col, k, descending)

    return (ds.map_batches(_prune, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_final, batch_format="pyarrow"))


def rolling_aggregate(ds, *, key_col: str, ts_col: str, val_col: str,
                      id_col: str, window: int,
                      num_parts: int | None = None):
    """Per-key rolling window over the last ``window`` rows in
    (ts, id) order: emits every input row as (key, id, roll_cnt,
    roll_sum_micro, roll_avg) where roll_sum_micro is the exact
    integer sum of round(value × 1e6) over the window — the micro-unit
    grid makes the Ray and SQL sums bit-identical regardless of
    summation order — and roll_avg = (sum_micro / cnt) / 1e6 computed
    with the same two IEEE divisions on both engines.

    Distributed shape: ONE hash exchange on the key, then P partition
    scans, each a lexsort + ONE shifted cumulative-sum pass (windowed
    sum = cumsum[i] − cumsum[i−window]) with key-boundary resets
    applied vectorized. State never outlives a partition scan."""
    from bento_ray.util import cluster_cpus, stable_hash

    P = num_parts or max(4, cluster_cpus())
    W = int(window)
    if W < 1:
        raise ValueError("window must be >= 1")

    def _part(t: pa.Table) -> pa.Table:
        h = stable_hash(t.column(key_col)) % np.uint64(P)
        return pa.table({
            "k": t.column(key_col).cast(pa.int64()),
            "t": t.column(ts_col).cast(pa.int64()),
            "i": t.column(id_col).cast(pa.int64()),
            "v": t.column(val_col).cast(pa.float64()),
            "part": pa.array(h.astype(np.int64)),
        })

    def _scan(g: pa.Table) -> pa.Table:
        key = g.column("k").to_numpy()
        ts = g.column("t").to_numpy()
        ids = g.column("i").to_numpy()
        v = g.column("v").to_numpy() * 1e6
        # DuckDB ROUND is half-away-from-zero; np.round is half-even —
        # replicate the SQL convention so the grids agree exactly
        micro = (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)
        order = np.lexsort((ids, ts, key))
        key, ids, micro = key[order], ids[order], micro[order]
        n = len(key)
        # per-row distance to its key-segment start
        new_key = np.ones(n, bool)
        new_key[1:] = key[1:] != key[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new_key, np.arange(n), 0))
        in_seg = np.arange(n) - seg_start          # 0-based offset
        span = np.minimum(in_seg + 1, W)            # rows in window
        csum = np.concatenate([[0], np.cumsum(micro)])
        wsum = csum[np.arange(1, n + 1)] - csum[
            np.arange(1, n + 1) - span]
        avg = (wsum / span) / 1e6
        return pa.table({
            key_col: pa.array(key, pa.int64()),
            id_col: pa.array(ids, pa.int64()),
            "roll_cnt": pa.array(span.astype(np.int64)),
            "roll_sum_micro": pa.array(wsum.astype(np.int64)),
            "roll_avg": pa.array(avg, pa.float64()),
        })

    return (ds.map_batches(_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_scan, batch_format="pyarrow"))
