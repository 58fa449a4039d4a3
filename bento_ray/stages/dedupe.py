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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bento_ray.util import to_table


def _composite_codes(t: pa.Table, key_cols: list[str]) -> np.ndarray:
    """EXACT per-row key codes (int64, < num_rows) via repeated
    dictionary-encode — equal codes ⟺ equal key tuples, no hashing, no
    collisions, and no pandas object conversion (the old
    ``to_pandas().duplicated()`` materialized Python strings per batch
    on the hot path). Nulls get their own code (pandas-duplicated
    parity: null == null). Re-encoding after each column keeps
    magnitudes < num_rows so the pairing multiply can't overflow."""
    comp: np.ndarray | None = None
    for c in key_cols:
        col = t.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = (col.combine_chunks() if col.num_chunks != 1
                   else col.chunk(0))
        if isinstance(col, pa.ChunkedArray):  # combine_chunks → 1 chunk
            col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
        d = col if pa.types.is_dictionary(col.type) else col.dictionary_encode()
        card = len(d.dictionary)
        idx = d.indices.fill_null(card).cast(pa.int64()).to_numpy()
        if comp is None:
            comp = idx
        else:
            pair = comp * np.int64(card + 1) + idx
            comp = (pa.array(pair).dictionary_encode()
                    .indices.cast(pa.int64()).to_numpy())
    return comp if comp is not None else np.zeros(len(t), np.int64)


def _first_mask(comp: np.ndarray, keep_last: bool) -> np.ndarray:
    """Boolean mask of the first (or last) occurrence per code."""
    mask = np.zeros(len(comp), bool)
    if keep_last:
        _, first = np.unique(comp[::-1], return_index=True)
        mask[len(comp) - 1 - first] = True
    else:
        _, first = np.unique(comp, return_index=True)
        mask[first] = True
    return mask


def dedupe_pane(t: pa.Table, key_cols: list[str], strategy: str = "FIFO") -> pa.Table:
    """Bento dedupe within one semantic batch. FIFO keeps first
    occurrence per key, LIFO keeps last; output preserves the original
    position of each kept row (processor_dedupe.go:165-201)."""
    t = to_table(t)
    if len(t) == 0:
        return t
    mask = _first_mask(_composite_codes(t, key_cols),
                       strategy.upper() == "LIFO")
    return t.filter(pa.array(mask))


def _partial_dedupe(key_cols: list[str], order_cols: list[str] | None, keep: str):
    def _f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        comp = _composite_codes(t, key_cols)
        if order_cols:
            # winner per key = extreme order value, earliest original
            # row on full ties (the old stable pandas sort semantics);
            # __rowidx forces the tie rule since sort stability isn't
            # part of Arrow's contract
            direction = "ascending" if keep == "first" else "descending"
            tt = t.append_column(
                "__rowidx", pa.array(np.arange(len(t), dtype=np.int64)))
            si = pc.sort_indices(
                tt, sort_keys=[(c, direction) for c in order_cols]
                + [("__rowidx", "ascending")]).to_numpy().astype(np.int64)
            _, first = np.unique(comp[si], return_index=True)
            winners = np.sort(si[first])
            mask = np.zeros(len(t), bool)
            mask[winners] = True
        else:
            mask = _first_mask(comp, keep == "last")
        return t.filter(pa.array(mask))
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
