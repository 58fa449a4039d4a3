"""Joins / lookups.

The reference has no general relational join (SURVEY.md §2.7); its
join-shaped tools are the ``branch``+enrichment lookup (stream-table
join) and the ``sequence`` input's ``sharded_join``. Ray-Data-first
equivalents:

- ``broadcast_join``: the small side is ``ray.put`` once and read by
  every task — a broadcast hash join inside ``map_batches``, zero
  shuffle. This is the stream-table enrichment join of the north rule.
- ``broadcast_join_versioned``: stateful last-write-wins variant — the
  dimension has timestamped versions; each fact row joins the newest
  version with ``version_ts ≤ fact_ts`` (merge_asof per batch).
- ``shuffle_join``: both sides large — explicit bucketed hash join
  (add ``bucket = hash(key) % B``, groupby bucket, pairwise merge), the
  portable large-large pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _small_to_pandas(small) -> pd.DataFrame:
    if isinstance(small, pa.Table):
        return small.to_pandas()
    if isinstance(small, pd.DataFrame):
        return small
    raise TypeError(type(small))


class _BroadcastJoiner:
    """Actor-pool stage: resolves the broadcast ref ONCE per actor in
    __init__ (not per batch), then does a columnar hash lookup per
    batch.

    Hot path (single key, unique on the small side — the dimension-
    lookup case): zero-copy Arrow ``pc.index_in`` + ``take``; the big
    side's batch is never converted to pandas. Multi-key or
    duplicate-key small sides fall back to a pandas merge."""

    def __init__(self, small_ref, on, how, suffix):
        import pyarrow.compute as pc

        small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.small = _small_to_pandas(small)
        self.on = on
        self.how = how
        self.suffix = suffix
        self._arrow_path = False
        if isinstance(on, str) and how in ("left", "inner"):
            small_t = pa.Table.from_pandas(self.small,
                                           preserve_index=False).replace_schema_metadata(None)
            keys = small_t.column(on).combine_chunks()
            if len(pc.unique(keys)) == len(keys):
                self._arrow_path = True
                self._keys = keys
                self._payload = [
                    (f.name, small_t.column(f.name).combine_chunks())
                    for f in small_t.schema if f.name != on]

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if not self._arrow_path:
            df = t.to_pandas()
            out = df.merge(self.small, on=self.on, how=self.how,
                           suffixes=("", self.suffix), sort=False)
            return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
        idx = pc.index_in(t.column(self.on),
                          value_set=self._keys)
        if self.how == "inner":
            keep = pc.is_valid(idx)
            t = t.filter(keep)
            idx = idx.filter(keep) if isinstance(idx, pa.ChunkedArray) \
                else pc.filter(idx, keep)
        existing = set(t.column_names)
        for name, col in self._payload:
            out_name = name if name not in existing \
                else name + self.suffix
            t = t.append_column(out_name, col.take(idx))
        return t


def broadcast_join(ds, small, on, how: str = "left", suffix: str = "_r",
                   concurrency: int | None = None):
    """Broadcast hash join: ship the small side to the object store once
    (``ray.put``), every joiner actor reads it once. Left row order is
    preserved within each batch."""
    from bento_ray.util import default_concurrency

    if concurrency is None:
        concurrency = default_concurrency()
    ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(ref, on, how, suffix),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class _VersionedJoiner:
    """Last-write-wins stream-table join: for each fact row pick the
    newest dimension version with version_ts ≤ fact_ts (merge_asof per
    key). Dimension (all versions) broadcast once per actor.

    The fact batch stays Arrow end-to-end: only the projected
    (key, fact_ts, row-pos) columns take the pandas merge_asof round
    trip; the matched dimension payload attaches by ``Table.take`` on
    the resolved version indices (nulls where no version qualifies)."""

    def __init__(self, dim_ref, on, fact_ts, version_ts):
        dim = ray.get(dim_ref) if isinstance(dim_ref, ray.ObjectRef) else dim_ref
        dim = _small_to_pandas(dim).sort_values(version_ts, kind="stable") \
            .reset_index(drop=True)
        self.on = on
        self.fact_ts = fact_ts
        self.version_ts = version_ts
        # asof works on this 3-column frame; payload (everything but the
        # by-key, version_ts included) is a ONE-TIME Arrow conversion
        self._asof = dim[[on, version_ts]].copy()
        self._asof["__dimpos"] = np.arange(len(dim), dtype=np.int64)
        self._payload = pa.Table.from_pandas(
            dim.drop(columns=[on]), preserve_index=False) \
            .replace_schema_metadata(None)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        left = pd.DataFrame({
            self.on: t.column(self.on).to_pandas(),
            self.fact_ts: t.column(self.fact_ts).to_pandas(),
        })
        left["__pos"] = np.arange(n, dtype=np.int64)
        left = left.sort_values(self.fact_ts, kind="stable")
        out = pd.merge_asof(
            left, self._asof,
            left_on=self.fact_ts, right_on=self.version_ts,
            by=self.on, direction="backward", suffixes=("", "__v"),
        )
        out = out.sort_values("__pos", kind="stable")
        pos = out["__dimpos"].to_numpy()
        miss = pd.isna(pos)
        idx = pa.array(np.where(miss, 0, pos).astype(np.int64),
                       pa.int64(), mask=np.asarray(miss))
        existing = set(t.column_names)
        for name in self._payload.column_names:
            out_name = name if name not in existing else name + "_dim"
            t = t.append_column(out_name,
                                self._payload.column(name).take(idx))
        return t


def broadcast_join_versioned(ds, dim_versions, on: str, fact_ts: str,
                             version_ts: str, concurrency: int | None = None):
    from bento_ray.util import default_concurrency

    if concurrency is None:
        concurrency = default_concurrency()
    ref = ray.put(dim_versions)
    return ds.map_batches(
        _VersionedJoiner,
        fn_constructor_args=(ref, on, fact_ts, version_ts),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def shuffle_join(left, right, on: str, how: str = "inner",
                 num_buckets: int = 32, suffix: str = "_r",
                 force_fallback: bool = False):
    """Large-large equi-join.

    Preferred path: ``Dataset.join`` (hash-partitioned shuffle join,
    available in recent Ray releases). Portable fallback: a fully
    DISTRIBUTED co-bucketed hash join — both sides are projected onto
    ONE combined schema (the other side's columns null) with a side
    tag, unioned, and grouped by ``hash(key) % B``; each bucket merges
    its two sides in a single vectorized pandas merge. No driver
    materialization, no per-bucket ``ray.put``; the only data movement
    is the one groupby shuffle. Skewed keys: raise ``num_buckets`` or
    salt the hot key upstream (util.salted_partition) and re-merge
    after."""
    # normalize the join-type vocabulary: Ray's Dataset.join wants
    # left_outer/right_outer/full_outer, pandas wants left/right/outer
    _RAY_HOW = {"left": "left_outer", "right": "right_outer",
                "outer": "full_outer", "full": "full_outer"}
    _PD_HOW = {"left_outer": "left", "right_outer": "right",
               "full_outer": "outer", "full": "outer"}
    if hasattr(left, "join") and not force_fallback:
        # Dataset.join spawns one hash-shuffle aggregator actor per
        # partition; oversubscribing them (partitions ≈ CPUs) thrashes
        # the worker pool. Cap partitions at ~CPU/4 — measured 4.6s vs
        # 107s on a 32-CPU node for a 60k×15k join.
        from bento_ray.util import cluster_cpus

        parts = max(2, min(num_buckets, cluster_cpus() // 4))
        try:
            return left.join(right, join_type=_RAY_HOW.get(how, how),
                             on=(on,), num_partitions=parts,
                             right_suffix=suffix)
        except (TypeError, ValueError):
            pass  # older signature / join-type — explicit path below
    how = _PD_HOW.get(how, how)

    from bento_ray.util import stable_hash

    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = [f.name for f in lschema]
    rcols = [(f.name if f.name == on or f.name not in lcols
              else f.name + suffix) for f in rschema]
    combined = pa.schema(
        [lschema.field(i) for i in range(len(lschema))] +
        [pa.field(rcols[i], rschema.field(i).type)
         for i in range(len(rschema)) if rcols[i] != on] +
        [pa.field("__bucket", pa.int64()), pa.field("__side", pa.int8())])

    def _project(side: int, rename: dict):
        def _f(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = []
            for f in combined:
                if f.name == "__bucket":
                    b = (stable_hash(t.column(on))
                         % np.uint64(num_buckets)).astype(np.int64)
                    cols.append(pa.array(b, pa.int64()))
                elif f.name == "__side":
                    cols.append(pa.array(np.full(n, side, np.int8())))
                else:
                    src = rename.get(f.name, f.name)
                    if src in t.column_names:
                        cols.append(t.column(src).cast(f.type))
                    else:
                        cols.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(cols, schema=combined)
        return _f

    r_rename = {rcols[i]: rschema.field(i).name
                for i in range(len(rschema))}
    lt = left.map_batches(_project(0, {}), batch_format="pyarrow")
    rt = right.map_batches(
        _project(1, r_rename), batch_format="pyarrow")
    both = lt.union(rt)

    right_payload = [c for c in rcols if c != on]
    left_only = [c for c in lcols if c != on]

    _ARROW_HOW = {"inner": "inner", "left": "left outer",
                  "right": "right outer", "outer": "full outer"}

    def _merge_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # split sides while still Arrow and join with Arrow's C++ hash
        # join — no pandas round-trip (which would materialize object
        # columns and degrade cross-side-null ints to float64)
        side = g.column("__side")
        lg = g.filter(pc.equal(side, 0)).select(
            [on, *left_only]).combine_chunks()
        rg = g.filter(pc.equal(side, 1)).select(
            [on, *right_payload]).combine_chunks()
        out = lg.join(rg, keys=on, join_type=_ARROW_HOW[how],
                      coalesce_keys=True)
        # column order parity with the old pandas merge output
        return out.select([on, *left_only, *right_payload])

    return both.groupby("__bucket").map_groups(
        _merge_bucket, batch_format="pyarrow")


def _rank_in_sorted(rk: np.ndarray, rt: np.ndarray,
                    qk: np.ndarray, qt: np.ndarray,
                    side: str) -> np.ndarray:
    """Rank of each query pair (qk, qt) within the (key, ts)-sorted
    right arrays (rk, rt): the number of right rows lexicographically
    below the query (side='left': strictly below; side='right': below
    or equal). ONE lexsort over the concatenated arrays — no
    key*ts-range composite integer (which overflows int64 once a
    partition holds >~30k keys spanning years), no per-key loop."""
    nr, nq = len(rk), len(qk)
    # side='left' counts strictly-below rows: the query must sort
    # BEFORE equal right rows (flag 0 vs right flag 1); side='right'
    # counts below-or-equal: query sorts AFTER equals.
    if side == "right":
        isq = np.concatenate([np.zeros(nr, np.int8),
                              np.ones(nq, np.int8)])
    else:
        isq = np.concatenate([np.ones(nr, np.int8),
                              np.zeros(nq, np.int8)])
    order = np.lexsort((isq,
                        np.concatenate([rt, qt]),
                        np.concatenate([rk, qk])))
    inv = np.empty(nr + nq, np.int64)
    inv[order] = np.arange(nr + nq)
    pos = inv[nr:]                       # merged position of each query
    # rights before a query = merged position − queries before it
    is_query_sorted = np.zeros(nr + nq, np.int8)
    is_query_sorted[inv[nr:]] = 1
    queries_before = np.cumsum(is_query_sorted)[pos] - 1
    return pos - queries_before


def interval_join(left, right, *, key_col: str,
                  left_ts: str, right_ts: str,
                  left_id_col: str, right_id_col: str,
                  left_out: str = "left_id",
                  right_out: str = "right_id",
                  lower_us: int, upper_us: int,
                  num_parts: int | None = None):
    """Stream-stream interval join (Flink's interval join; the
    reference reaches the same shape with a cache-enrichment loop —
    `/root/reference/internal/impl/pure/processor_cache.go` — here a
    first-class distributed operator): emit one row per pair with
    equal keys and ``right.ts − left.ts ∈ [lower_us, upper_us]``,
    columns (key, left_out, right_out, lag_us) — the *_col params name
    the input id columns, the *_out params the emitted columns.

    Distributed shape: both sides project to (key, ts, id) plus a
    side tag, union, ONE hash exchange on key, then P vectorized
    partition scans. Per partition both sides are lexsorted by
    (key, ts); every left row's right-range is found with two
    merge-rank passes (`_rank_in_sorted`) and pairs expand via
    repeat + cumulative offsets — zero per-row Python, zero per-key
    loops. Memory per partition is its share of both inputs plus the
    emitted pairs; a hot key costs only its own pair count (salt
    upstream via util.salted_partition if one key dominates)."""
    if lower_us > upper_us:
        raise ValueError("lower_us must be <= upper_us")
    from bento_ray.util import cluster_cpus, stable_hash

    P = num_parts or max(4, cluster_cpus())

    def _project(ts_col: str, id_col: str, side: int):
        def _f(t: pa.Table) -> pa.Table:
            h = (stable_hash(t.column(key_col))
                 % np.uint64(P)).astype(np.int64)
            return pa.table({
                "k": t.column(key_col).cast(pa.int64()),
                "t": t.column(ts_col).cast(pa.int64()),
                "i": t.column(id_col).cast(pa.int64()),
                "side": pa.array(np.full(len(t), side, np.int8)),
                "part": pa.array(h),
            })
        return _f

    both = (left.map_batches(_project(left_ts, left_id_col, 0),
                             batch_format="pyarrow")
            .union(right.map_batches(_project(right_ts, right_id_col, 1),
                                     batch_format="pyarrow")))

    out_key = key_col
    lo_us, hi_us = int(lower_us), int(upper_us)

    def _scan(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table({
            out_key: pa.array([], pa.int64()),
            left_out: pa.array([], pa.int64()),
            right_out: pa.array([], pa.int64()),
            "lag_us": pa.array([], pa.int64()),
        })
        side = g.column("side")
        lg = g.filter(pc.equal(side, 0))
        rg = g.filter(pc.equal(side, 1))
        if len(lg) == 0 or len(rg) == 0:
            return empty
        lk = lg.column("k").to_numpy()
        lt = lg.column("t").to_numpy()
        li = lg.column("i").to_numpy()
        rk = rg.column("k").to_numpy()
        rt = rg.column("t").to_numpy()
        ri = rg.column("i").to_numpy()
        r_order = np.lexsort((rt, rk))
        rk, rt, ri = rk[r_order], rt[r_order], ri[r_order]
        lo = _rank_in_sorted(rk, rt, lk, lt + lo_us, "left")
        hi = _rank_in_sorted(rk, rt, lk, lt + hi_us, "right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        lrep = np.repeat(np.arange(len(lk)), counts)
        starts = np.cumsum(counts) - counts
        rpos = np.repeat(lo, counts) + (
            np.arange(total) - np.repeat(starts, counts))
        return pa.table({
            out_key: pa.array(lk[lrep], pa.int64()),
            left_out: pa.array(li[lrep], pa.int64()),
            right_out: pa.array(ri[rpos], pa.int64()),
            "lag_us": pa.array(rt[rpos] - lt[lrep], pa.int64()),
        })

    return both.groupby("part").map_groups(
        lambda t: _scan(t), batch_format="pyarrow")


def asof_join(left, right, *, key_col: str,
              left_ts: str, right_ts: str,
              left_id_col: str, right_id_col: str,
              left_out: str = "left_id", right_out: str = "right_id",
              num_parts: int | None = None):
    """Distributed LARGE-LARGE as-of join (the shuffle counterpart of
    broadcast_join_versioned, for dimension sides too big to ship):
    for every left row, the LATEST right row of the same key with
    ``right.ts ≤ left.ts`` (ties on ts resolve to the largest right
    id — a deterministic total order). Emits
    (key, left_out, right_out, right_ts_us, lag_us); left rows with
    no qualifying right are emitted with nulls (left join).

    Shape: identical to interval_join — project both sides to
    (key, ts, id), ONE hash exchange on key, per-partition merge-rank:
    ``_rank_in_sorted(side='right')`` gives each left row the count of
    rights at-or-below its (key, ts); index−1 is the as-of match. No
    composite-key overflow, no per-key loop."""
    from bento_ray.util import cluster_cpus, stable_hash

    P = num_parts or max(4, cluster_cpus())

    def _project(ts_col: str, id_col: str, side: int):
        def _f(t: pa.Table) -> pa.Table:
            h = (stable_hash(t.column(key_col))
                 % np.uint64(P)).astype(np.int64)
            return pa.table({
                "k": t.column(key_col).cast(pa.int64()),
                "t": t.column(ts_col).cast(pa.int64()),
                "i": t.column(id_col).cast(pa.int64()),
                "side": pa.array(np.full(len(t), side, np.int8)),
                "part": pa.array(h),
            })
        return _f

    both = (left.map_batches(_project(left_ts, left_id_col, 0),
                             batch_format="pyarrow")
            .union(right.map_batches(_project(right_ts, right_id_col, 1),
                                     batch_format="pyarrow")))

    def _scan(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g.column("side")
        lg = g.filter(pc.equal(side, 0))
        rg = g.filter(pc.equal(side, 1))
        nl = len(lg)
        if nl == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                left_out: pa.array([], pa.int64()),
                right_out: pa.array([], pa.int64()),
                "right_ts_us": pa.array([], pa.int64()),
                "lag_us": pa.array([], pa.int64()),
            })
        lk = lg.column("k").to_numpy()
        lt = lg.column("t").to_numpy()
        li = lg.column("i").to_numpy()
        if len(rg) == 0:
            null = pa.nulls(nl, pa.int64())
            return pa.table({
                key_col: pa.array(lk, pa.int64()),
                left_out: pa.array(li, pa.int64()),
                right_out: null, "right_ts_us": null, "lag_us": null,
            })
        rk = rg.column("k").to_numpy()
        rt = rg.column("t").to_numpy()
        ri = rg.column("i").to_numpy()
        # sort rights by (key, ts, id): at equal ts the LAST row (the
        # largest id) is the rank−1 match — the documented tie rule
        r_order = np.lexsort((ri, rt, rk))
        rk, rt, ri = rk[r_order], rt[r_order], ri[r_order]
        pos = _rank_in_sorted(rk, rt, lk, lt, "right") - 1
        safe = np.maximum(pos, 0)
        valid = (pos >= 0) & (rk[safe] == lk)
        mask = ~valid
        rid = pa.array(np.where(valid, ri[safe], 0), pa.int64(),
                       mask=mask)
        rts = pa.array(np.where(valid, rt[safe], 0), pa.int64(),
                       mask=mask)
        lag = pa.array(np.where(valid, lt - rt[safe], 0), pa.int64(),
                       mask=mask)
        return pa.table({
            key_col: pa.array(lk, pa.int64()),
            left_out: pa.array(li, pa.int64()),
            right_out: rid, "right_ts_us": rts, "lag_us": lag,
        })

    return both.groupby("part").map_groups(
        lambda t: _scan(t), batch_format="pyarrow")
