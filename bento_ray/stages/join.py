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
    batch."""

    def __init__(self, small_ref, on, how, suffix):
        small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.small = _small_to_pandas(small)
        self.on = on
        self.how = how
        self.suffix = suffix

    def __call__(self, t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.merge(self.small, on=self.on, how=self.how,
                       suffixes=("", self.suffix), sort=False)
        return pa.Table.from_pandas(out, preserve_index=False)


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
    key). Dimension (all versions) broadcast once per actor."""

    def __init__(self, dim_ref, on, fact_ts, version_ts):
        dim = ray.get(dim_ref) if isinstance(dim_ref, ray.ObjectRef) else dim_ref
        dim = _small_to_pandas(dim).sort_values(version_ts, kind="stable")
        self.dim = dim
        self.on = on
        self.fact_ts = fact_ts
        self.version_ts = version_ts

    def __call__(self, t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["__pos"] = np.arange(len(df))
        left = df.sort_values(self.fact_ts, kind="stable")
        out = pd.merge_asof(
            left, self.dim,
            left_on=self.fact_ts, right_on=self.version_ts,
            by=self.on, direction="backward", suffixes=("", "_dim"),
        )
        out = out.sort_values("__pos", kind="stable").drop(columns=["__pos"])
        return pa.Table.from_pandas(out, preserve_index=False)


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
                 num_buckets: int = 32, suffix: str = "_r"):
    """Large-large equi-join.

    Preferred path: ``Dataset.join`` (hash-partitioned shuffle join,
    available in recent Ray releases). Portable fallback: explicit
    bucketed hash join — both sides gain ``__bucket = hash(key) % B``,
    the right side's buckets are broadcast via ``ray.put`` and matching
    buckets merged inside ``map_groups`` of the left (one shuffle of the
    left, broadcast of the right per bucket). Skewed keys: raise
    ``num_buckets`` or salt the hot key upstream
    (util.salted_partition) and re-merge after."""
    if hasattr(left, "join"):
        # Dataset.join spawns one hash-shuffle aggregator actor per
        # partition; oversubscribing them (partitions ≈ CPUs) thrashes
        # the worker pool. Cap partitions at ~CPU/4 — measured 4.6s vs
        # 107s on a 32-CPU node for a 60k×15k join.
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        parts = max(2, min(num_buckets, cpus // 4))
        try:
            return left.join(right, join_type=how, on=(on,),
                             num_partitions=parts, right_suffix=suffix)
        except TypeError:
            pass  # older signature — fall through to the explicit path

    from bento_ray.util import stable_hash

    def _bucketize(t: pa.Table) -> pa.Table:
        b = (stable_hash(t.column(on)) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    lb = left.map_batches(_bucketize, batch_format="pyarrow")
    rb = right.map_batches(_bucketize, batch_format="pyarrow")
    bucket_refs = {
        int(k): ray.put(v.drop(columns=["__bucket"]))
        for k, v in rb.to_pandas().groupby("__bucket")
    }

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__bucket"].iloc[0])
        ref = bucket_refs.get(b)
        g = g.drop(columns=["__bucket"])
        if ref is None:
            return g.head(0) if how == "inner" else g
        return g.merge(ray.get(ref), on=on, how=how, suffixes=("", suffix))

    return lb.groupby("__bucket").map_groups(_merge, batch_format="pandas")
