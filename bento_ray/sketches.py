"""Mergeable quantile sketch over continuous values (KLL-style).

The histogram combiner (textops.quality.length_quantiles) is the right
shape when the domain is small integers; for continuous / high-
cardinality columns the 100 TB primitive is a MERGEABLE SKETCH: every
block collapses to a bounded summary, summaries merge associatively,
and only sketches — never values — cross the wire.

This is the compactor scheme of Karnin, Lang & Liberty 2016
(arXiv:1603.05346), simplified: level ``i`` holds items of weight
``2**i`` in a buffer of capacity ``k``; an overfull level is sorted and
every other item (deterministic hash-derived offset; the odd leftover
stays put) is promoted to level ``i+1``. Compaction preserves total
weight exactly, so rank queries use the true ``n``. The fixed per-level
capacity keeps the summary at O(k·log(n/k)) values with rank error
O(n·log(n/k)/k) — looser than full KLL's varying capacities, and stated
as such; we trade the last log factor for a fully vectorized compactor.

Gate-exactness: with ``k ≥ n`` level 0 never overflows, the sketch IS
the stream, and quantiles are exact — the driver oracle checks the
whole distributed pipeline (block partials, level-wise merges, CDF
inversion) at such a ``k``; approximation error at small ``k`` is
pinned separately in pytest.

Rank rule (mirrored exactly in the SQL oracle, same as
length_quantiles): q-quantile = smallest value whose cumulative weight
≥ ceil(q·n).

Run-to-run determinism: exact mode (no compaction) is order-
independent. Compacting mode depends on Ray's block merge order like
any sampling-based sketch; error bounds, not bits, are the contract
there.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["kll_quantiles", "KllSketch"]

_EMPTY = np.empty(0, np.float64)


def _coin(level: int, size: int) -> int:
    """Deterministic compaction offset in {0, 1} from a splitmix64
    finalizer of (level, size) — unbiased across levels/sizes, no RNG
    state to ship."""
    z = (np.uint64(level) * np.uint64(0x9E3779B97F4A7C15)
         + np.uint64(size) * np.uint64(0xBF58476D1CE4E5B9))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return int(z & np.uint64(1))


class KllSketch:
    """Levels are numpy float64 arrays; ``levels[i]`` items carry
    weight ``2**i``."""

    def __init__(self, k: int):
        self.k = int(k)
        self.levels: list[np.ndarray] = [_EMPTY]

    def update_many(self, vals: np.ndarray) -> "KllSketch":
        vals = np.asarray(vals, np.float64)
        vals = vals[~np.isnan(vals)]
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compact()
        return self

    def merge(self, other: "KllSketch") -> "KllSketch":
        for i, v in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append(_EMPTY)
            self.levels[i] = np.concatenate([self.levels[i], v])
        self._compact()
        return self

    def _compact(self):
        i = 0
        while i < len(self.levels):
            v = self.levels[i]
            if len(v) > self.k:
                v = np.sort(v)
                m = (len(v) // 2) * 2
                off = _coin(i, len(v))
                if i + 1 >= len(self.levels):
                    self.levels.append(_EMPTY)
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], v[off:m:2]])
                self.levels[i] = v[m:]          # odd leftover stays
            i += 1

    @property
    def n(self) -> int:
        return int(sum(len(v) << i for i, v in enumerate(self.levels)))

    def quantiles(self, qs) -> list[float]:
        vals = np.concatenate(self.levels)
        wts = np.concatenate([np.full(len(v), 1 << i, np.int64)
                              for i, v in enumerate(self.levels)])
        order = np.argsort(vals, kind="stable")
        vals, cum = vals[order], np.cumsum(wts[order])
        n = int(cum[-1]) if len(cum) else 0
        out = []
        for q in qs:
            if n == 0:
                out.append(float("nan"))
                continue
            rank = int(np.ceil(q * n))
            out.append(float(vals[np.searchsorted(cum, max(rank, 1))]))
        return out

    # -- Arrow (level, vals) row serialization for the merge tree ----
    def to_table(self) -> pa.Table:
        lv = [i for i, v in enumerate(self.levels) if len(v)]
        return pa.table({
            "level": pa.array(lv, pa.int64()),
            "vals": pa.array([self.levels[i].tolist() for i in lv],
                             pa.list_(pa.float64())),
        })

    @classmethod
    def from_table(cls, t: pa.Table, k: int) -> "KllSketch":
        s = cls(k)
        levels = t.column("level").to_pylist()
        flat = t.column("vals").combine_chunks()
        for row, lvl in enumerate(levels):
            v = np.asarray(flat[row].values, np.float64) \
                if flat[row].values is not None else _EMPTY
            while lvl >= len(s.levels):
                s.levels.append(_EMPTY)
            s.levels[lvl] = np.concatenate([s.levels[lvl], v])
        s._compact()
        return s


def kll_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99), k: int = 200,
                  merge_partitions: int = 8):
    """Distributed quantiles of a continuous column via the mergeable
    sketch: map_batches collapses each block to one bounded sketch
    (rows of (level, vals)); one bounded repartition merges block
    sketches ``merge_partitions``-ways; the driver merges the last
    ``merge_partitions`` sketches and inverts the CDF. Nothing
    unbounded ever reaches a single worker or the driver — shuffle
    volume is sketches, not values.

    Returns a Dataset of (q, value, n) — with ``k ≥ n`` the values are
    exact order statistics (see module docstring)."""
    import ray.data as rd

    def _partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_numpy(zero_copy_only=False)
        return KllSketch(k).update_many(
            vals[~np.isnan(vals)]).to_table()

    def _merge(t: pa.Table) -> pa.Table:
        return KllSketch.from_table(t, k).to_table()

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    merged = parts.repartition(merge_partitions).map_batches(
        _merge, batch_format="pyarrow", batch_size=None)

    final = KllSketch(k)
    for b in merged.iter_batches(batch_format="pyarrow"):
        final.merge(KllSketch.from_table(b, k))
    vs = final.quantiles(qs)
    return rd.from_arrow(pa.table({
        "q": pa.array([float(q) for q in qs], pa.float64()),
        "value": pa.array(vs, pa.float64()),
        "n": pa.array([final.n] * len(vs), pa.int64()),
    }))
