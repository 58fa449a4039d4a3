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
import pyarrow.compute as pc

__all__ = ["kll_quantiles", "KllSketch",
           "mg_top_terms", "MisraGries",
           "hll_distinct", "HyperLogLog"]

_EMPTY = np.empty(0, np.float64)


def _arr(a) -> pa.Array:
    """Normalize Array/ChunkedArray to a single contiguous Array."""
    if isinstance(a, pa.ChunkedArray):
        if a.num_chunks == 0:
            return pa.array([], a.type)
        return a.chunk(0) if a.num_chunks == 1 \
            else pa.concat_arrays(a.chunks)
    return a


def _coin(level: int, size: int) -> int:
    """Deterministic compaction offset in {0, 1} from a splitmix64
    finalizer of (level, size) — unbiased across levels/sizes, no RNG
    state to ship."""
    # Python ints with an explicit 2^64 mask: the wraparound is
    # intentional, and numpy uint64 scalar multiplies emit
    # RuntimeWarning on overflow (keeps the suite -W error clean)
    m = (1 << 64) - 1
    z = (level * 0x9E3779B97F4A7C15 + size * 0xBF58476D1CE4E5B9) & m
    z = ((z ^ (z >> 30)) * 0x94D049BB133111EB) & m
    z = z ^ (z >> 31)
    return z & 1


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


class MisraGries:
    """Mergeable heavy-hitters summary (Misra-Gries 1982; the merge
    rule of Agarwal et al., *Mergeable Summaries*, PODS'12): at most
    ``m`` (term, count) entries. Merging sums counts term-wise, then
    subtracts the (m+1)-th largest count from every entry and drops
    the non-positive ones — counts become LOWER bounds with total
    undercount ≤ n/(m+1) over the whole stream. With ``m ≥
    distinct(terms)`` the subtraction never fires and counts stay
    EXACT — the driver-oracle gate. Entries live as one Arrow string
    array + a numpy count vector; merge and compaction are single
    hash-aggregate / partition passes, no per-term Python."""

    def __init__(self, m: int):
        self.m = int(m)
        self.terms = pa.array([], pa.string())
        self.counts = np.empty(0, np.int64)

    def add_counts(self, terms: pa.Array, counts: np.ndarray):
        self.terms = pa.concat_arrays([_arr(self.terms), _arr(terms)])
        self.counts = np.concatenate([self.counts,
                                      np.asarray(counts, np.int64)])
        self._dedup()
        self._compact()
        return self

    def merge(self, other: "MisraGries"):
        return self.add_counts(other.terms, other.counts)

    def _dedup(self):
        t = pa.table({"t": self.terms,
                      "c": pa.array(self.counts, pa.int64())})
        agg = t.group_by("t").aggregate([("c", "sum")])
        self.terms = _arr(agg.column("t"))
        self.counts = agg.column("c_sum").to_numpy(
            zero_copy_only=False).astype(np.int64)

    def _compact(self):
        if len(self.counts) > self.m:
            thr = np.partition(self.counts,
                               len(self.counts) - self.m - 1)[
                                   len(self.counts) - self.m - 1]
            keep = self.counts > thr
            self.terms = _arr(self.terms).filter(pa.array(keep))
            self.counts = self.counts[keep] - thr

    def top_k(self, k: int) -> pa.Table:
        """(term, cnt) of the k largest counts — count desc, term asc."""
        t = pa.table({"word": self.terms,
                      "cnt": pa.array(self.counts, pa.int64())})
        idx = pc.sort_indices(
            t, sort_keys=[("cnt", "descending"), ("word", "ascending")])
        return t.take(idx[:k])

    def to_table(self) -> pa.Table:
        return pa.table({"word": self.terms,
                         "cnt": pa.array(self.counts, pa.int64())})

    @classmethod
    def from_table(cls, t: pa.Table, m: int) -> "MisraGries":
        s = cls(m)
        return s.add_counts(t.column("word"),
                            t.column("cnt").to_numpy(
                                zero_copy_only=False).astype(np.int64))


def mg_top_terms(ds, k: int = 20, capacity: int = 4096,
                 col: str = "text", merge_partitions: int = 8):
    """Heavy-hitter terms via the Misra-Gries summary: every block
    collapses to ≤ ``capacity`` (term, cnt) entries (one Arrow
    hash-aggregate, then MG compaction), a bounded repartition merges
    block summaries, the driver merges the last ``merge_partitions``
    and reports top-``k``. Unlike textops.top_terms (whose shuffle is
    vocabulary-sized), the wire volume here is ``capacity``-bounded —
    the 100 TB shape when the vocabulary itself outgrows a worker.
    Counts are exact iff ``capacity ≥ distinct(terms)`` (the oracle
    gate), else lower bounds with undercount ≤ n/(capacity+1)."""
    import ray.data as rd

    from bento_ray.textops.terms import _split_words

    def _partial(t: pa.Table) -> pa.Table:
        flat, _ = _split_words(t.column(col))
        small = pa.table({"word": flat})
        agg = small.group_by("word").aggregate([("word", "count")])
        return MisraGries(capacity).add_counts(
            agg.column("word"),
            agg.column("word_count").to_numpy(
                zero_copy_only=False).astype(np.int64)).to_table()

    def _merge(t: pa.Table) -> pa.Table:
        return MisraGries.from_table(t, capacity).to_table()

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    merged = parts.repartition(merge_partitions).map_batches(
        _merge, batch_format="pyarrow", batch_size=None)
    final = MisraGries(capacity)
    for b in merged.iter_batches(batch_format="pyarrow"):
        final.merge(MisraGries.from_table(b, capacity))
    return rd.from_arrow(final.top_k(k))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bit_length_u32(x: np.ndarray) -> np.ndarray:
    """floor(log2(x)) + 1 for x > 0, exactly: float64 represents every
    uint32 exactly and frexp's exponent is floor(log2)+1."""
    return np.frexp(x.astype(np.float64))[1].astype(np.int64)


class HyperLogLog:
    """HyperLogLog distinct counter (Flajolet, Fusy, Gandouet &
    Meunier 2007) over 64-bit hashes, with an EXACT sparse mode: below
    ``sparse_limit`` distinct hashes the summary is the sorted unique
    hash set itself (exact count — the driver-oracle gate); past it,
    2^p max-of-rho registers with the standard bias-corrected
    harmonic-mean estimator and the small-range linear-counting
    correction (a 64-bit hash space needs no large-range correction).
    Relative error in dense mode ≈ 1.04/√(2^p)."""

    def __init__(self, p: int = 14, sparse_limit: int = 4096):
        self.p = int(p)
        self.m = 1 << self.p
        self.sparse_limit = int(sparse_limit)
        self.sparse: np.ndarray | None = np.empty(0, np.uint64)
        self.regs: np.ndarray | None = None

    def update_ints(self, vals: np.ndarray):
        return self.update_hashes(_splitmix64(
            np.asarray(vals).astype(np.uint64)))

    def update_hashes(self, h: np.ndarray):
        if self.sparse is not None:
            self.sparse = np.unique(np.concatenate([self.sparse, h]))
            if len(self.sparse) > self.sparse_limit:
                self._densify()
        else:
            self._update_regs(h)
        return self

    def _densify(self):
        h, self.sparse = self.sparse, None
        self.regs = np.zeros(self.m, np.int8)
        self._update_regs(h)

    def _update_regs(self, h: np.ndarray):
        if not len(h):
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p)           # remaining bits, top-aligned
        hi = (w >> np.uint64(32)).astype(np.uint32)
        lo = (w & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        clz = np.where(
            hi > 0, 32 - _bit_length_u32(np.maximum(hi, 1)),
            np.where(lo > 0, 64 - _bit_length_u32(np.maximum(lo, 1)),
                     64))
        rho = np.where(w == 0, 64 - self.p + 1, clz + 1).astype(np.int8)
        np.maximum.at(self.regs, idx, rho)

    def merge(self, other: "HyperLogLog"):
        if self.sparse is not None and other.sparse is not None:
            return self.update_hashes(other.sparse)
        if self.sparse is not None:
            self._densify()
        if other.sparse is not None:
            self._update_regs(other.sparse)
        else:
            np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        if self.sparse is not None:
            return float(len(self.sparse))
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / np.sum(
            np.exp2(-self.regs.astype(np.float64)))
        v = int(np.count_nonzero(self.regs == 0))
        if e <= 2.5 * m and v > 0:
            e = m * np.log(m / v)
        return float(e)

    # rows: sparse → (idx=-1, val=hash-as-int64); dense → (idx, rho)
    def to_table(self) -> pa.Table:
        if self.sparse is not None:
            return pa.table({
                "idx": pa.array(np.full(len(self.sparse), -1, np.int64)),
                "val": pa.array(self.sparse.view(np.int64)),
            })
        nz = np.flatnonzero(self.regs)
        return pa.table({
            "idx": pa.array(nz.astype(np.int64)),
            "val": pa.array(self.regs[nz].astype(np.int64)),
        })

    @classmethod
    def from_table(cls, t: pa.Table, p: int,
                   sparse_limit: int) -> "HyperLogLog":
        s = cls(p, sparse_limit)
        idx = t.column("idx").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        val = t.column("val").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sp = idx == -1
        if sp.any():
            s.update_hashes(val[sp].view(np.uint64))
        if (~sp).any():
            if s.sparse is not None:
                s._densify()
            np.maximum.at(s.regs, idx[~sp], val[~sp].astype(np.int8))
        return s


def hll_distinct(ds, col: str, p: int = 14, sparse_limit: int = 4096,
                 merge_partitions: int = 8):
    """Distinct count of an integer column via HyperLogLog: block
    partials → bounded repartition merge → driver estimate. Wire
    volume is ≤ 2^p register rows (or the sparse set) per block —
    never the values. Exact while every summary stays sparse
    (``sparse_limit ≥ distinct`` — the oracle gate); dense-mode error
    ≈ 1.04/√(2^p) is pinned in tests. Returns a one-row Dataset
    (n_distinct)."""
    import ray.data as rd

    def _partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_numpy(zero_copy_only=False)
        return HyperLogLog(p, sparse_limit).update_ints(vals).to_table()

    def _merge(t: pa.Table) -> pa.Table:
        return HyperLogLog.from_table(t, p, sparse_limit).to_table()

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    merged = parts.repartition(merge_partitions).map_batches(
        _merge, batch_format="pyarrow", batch_size=None)
    final = HyperLogLog(p, sparse_limit)
    for b in merged.iter_batches(batch_format="pyarrow"):
        final.merge(HyperLogLog.from_table(b, p, sparse_limit))
    return rd.from_arrow(pa.table({
        "n_distinct": pa.array([int(round(final.estimate()))],
                               pa.int64())}))


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
