"""Mergeable summaries (bento_ray/sketches.py): KLL quantiles,
Misra-Gries heavy hitters, HyperLogLog distinct counts."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bento_ray.sketches import (HyperLogLog, KllSketch, MisraGries,
                                hll_distinct, kll_quantiles,
                                mg_top_terms)


def test_exact_when_k_exceeds_n():
    """k ≥ n ⇒ no compaction ⇒ exact order statistics under the
    ceil(q·n) rank rule, regardless of insertion split/order."""
    rng = np.random.RandomState(5)
    vals = rng.standard_normal(1000)
    s = KllSketch(k=2000)
    for chunk in np.array_split(vals, 7):
        s.update_many(chunk)
    assert s.n == 1000
    sv = np.sort(vals)
    for q in (0.01, 0.5, 0.9, 0.99, 1.0):
        want = sv[int(np.ceil(q * 1000)) - 1]
        assert s.quantiles([q])[0] == want


def test_merge_preserves_weight_and_bounds_error():
    """Merging block sketches preserves n exactly; at k=128 over 40k
    values the rank error of every estimated quantile stays well
    inside the coarse O(n·levels/k) envelope (checked at 4·n/k·levels
    to avoid flakiness — typical error is far smaller)."""
    rng = np.random.RandomState(11)
    vals = rng.lognormal(size=40_000)
    k = 128
    merged = KllSketch(k)
    for chunk in np.array_split(vals, 50):
        merged.merge(KllSketch(k).update_many(chunk))
    assert merged.n == 40_000
    sv = np.sort(vals)
    levels = sum(1 for v in merged.levels if len(v))
    budget = 4 * 40_000 / k * levels
    for q in (0.1, 0.5, 0.9, 0.99):
        est = merged.quantiles([q])[0]
        rank = np.searchsorted(sv, est, side="right")
        assert abs(rank - q * 40_000) <= budget, (q, rank, budget)


def test_arrow_roundtrip():
    s = KllSketch(16).update_many(np.arange(100, dtype=np.float64))
    t = s.to_table()
    r = KllSketch.from_table(t, 16)
    assert r.n == s.n
    assert r.quantiles([0.5]) == s.quantiles([0.5])


def test_empty_and_nan_inputs():
    s = KllSketch(8)
    s.update_many(np.array([np.nan, np.nan]))
    assert s.n == 0
    assert np.isnan(s.quantiles([0.5])[0])


def test_mg_exact_when_capacity_exceeds_distinct():
    words = ["a"] * 50 + ["b"] * 30 + ["c"] * 20 + ["d"] * 5
    s = MisraGries(10)
    for chunk in np.array_split(np.array(words, object), 4):
        vals, cnts = np.unique(chunk, return_counts=True)
        s.add_counts(pa.array(vals.tolist()), cnts)
    top = s.top_k(3).to_pydict()
    assert top["word"] == ["a", "b", "c"]
    assert top["cnt"] == [50, 30, 20]


def test_mg_lower_bounds_and_undercount_envelope():
    """Sketch-sized capacity: every surviving count is a lower bound
    with per-term undercount ≤ n/(m+1), and the true heavy hitter
    always survives (its true count exceeds the max possible
    subtraction)."""
    rng = np.random.RandomState(4)
    stream = np.concatenate([
        np.full(5000, 777),                       # heavy hitter
        rng.randint(0, 2000, 20_000)])            # long tail
    rng.shuffle(stream)
    m = 64
    s = MisraGries(m)
    for chunk in np.array_split(stream, 40):
        vals, cnts = np.unique(chunk, return_counts=True)
        s.add_counts(pa.array([str(v) for v in vals]), cnts)
    true = np.count_nonzero(stream == 777)
    got = dict(zip(*s.top_k(m).to_pydict().values()))
    n = len(stream)
    assert "777" in got
    assert got["777"] <= true
    assert true - got["777"] <= n / (m + 1)


def test_mg_merge_matches_single_pass():
    """Merging block summaries at exact capacity equals one-pass
    counting regardless of split."""
    words = [f"w{i % 17}" for i in range(300)]
    whole = MisraGries(50).add_counts(
        *(lambda v, c: (pa.array(v.tolist()), c))(
            *np.unique(np.array(words, object), return_counts=True)))
    merged = MisraGries(50)
    for chunk in np.array_split(np.array(words, object), 7):
        v, c = np.unique(chunk, return_counts=True)
        merged.merge(MisraGries(50).add_counts(pa.array(v.tolist()), c))
    assert whole.top_k(17).equals(merged.top_k(17))


def test_mg_top_terms_dataset_exact(ray_session):
    docs = [{"doc_id": i, "text": "alpha beta " + ("gamma " * (i % 3))}
            for i in range(50)]
    out = mg_top_terms(rd.from_items(docs), k=3,
                       capacity=1000).to_pandas()
    assert list(out["word"]) == ["alpha", "beta", "gamma"]
    assert list(out["cnt"])[:2] == [50, 50]


def test_hll_exact_sparse_gate():
    s = HyperLogLog(p=12, sparse_limit=10_000)
    s.update_ints(np.arange(5000))
    s.update_ints(np.arange(2500, 7500))          # overlap
    assert s.estimate() == 7500.0


def test_hll_dense_accuracy_and_merge():
    """Dense mode at p=14: estimate within 3% (theory ≈0.8%) of 200k
    true distinct, and merging 20 block sketches equals feeding one —
    register-max merge is exact."""
    rng = np.random.RandomState(8)
    vals = rng.randint(0, 10**12, 300_000)
    true = len(np.unique(vals))
    one = HyperLogLog(p=14, sparse_limit=1000).update_ints(vals)
    merged = HyperLogLog(p=14, sparse_limit=1000)
    for chunk in np.array_split(vals, 20):
        merged.merge(HyperLogLog(p=14, sparse_limit=1000)
                     .update_ints(chunk))
    assert merged.estimate() == one.estimate()
    assert abs(one.estimate() - true) / true < 0.03


def test_hll_arrow_roundtrip_sparse_and_dense():
    sp = HyperLogLog(p=10, sparse_limit=100).update_ints(np.arange(50))
    r = HyperLogLog.from_table(sp.to_table(), 10, 100)
    assert r.estimate() == 50.0
    dn = HyperLogLog(p=10, sparse_limit=100).update_ints(
        np.arange(10_000))
    r2 = HyperLogLog.from_table(dn.to_table(), 10, 100)
    assert r2.estimate() == dn.estimate()


def test_hll_distinct_dataset(ray_session):
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array(np.arange(4000) % 1234, pa.int64())}))
    out = hll_distinct(ds, "user_id", sparse_limit=10_000).to_pandas()
    assert list(out["n_distinct"]) == [1234]


def test_kll_quantiles_dataset_exact(ray_session):
    rng = np.random.RandomState(3)
    vals = rng.standard_normal(5000)
    ds = rd.from_arrow(pa.table({"value": pa.array(vals, pa.float64())}))
    out = kll_quantiles(ds, "value", qs=(0.5, 0.9), k=10_000) \
        .to_pandas().sort_values("q")
    sv = np.sort(vals)
    assert list(out["n"]) == [5000, 5000]
    assert out["value"].iloc[0] == sv[int(np.ceil(0.5 * 5000)) - 1]
    assert out["value"].iloc[1] == sv[int(np.ceil(0.9 * 5000)) - 1]


def test_kll_quantiles_dataset_approximate(ray_session):
    """Sketch-sized k over a Dataset: estimates land within ±2% rank
    of truth on 50k lognormal values (loose: the bound is ~levels/k
    in rank fraction, ≈ 0.5% here)."""
    rng = np.random.RandomState(9)
    vals = rng.lognormal(size=50_000)
    ds = rd.from_arrow(pa.table({"value": pa.array(vals, pa.float64())}))
    out = kll_quantiles(ds, "value", qs=(0.5, 0.99), k=400) \
        .to_pandas().sort_values("q")
    sv = np.sort(vals)
    for q, est in zip(out["q"], out["value"]):
        rank = np.searchsorted(sv, est, side="right") / 50_000
        assert abs(rank - q) <= 0.02, (q, rank)
