"""KLL-style mergeable quantile sketch (bento_ray/sketches.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bento_ray.sketches import KllSketch, kll_quantiles


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
