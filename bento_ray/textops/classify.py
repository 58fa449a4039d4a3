"""Distributed text classification primitives.

``logreg_fit_hashed`` trains a logistic-regression classifier over
hashed bag-of-words features with FULL-BATCH gradient descent — the
fastText-style quality/spam classifier of web-corpus pipelines,
expressed in the engine's combiner idiom:

- each iteration broadcasts the weight vector (n_buckets int64 nanos —
  KBs) via ``ray.put``;
- every batch computes its docs' activations and emits ONE bounded
  partial: the per-bucket gradient sum (≤ n_buckets rows/block);
- one grouped sum + a driver-side weight update (B-row) per iteration.
  The corpus never moves; per-iteration exchange is buckets × blocks.

Cross-engine determinism discipline (the unigram-LM trick, applied to
training): weights live on an INTEGER nano grid (int64, w = wn/1e9),
feature values are raw integer counts, so the dot product is an exact
int64 sum; the only float steps are the sigmoid and one division, and
the per-doc residual is re-quantized to integer nanos BEFORE the
gradient sum — making whole training runs bit-identical between this
engine and the unrolled-SQL oracle, regardless of summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Sum

__all__ = ["logreg_fit_hashed", "logreg_score_hashed"]

_NANO = 1e9
_BIAS = 0  # bucket 0 is the bias; word buckets occupy 1..n_buckets


def _doc_features(t: pa.Table, col: str, n_buckets: int):
    """Sparse hashed features per doc: (doc row, bucket, count) with
    bucket 0 the bias (count 1 per doc) and words at
    1 + (fnv61(word) % n_buckets). Vectorized via word_hashes +
    bincount over a combined (doc, bucket) key."""
    from bento_ray.textops.quality import word_hashes
    from bento_ray.textops.terms import _split_words

    flat, lens = _split_words(t.column(col))
    ndocs = len(lens)
    doc_of = np.repeat(np.arange(ndocs), lens)
    wb = (word_hashes(flat) % np.uint64(n_buckets)).astype(np.int64) + 1
    key = doc_of * (n_buckets + 1) + wb
    cnt = np.bincount(key, minlength=ndocs * (n_buckets + 1)) \
        .reshape(ndocs, n_buckets + 1)
    cnt[:, _BIAS] = 1
    return cnt  # dense (ndocs, n_buckets+1) int — buckets are small


def _activations(cnt: np.ndarray, wn: np.ndarray) -> np.ndarray:
    dot = cnt @ wn  # exact int64 while |dot| < 2^63
    return 1.0 / (1.0 + np.exp(-(dot / _NANO)))


def _binarize(cnt: np.ndarray) -> np.ndarray:
    b = (cnt > 0).astype(np.int64)
    b[:, _BIAS] = 1
    return b


def logreg_fit_hashed(ds, *, label_col: str, col: str = "text",
                      n_buckets: int = 64, iters: int = 2,
                      lr: float = 1.0, binary: bool = False) -> np.ndarray:
    """Train; returns the weight vector as int64 NANOS, length
    n_buckets+1 (index 0 = bias). Update rule per iteration:
    wn -= round(lr · Σ_docs round((σ(z)-y)·1e9) · x / N), every
    rounding half-away-from-zero (DuckDB ROUND convention).
    ``binary=True`` uses presence (0/1) features instead of counts —
    much better conditioned for full-batch GD on natural text (count
    features let common-word buckets dominate the gradient and the
    fixed step oscillates)."""
    from bento_ray.util import duckdb_round

    # pin the input in the object store: count() + every GD iteration
    # re-consumes the plan, and without this each pass re-executes the
    # whole upstream lineage (read + transforms) from scratch
    ds = ds.materialize()
    n_total = ds.count()
    wn = np.zeros(n_buckets + 1, np.int64)

    for _ in range(iters):
        w_ref = ray.put(wn)

        def _grad_partial(t: pa.Table) -> pa.Table:
            w = ray.get(w_ref)
            cnt = _doc_features(t, col, n_buckets)
            if binary:
                cnt = _binarize(cnt)
            y = t.column(label_col).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            sig = _activations(cnt, w)
            gq = duckdb_round((sig - y) * _NANO, 0).astype(np.int64)
            g = gq @ cnt  # (n_buckets+1,) exact int64
            return pa.table({
                "bucket": pa.array(np.arange(n_buckets + 1, dtype=np.int64)),
                "g": pa.array(g.astype(np.int64)),
            })

        agg = (ds.map_batches(_grad_partial, batch_format="pyarrow")
               .groupby("bucket").aggregate(Sum("g", alias_name="g"))
               .to_pandas().sort_values("bucket"))
        g = np.zeros(n_buckets + 1, np.int64)
        g[agg["bucket"].to_numpy()] = agg["g"].to_numpy()
        step = duckdb_round(lr * g / n_total, 0).astype(np.int64)
        wn = wn - step
    return wn


def logreg_score_hashed(ds, wn: np.ndarray, *, col: str = "text",
                        out_col: str = "score", digits: int = 6,
                        binary: bool = False):
    """Score docs under a trained nano-weight vector: one broadcast +
    one vectorized pass; appends σ(w·x) rounded to ``digits``.
    ``binary`` must match the training run's setting."""
    from bento_ray.util import duckdb_round

    n_buckets = len(wn) - 1
    w_ref = ray.put(np.asarray(wn, np.int64))

    def _f(t: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        cnt = _doc_features(t, col, n_buckets)
        if binary:
            cnt = _binarize(cnt)
        sig = duckdb_round(_activations(cnt, w), digits)
        return t.append_column(out_col, pa.array(sig, pa.float64()))

    return ds.map_batches(_f, batch_format="pyarrow")
