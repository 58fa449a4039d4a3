"""Similarity search over an embedding column (``list<float>``).

- ``cosine_topk``: brute-force cosine top-k — the query matrix is
  broadcast once (``ray.put``); every batch does one float64 matmul
  against it and emits only its local top-k per query, so the final
  combine sees ``num_batches × k`` candidate rows per query instead of
  the full score matrix. The combine is a tiny groupby.
- ``lsh_cosine_topk``: the scale path — random-hyperplane LSH buckets
  vectors; queries probe only their own bucket (plus optional
  multi-probe neighbors), trading recall for a bounded candidate set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from bento_ray.util import default_concurrency as _dc


def _conc(c):
    return c if c is not None else _dc()

import ray


def _stack(col) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _BruteScorer:
    def __init__(self, q_ref, k, id_col, vec_col):
        q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.qids = q["qids"]
        self.qm = _normalize(q["matrix"])  # (Q, D) — loaded once per actor
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        vm = _normalize(_stack(t.column(self.vec_col)))    # (N, D)
        ids = np.asarray(t.column(self.id_col).to_pylist(), np.int64)
        scores = self.qm @ vm.T                            # (Q, N)
        out_q, out_id, out_s = [], [], []
        k = min(self.k + 1, scores.shape[1])  # +1 to survive self-match removal
        for qi in range(scores.shape[0]):
            row = scores[qi]
            top = np.argpartition(-row, k - 1)[:k]
            out_q.extend([self.qids[qi]] * len(top))
            out_id.extend(ids[top].tolist())
            out_s.extend(row[top].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })


def cosine_topk(ds, query_matrix: np.ndarray, query_ids, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_self: bool = True, concurrency: int | None = None):
    """Brute-force cosine top-k. Returns (query_id, vec_id, rank, score)
    with rank 1..k per query, ties broken by vec_id ascending."""
    q_ref = ray.put({"qids": list(query_ids),
                     "matrix": np.asarray(query_matrix, np.float64)})
    cands = ds.map_batches(
        _BruteScorer, fn_constructor_args=(q_ref, k, id_col, vec_col),
        batch_format="pyarrow",
                          concurrency=_conc(concurrency))

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g["vec_id"] != g["query_id"]]
        g = g.sort_values(["score", "vec_id"], ascending=[False, True],
                          kind="stable").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["score"] = g["score"].round(6)
        return g[["query_id", "vec_id", "rank", "score"]]

    return cands.groupby("query_id").map_groups(_final, batch_format="pandas")


class _LshBucketer:
    """Random-hyperplane signatures over L tables: for table ``l`` the
    global bucket id is ``l * 2**R + sign-bits(P_l @ v)``. With L > 1
    each input row explodes into L rows (zero-copy ``Table.take`` on
    tiled indices for the payload columns) — the OR-construction that
    makes LSH recall usable; the shuffle then carries L copies of the
    vector table (documented trade, L is small)."""

    def __init__(self, planes_ref, vec_col):
        p = ray.get(planes_ref) if isinstance(planes_ref, ray.ObjectRef) else planes_ref
        self.planes = p  # (L, R, D)
        self.vec_col = vec_col

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        """(L, N) global bucket ids."""
        L, R, _ = self.planes.shape
        mn = _normalize(m)
        pows = 1 << np.arange(R)
        out = np.empty((L, m.shape[0]), np.int64)
        for l in range(L):
            bits = (self.planes[l] @ mn.T) > 0              # (R, N)
            out[l] = bits.T @ pows + (l << R)
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        b = self.bucket_of(_stack(t.column(self.vec_col)))  # (L, N)
        L, n = b.shape
        if L == 1:
            return t.append_column("lsh_bucket", pa.array(b[0], pa.int64()))
        idx = np.tile(np.arange(n, dtype=np.int64), L)
        return t.take(idx).append_column(
            "lsh_bucket", pa.array(b.reshape(-1), pa.int64()))


def _probe_buckets(proj_row: np.ndarray, num_probes: int) -> list[int]:
    """Multi-probe LSH (Lv et al., VLDB'07, simplified to single-bit
    flips): the home bucket, then buckets reached by flipping the sign
    bits whose projection magnitude is smallest — those are the
    hyperplanes the query sits closest to, so their far side is the
    likeliest home of missed neighbors."""
    bits = (proj_row > 0).astype(np.int64)
    home = int(bits @ (1 << np.arange(len(bits))))
    out = [home]
    for r in np.argsort(np.abs(proj_row))[:max(0, num_probes - 1)]:
        out.append(home ^ (1 << int(r)))
    return out


def lsh_cosine_topk(ds, query_matrix: np.ndarray, query_ids, k: int = 5,
                    num_planes: int = 6, seed: int = 42,
                    num_probes: int = 1, num_tables: int = 1,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    concurrency: int | None = None):
    """Approximate top-k: vectors hashed to 2**num_planes buckets per
    table by random hyperplanes (``num_tables`` independent tables —
    the OR-construction); each query probes its own bucket in every
    table plus ``num_probes - 1`` neighbor buckets per table
    (single-bit flips of the least-confident sign bits). One groupby
    shuffle over the (exploded) bucket ids does all the scanning;
    a second tiny groupby over ≤ tables × probes × k candidate rows
    per query picks the global top-k. Measured recall@10 vs the
    brute-force oracle is pinned in tests/test_textops.py."""
    rng = np.random.RandomState(seed)
    dim = np.asarray(query_matrix).shape[1]
    planes = rng.standard_normal((num_tables, num_planes, dim))
    planes_ref = ray.put(planes)

    bucketed = ds.map_batches(_LshBucketer, fn_constructor_args=(planes_ref, vec_col),
                              batch_format="pyarrow",
                          concurrency=_conc(concurrency))

    qm = _normalize(np.asarray(query_matrix, np.float64))
    by_bucket: dict[int, list[int]] = {}
    for l in range(num_tables):
        qproj = planes[l] @ qm.T                            # (R, Q)
        for qi in range(qm.shape[0]):
            for b in _probe_buckets(qproj[:, qi], num_probes):
                by_bucket.setdefault(int(b) + (l << num_planes),
                                     []).append(qi)
    qids = list(query_ids)

    def _per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["lsh_bucket"].iloc[0])
        qis = by_bucket.get(b, [])
        if not qis:
            # typed empty frame — an untyped one shows up as a
            # schema-less RefBundle and trips Ray's schema-change warning
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "vec_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        vm = _normalize(np.array(g[vec_col].tolist(), np.float64))
        ids = g[id_col].to_numpy()
        out = []
        for qi in qis:
            row = qm[qi] @ vm.T
            kk = min(k + 1, len(row))  # +1 survives self-match removal
            top = np.argpartition(-row, kk - 1)[:kk]
            for j in top:
                if ids[j] == qids[qi]:
                    continue
                out.append((qids[qi], int(ids[j]), float(row[j])))
        return pd.DataFrame(out, columns=["query_id", "vec_id", "score"])

    cands = bucketed.groupby("lsh_bucket").map_groups(_per_bucket,
                                                      batch_format="pandas")

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id") \
             .sort_values(["score", "vec_id"], ascending=[False, True],
                          kind="stable").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["score"] = g["score"].round(6)
        return g[["query_id", "vec_id", "rank", "score"]]

    return cands.groupby("query_id").map_groups(_final,
                                                batch_format="pandas")
