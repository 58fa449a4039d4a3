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
import pyarrow as pa

import ray

from bento_ray.util import duckdb_round
from bento_ray.util import resolve_concurrency as _conc


def _stack(col) -> np.ndarray:
    """(N, D) float64 matrix straight from the Arrow list-of-float
    values buffer (one astype copy, no per-row Python) — to_pylist on
    an embedding column materializes N×D Python floats per batch."""
    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # some versions stay chunked
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], arr.type)
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), np.float64)
    if pa.types.is_fixed_size_list(arr.type):
        if arr.null_count:
            # the values buffer is garbage under a null slot — a
            # silent read would feed NaN vectors into every cosine
            # score; fail the way the variable-length path does
            raise ValueError(
                f"embedding column has {arr.null_count} null row(s)")
        d = arr.type.list_size
        flat = arr.values.to_numpy(zero_copy_only=False)
        flat = flat[arr.offset * d:(arr.offset + n) * d]
        return flat.reshape(n, d).astype(np.float64)
    lens = arr.value_lengths().to_numpy(zero_copy_only=False)
    d = int(lens[0]) if n else 0
    if not np.all(lens == d):
        return np.array(arr.to_pylist(), dtype=np.float64)  # ragged/null
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, d).astype(np.float64)


def _ids_np(col) -> np.ndarray:
    a = col.to_numpy(zero_copy_only=False) if isinstance(col, pa.Array) \
        else col.to_numpy()
    return np.asarray(a, np.int64)


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
        if t.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        vm = _normalize(_stack(t.column(self.vec_col)))    # (N, D)
        ids = _ids_np(t.column(self.id_col))
        scores = self.qm @ vm.T                            # (Q, N)
        k = min(self.k + 1, scores.shape[1])  # +1 survives self-match removal
        top = np.argpartition(-scores, k - 1, axis=1)[:, :k]   # (Q, k)
        return pa.table({
            "query_id": pa.array(
                np.repeat(np.asarray(self.qids, np.int64), k)),
            "vec_id": pa.array(ids[top.reshape(-1)]),
            "score": pa.array(
                np.take_along_axis(scores, top, axis=1).reshape(-1)),
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

    return cands.groupby("query_id").map_groups(
        _topk_final(k, exclude_self=exclude_self), batch_format="pyarrow")


def _topk_final(k: int, exclude_self: bool = False, dedup: bool = False):
    """Arrow-native per-query top-k combine: score desc, vec_id asc,
    rank 1..k, score rounded to 6 after selection (same semantics as
    the old pandas sort_values/head/round chain, no pandas)."""
    def _final(g: pa.Table) -> pa.Table:
        q = _ids_np(g.column("query_id"))
        vid = _ids_np(g.column("vec_id"))
        s = g.column("score").to_numpy()
        if exclude_self:
            m = vid != q
            q, vid, s = q[m], vid[m], s[m]
        if dedup:
            # same (query, vec) candidate from several buckets/cells
            # carries an identical score — keep any one
            _, ix = np.unique(vid, return_index=True)
            q, vid, s = q[ix], vid[ix], s[ix]
        order = np.lexsort((vid, -s))[:k]
        return pa.table({
            "query_id": pa.array(q[order], pa.int64()),
            "vec_id": pa.array(vid[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "score": pa.array(duckdb_round(s[order], 6), pa.float64()),
        })
    return _final


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

    qids_np = np.asarray(qids, np.int64)

    def _per_bucket(g: pa.Table) -> pa.Table:
        qis = by_bucket.get(int(g.column("lsh_bucket")[0].as_py()), [])
        if not qis:
            # typed empty table — an untyped one shows up as a
            # schema-less RefBundle and trips Ray's schema-change warning
            return _empty_cands()
        vm = _normalize(_stack(g.column(vec_col)))
        ids = _ids_np(g.column(id_col))
        rows = qm[qis] @ vm.T                       # (|qis|, n)
        kk = min(k + 1, rows.shape[1])  # +1 survives self-match removal
        top = np.argpartition(-rows, kk - 1, axis=1)[:, :kk]
        qid = np.repeat(qids_np[qis], kk)
        vid = ids[top.reshape(-1)]
        sc = np.take_along_axis(rows, top, axis=1).reshape(-1)
        m = vid != qid
        return pa.table({"query_id": pa.array(qid[m]),
                         "vec_id": pa.array(vid[m]),
                         "score": pa.array(sc[m])})

    cands = bucketed.groupby("lsh_bucket").map_groups(_per_bucket,
                                                      batch_format="pyarrow")
    return cands.groupby("query_id").map_groups(
        _topk_final(k, dedup=True), batch_format="pyarrow")


def _empty_cands() -> pa.Table:
    return pa.table({"query_id": pa.array([], pa.int64()),
                     "vec_id": pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())})


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection (the dedup-family member
# over the embeddings table; the text-side families — exact, MinHash,
# SimHash, n-gram Jaccard — live in textops/dedup.py)
# ---------------------------------------------------------------------------


class _AllPairsNearDup:
    """Exact all-pairs cosine scorer. Each actor rebuilds the full
    (id, normalized-vector) reference matrix ONCE in ``__init__`` from
    the object-store block refs — the blocks never pass through the
    driver — then every batch runs chunked float64 matmuls against it.
    Every unordered pair is emitted exactly once globally: the batch
    row ``a`` reports neighbor ``b`` only when ``a < b`` (each pair has
    exactly one smaller-id member, which lives in exactly one batch)."""

    # reference columns per matmul — bounds the transient
    # (batch_rows × CHUNK) float64 score matrix to a few MB
    CHUNK = 8192

    def __init__(self, block_refs, threshold, id_col, vec_col):
        tables = [t for t in ray.get(list(block_refs)) if t.num_rows]
        if tables:
            self.ids = np.concatenate(
                [_ids_np(t.column(id_col)) for t in tables])
            self.mat = _normalize(np.concatenate(
                [_stack(t.column(vec_col)) for t in tables]))
        else:
            self.ids = np.empty(0, np.int64)
            self.mat = np.empty((0, 0), np.float64)
        self.threshold = float(threshold)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        bids = _ids_np(t.column(self.id_col))
        bm = _normalize(_stack(t.column(self.vec_col)))
        out_a, out_b = [], []
        for s in range(0, len(self.ids), self.CHUNK):
            rid = self.ids[s:s + self.CHUNK]
            sims = bm @ self.mat[s:s + self.CHUNK].T     # (n, chunk)
            mask = (sims >= self.threshold) & \
                (bids[:, None] < rid[None, :])
            ii, jj = np.nonzero(mask)
            if len(ii):
                out_a.append(bids[ii])
                out_b.append(rid[jj])
        A = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        B = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        order = np.lexsort((B, A))
        return pa.table({"id_a": pa.array(A[order], pa.int64()),
                         "id_b": pa.array(B[order], pa.int64())})


def cosine_near_dups(ds, threshold: float = 0.9,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     concurrency: int | None = None):
    """EXACT embedding-cosine near-duplicate pairs: all (a, b) with
    a < b and cosine(v_a, v_b) ≥ threshold.

    Shape: the input is materialized once into the object store; every
    scorer actor mounts the block refs as its reference matrix (no
    driver materialization — the driver only holds refs) and each batch
    is one chunked matmul, so compute is O(N²·D / cluster) with O(N·D)
    per-worker heap for the reference copy. That makes this the exact
    baseline for corpora whose embedding matrix fits a worker
    (~10⁸ rows × 64 dims × 8 B ≈ 51 GB is the practical ceiling);
    beyond that use :func:`cosine_near_dups_lsh`, which shuffles
    instead of broadcasting."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    return mat.map_batches(
        _AllPairsNearDup,
        fn_constructor_args=(refs, threshold, id_col, vec_col),
        batch_format="pyarrow", concurrency=_conc(concurrency))


def cosine_near_dups_lsh(ds, threshold: float = 0.9, num_planes: int = 8,
                         num_tables: int = 8, seed: int = 42,
                         dim: int | None = None,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         concurrency: int | None = None,
                         num_pair_parts: int | None = None):
    """Approximate embedding-cosine near-duplicate pairs — the scale
    path. Random-hyperplane LSH (the same ``_LshBucketer``
    OR-construction as :func:`lsh_cosine_topk`) buckets vectors into
    ``num_tables × 2**num_planes`` buckets; ONE groupby shuffle
    co-locates each bucket, a vectorized pairwise matmul inside the
    bucket emits candidate pairs verified EXACTLY against the
    threshold (precision 1.0 — only recall is approximate), and a
    second tiny groupby dedupes pairs that collide in several tables.

    Recall for genuinely-near duplicates is high because a hyperplane
    splits a pair at angle θ with probability θ/π: at cosine ≥ 0.9
    (θ ≤ 26°), P(same bucket per table) = (1 − θ/π)^planes ≈ 0.28 and
    8 tables give ≈ 0.93 (pinned against planted duplicates in
    tests/test_textops.py). Pair ids are packed into uint64 for the
    dedup, so ids must fit uint32 — same documented bound as
    near_dup_pairs_minhash."""
    if dim is None:
        dim = len(ds.limit(1).take(1)[0][vec_col])
    if num_pair_parts is None:
        from bento_ray.util import cluster_cpus

        num_pair_parts = max(4, cluster_cpus())
    P = num_pair_parts
    thr = float(threshold)
    rng = np.random.RandomState(seed)
    planes_ref = ray.put(rng.standard_normal((num_tables, num_planes, dim)))

    bucketed = ds.map_batches(
        _LshBucketer, fn_constructor_args=(planes_ref, vec_col),
        batch_format="pyarrow", concurrency=_conc(concurrency))

    def _empty_pairs(with_part: bool = True) -> pa.Table:
        cols = {"id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64())}
        if with_part:
            cols["pair_part"] = pa.array([], pa.int64())
        return pa.table(cols)

    def _per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _empty_pairs()
        ids = _ids_np(g.column(id_col))
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vm = _normalize(_stack(g.column(vec_col))[order])
        S = vm @ vm.T                       # bucket-local — LSH bounds m
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = S[ia, ib] >= thr
        if not keep.any():
            return _empty_pairs()
        packed = np.unique(
            ids[ia[keep]].astype(np.uint64) << np.uint64(32)
            | ids[ib[keep]].astype(np.uint64))
        return pa.table({
            "id_a": pa.array((packed >> np.uint64(32)).astype(np.int64)),
            "id_b": pa.array(
                (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)),
            "pair_part": pa.array((packed % np.uint64(P)).astype(np.int64))})

    pairs = bucketed.groupby("lsh_bucket").map_groups(
        _per_bucket, batch_format="pyarrow")

    def _uniq(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty_pairs(with_part=False)
        packed = np.unique(
            _ids_np(g.column("id_a")).astype(np.uint64) << np.uint64(32)
            | _ids_np(g.column("id_b")).astype(np.uint64))
        return pa.table({
            "id_a": pa.array((packed >> np.uint64(32)).astype(np.int64)),
            "id_b": pa.array(
                (packed & np.uint64(0xFFFFFFFF)).astype(np.int64))})

    return pairs.groupby("pair_part").map_groups(
        _uniq, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF-bucketed ANN — the coarse-quantizer alternative to LSH
# ---------------------------------------------------------------------------


def _spherical_kmeans(sample: np.ndarray, num_cells: int, iters: int,
                      rng) -> np.ndarray:
    """Lloyd iterations on NORMALIZED vectors (assign by max dot
    product, recenter, renormalize) — the standard IVF coarse
    quantizer, trained on a bounded sample. Empty cells are reseeded
    to the point worst-served by the current centroids."""
    num_cells = min(num_cells, sample.shape[0])
    C = sample[rng.choice(sample.shape[0], num_cells, replace=False)].copy()
    for _ in range(iters):
        sims = sample @ C.T                        # (n, cells)
        assign = np.argmax(sims, axis=1)
        # reseed the i-th empty cell with the i-th WORST-served point
        # (ascending best-similarity): seeding every empty cell with
        # the same argmin point makes the duplicates tie forever and
        # permanently collapses cells
        worst = np.argsort(sims.max(axis=1), kind="stable")
        next_seed = 0
        for c in range(num_cells):
            members = sample[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
            else:
                C[c] = sample[worst[min(next_seed, len(worst) - 1)]]
                next_seed += 1
        C = _normalize(C)
    return C


class _IvfAssigner:
    def __init__(self, c_ref, vec_col):
        self.C = ray.get(c_ref) if isinstance(c_ref, ray.ObjectRef) else c_ref
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        vm = _normalize(_stack(t.column(self.vec_col)))
        cell = np.argmax(vm @ self.C.T, axis=1).astype(np.int64)
        return t.append_column("ivf_cell", pa.array(cell, pa.int64()))


def ivf_cosine_topk(ds, query_matrix: np.ndarray, query_ids, k: int = 5,
                    num_cells: int = 16, nprobe: int = 2,
                    train_sample: int = 2048, train_iters: int = 8,
                    seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    concurrency: int | None = None):
    """IVF approximate top-k: a spherical k-means coarse quantizer
    (trained driver-side on a BOUNDED ``train_sample``-row sample —
    the standard IVF recipe; the sample and the (cells × dim) centroid
    matrix are small regardless of corpus size) partitions vectors
    into ``num_cells`` cells; each query probes its ``nprobe`` nearest
    cells. One groupby shuffle over cell ids does all the scanning
    (cells are data-adaptive, so — unlike LSH's oblivious hyperplanes —
    probed cells concentrate true neighbors: measured recall@10 on the
    sf0.01 embeddings is pinned in tests/test_textops.py). The final
    combine sees ≤ nprobe × k candidate rows per query."""
    rng = np.random.RandomState(seed)
    sample = ds.limit(train_sample).take(train_sample)
    sm = _normalize(np.array([r[vec_col] for r in sample], np.float64))
    C = _spherical_kmeans(sm, num_cells, train_iters, rng)
    c_ref = ray.put(C)

    assigned = ds.map_batches(
        _IvfAssigner, fn_constructor_args=(c_ref, vec_col),
        batch_format="pyarrow", concurrency=_conc(concurrency))

    qm = _normalize(np.asarray(query_matrix, np.float64))
    nprobe = min(nprobe, C.shape[0])
    probe = np.argsort(-(qm @ C.T), axis=1, kind="stable")[:, :nprobe]
    by_cell: dict[int, list[int]] = {}
    for qi in range(qm.shape[0]):
        for c in probe[qi]:
            by_cell.setdefault(int(c), []).append(qi)
    qids = list(query_ids)

    qids_np = np.asarray(qids, np.int64)

    def _per_cell(g: pa.Table) -> pa.Table:
        qis = by_cell.get(int(g.column("ivf_cell")[0].as_py()), [])
        if not qis:
            return _empty_cands()
        vm = _normalize(_stack(g.column(vec_col)))
        ids = _ids_np(g.column(id_col))
        rows = qm[qis] @ vm.T                       # (|qis|, n)
        kk = min(k + 1, rows.shape[1])   # +1 survives self-match removal
        top = np.argpartition(-rows, kk - 1, axis=1)[:, :kk]
        qid = np.repeat(qids_np[qis], kk)
        vid = ids[top.reshape(-1)]
        sc = np.take_along_axis(rows, top, axis=1).reshape(-1)
        m = vid != qid
        return pa.table({"query_id": pa.array(qid[m]),
                         "vec_id": pa.array(vid[m]),
                         "score": pa.array(sc[m])})

    cands = assigned.groupby("ivf_cell").map_groups(
        _per_cell, batch_format="pyarrow")
    return cands.groupby("query_id").map_groups(
        _topk_final(k, dedup=True), batch_format="pyarrow")


def semdedup(ds, threshold: float = 0.9, num_cells: int = 8,
             keep: str = "min_id", train_sample: int = 2048,
             train_iters: int = 8, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             concurrency: int | None = None):
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with a spherical
    k-means coarse quantizer, then WITHIN each cluster drop every
    document that has a higher-priority semantic duplicate
    (cosine ≥ ``threshold``). Returns the kept ``id_col`` values.

    Priority (``keep``):
      - ``"min_id"``  — the smallest id among duplicates survives
        (deterministic, engine-independent; a doc is dropped iff ANY
        lower-id doc in its cluster clears the threshold — the exact
        rule a SQL ``NOT EXISTS`` self-join expresses, which is how
        the driver oracle checks this op at the 1-cell gate).
      - ``"far"``     — the paper's best-performing rule: among
        duplicates, keep the example FARTHEST from its cluster
        centroid (low centroid-similarity = high priority; ties break
        toward the smaller id).

    Scale shape: the quantizer is trained driver-side on a bounded
    ``train_sample``; the (cells × dim) centroid matrix is broadcast
    once via ``ray.put``; cell assignment is one stateless
    ``map_batches``; ONE groupby shuffle co-locates each cluster; the
    per-cluster prune is a chunked float64 matmul whose transient is
    ≤ CHUNK² doubles regardless of cluster size. Total compute is
    Σ c_i² · D — SemDeDup's point is that ``num_cells`` grows with the
    corpus (the paper used 50k clusters for 134M docs) so clusters
    stay small and the quadratic term never sees N²."""
    CH = 2048
    rng = np.random.RandomState(seed)
    sample = ds.limit(train_sample).take(train_sample)
    sm = _normalize(np.array([r[vec_col] for r in sample], np.float64))
    C = _spherical_kmeans(sm, num_cells, train_iters, rng)
    c_ref = ray.put(C)

    assigned = ds.map_batches(
        _IvfAssigner, fn_constructor_args=(c_ref, vec_col),
        batch_format="pyarrow", concurrency=_conc(concurrency))

    thr = float(threshold)

    def _per_cell(g: pa.Table) -> pa.Table:
        ids = _ids_np(g.column(id_col))
        vm = _normalize(_stack(g.column(vec_col)))
        if keep == "min_id":
            order = np.argsort(ids, kind="stable")
        else:  # "far": ascending centroid-similarity, ties by id
            cen = C[int(g.column("ivf_cell")[0].as_py())]
            order = np.lexsort((ids, vm @ cen))
        ids_o, vm_o = ids[order], vm[order]
        n = len(ids_o)
        dropped = np.zeros(n, bool)
        for s in range(0, n, CH):
            e = min(s + CH, n)
            hit = np.zeros(e - s, bool)
            rows = np.arange(s, e)
            for cs in range(0, e, CH):
                ce = min(cs + CH, e)
                sims = vm_o[s:e] @ vm_o[cs:ce].T
                mask = (sims >= thr) & \
                    (np.arange(cs, ce)[None, :] < rows[:, None])
                hit |= mask.any(axis=1)
            dropped[s:e] = hit
        kept = ids_o[~dropped]
        kept.sort()
        return pa.table({id_col: pa.array(kept, pa.int64())})

    return assigned.groupby("ivf_cell").map_groups(
        _per_cell, batch_format="pyarrow")


def embedding_dim_stats(ds, vec_col: str = "embedding"):
    """Per-dimension mean / population-std over an embedding column —
    the moment-combiner shape: each batch collapses to one (dim, sum,
    sumsq, n) partial row per dimension (float64 accumulation), the
    global groupby sums D-row partials (shuffle ∝ dims × blocks, never
    vectors), and the final map computes the moments. The 100 TB
    normalization-prep pass (whitening / standardization inputs)."""
    from bento_ray.util import duckdb_round

    def _partial(t: pa.Table) -> pa.Table:
        m = _stack(t.column(vec_col)).astype(np.float64)
        return pa.table({
            "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
            "s": pa.array(m.sum(axis=0)),
            "ss": pa.array((m * m).sum(axis=0)),
            "n": pa.array(np.full(m.shape[1], m.shape[0], np.int64)),
        })

    def _final(t: pa.Table) -> pa.Table:
        s = t.column("sum(s)").to_numpy()
        ss = t.column("sum(ss)").to_numpy()
        n = t.column("sum(n)").to_numpy().astype(np.float64)
        mean = s / n
        var = np.maximum(ss / n - mean * mean, 0.0)
        return pa.table({
            "dim": t.column("dim"),
            "mean": pa.array(duckdb_round(mean, 4)),
            "std": pa.array(duckdb_round(np.sqrt(var), 4)),
            "n": pa.array(n.astype(np.int64)),
        })

    return ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby("dim").sum(["s", "ss", "n"]) \
        .map_batches(_final, batch_format="pyarrow")


def kmeans_assign(ds, centroids: np.ndarray, *, vec_col: str = "embedding",
                  out_col: str = "cluster", sim_col: str | None = "sim",
                  concurrency: int | None = None):
    """Assign every vector to its max-cosine centroid (ties → the
    smallest centroid index, numpy argmax order). Centroids broadcast
    ONCE via ``ray.put`` and each batch is one (N×D)·(D×K) matmul —
    the scale-path clustering-apply step (centroid tables are k×d,
    always driver-sized; the corpus never shuffles)."""
    from bento_ray.util import duckdb_round

    C = _normalize(np.asarray(centroids, np.float64))
    c_ref = ray.put(C)

    def _assign(t: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        vm = _normalize(_stack(t.column(vec_col)))
        sims = vm @ Cm.T
        cell = np.argmax(sims, axis=1)
        t = t.append_column(out_col, pa.array(cell.astype(np.int64)))
        if sim_col:
            best = sims[np.arange(len(cell)), cell]
            t = t.append_column(sim_col,
                                pa.array(duckdb_round(best, 4)))
        return t

    return ds.map_batches(_assign, batch_format="pyarrow",
                          concurrency=_conc(concurrency))


def _moment_reduce(g: pa.Table) -> pa.Table:
    """Arrow-native combiner for the k-means / PQ moment exchange:
    one group of per-block (vsum, n) partials for a single cell (or
    (sub, cell)) folds to one row. Replaces the former pandas
    map_groups seam — no object-dtype round-trip; the vsum fold is a
    single (rows × d) numpy sum over the stacked list buffer."""
    import pyarrow.compute as pc

    vsum = _stack(g.column("vsum")).sum(axis=0)
    cols = {}
    for key in ("sub", "cell"):
        if key in g.column_names:
            cols[key] = g.column(key).slice(0, 1)
    cols["vsum"] = pa.array([vsum])
    cols["n"] = pa.array([pc.sum(g.column("n")).as_py() or 0],
                         pa.int64())
    return pa.table(cols)


def _collect_moments(agg_ds) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pull the reduced (cell, n, vsum) table — ≤ k rows — onto the
    driver as numpy arrays (no pandas)."""
    cells, ns, sums = [], [], []
    for t in agg_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if not t.num_rows:
            continue
        cells.append(t.column("cell").to_numpy())
        ns.append(t.column("n").to_numpy())
        sums.append(_stack(t.column("vsum")))
    if not cells:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty((0, 0), np.float64))
    return (np.concatenate(cells), np.concatenate(ns),
            np.vstack(sums))


def kmeans_fit(ds, k: int, *, iters: int = 5, vec_col: str = "embedding",
               seed: int = 42, init: np.ndarray | None = None) -> np.ndarray:
    """DISTRIBUTED spherical k-means (Lloyd): each iteration broadcasts
    the current centroids, every batch emits k partial rows (per-cell
    vector sum + count — the moment combiner), one k-row groupby
    reduces them, and the driver recenters/renormalizes the k×d
    matrix. Corpus vectors never leave their blocks; per-iteration
    exchange is k × blocks rows regardless of corpus size. Empty cells
    reseed to the first centroid's antipode (deterministic).

    ``init`` defaults to a deterministic sample: the first k vectors
    of the dataset (callers wanting random init pass their own)."""
    ds = ds.materialize()   # one upstream execution, iters consumers
    if init is None:
        head = ds.limit(k).to_pandas()
        init = np.array(head[vec_col].tolist(), np.float64)
    C = _normalize(np.asarray(init, np.float64))
    k = C.shape[0]

    for _ in range(iters):
        c_ref = ray.put(C)

        def _partial(t: pa.Table) -> pa.Table:
            Cm = ray.get(c_ref)
            if not t.num_rows:
                return pa.table({
                    "cell": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64())),
                    "n": pa.array([], pa.int64())})
            vm = _normalize(_stack(t.column(vec_col)))
            cell = np.argmax(vm @ Cm.T, axis=1)
            d = vm.shape[1]
            sums = np.zeros((Cm.shape[0], d), np.float64)
            np.add.at(sums, cell, vm)
            cnt = np.bincount(cell, minlength=Cm.shape[0])
            return pa.table({
                "cell": pa.array(np.arange(Cm.shape[0], dtype=np.int64)),
                "vsum": pa.array(list(sums)),
                "n": pa.array(cnt.astype(np.int64)),
            })

        agg_ds = ds.map_batches(_partial, batch_format="pyarrow") \
            .groupby("cell").map_groups(_moment_reduce,
                                        batch_format="pyarrow")
        cells, ns, sums = _collect_moments(agg_ds)
        newC = C.copy()
        if cells.size:                        # empty dataset: keep C
            has = ns > 0
            newC[cells[has]] = sums[has] / ns[has, None]
            newC[cells[~has]] = -C[0]
        C = _normalize(newC)
    return C


# ---------------------------------------------------------------------------
# product quantization (the 10^12-vector ANN scale path: 64-dim float
# vectors compress to m uint8 codes; search scans codes with per-query
# lookup tables instead of touching raw vectors)
# ---------------------------------------------------------------------------

def pq_fit(ds, *, m: int = 4, ks: int = 8, iters: int = 5,
           vec_col: str = "embedding",
           init: np.ndarray | None = None) -> np.ndarray:
    """Train per-subspace EUCLIDEAN k-means codebooks (Jégou et al.
    2011 product quantization): the d-dim space splits into ``m``
    contiguous subspaces; each learns ``ks`` centroids. Distributed
    shape mirrors ``kmeans_fit``: per iteration the codebooks
    broadcast once, every batch emits m×ks moment rows (per-(sub,
    cell) vector sum + count), ONE m×ks-row groupby reduces them, the
    driver recenters. Corpus vectors never shuffle. Returns
    (m, ks, d/m) float64.

    ``init`` defaults to the subvectors of the dataset's first ks
    rows — deterministic, like kmeans_fit."""
    ds = ds.materialize()   # one upstream execution, iters consumers
    if init is None:
        head = ds.limit(ks).to_pandas()
        init = np.array(head[vec_col].tolist(), np.float64)
    V0 = np.asarray(init, np.float64)
    d = V0.shape[1]
    if d % m:
        raise ValueError("vector dim must divide into m subspaces")
    dsub = d // m
    C = np.stack([V0[:ks, s * dsub:(s + 1) * dsub] for s in range(m)])

    for _ in range(iters):
        c_ref = ray.put(C)

        def _partial(t: pa.Table) -> pa.Table:
            Cm = ray.get(c_ref)          # (m, ks, dsub)
            if not t.num_rows:
                return pa.table({
                    "sub": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64())),
                    "n": pa.array([], pa.int64())})
            vm = _stack(t.column(vec_col)).astype(np.float64)
            subs, cells, sums, ns = [], [], [], []
            for s in range(Cm.shape[0]):
                x = vm[:, s * dsub:(s + 1) * dsub]
                d2 = ((x[:, None, :] - Cm[s][None, :, :]) ** 2).sum(2)
                cell = np.argmin(d2, axis=1)
                vsum = np.zeros((Cm.shape[1], dsub), np.float64)
                np.add.at(vsum, cell, x)
                cnt = np.bincount(cell, minlength=Cm.shape[1])
                subs.append(np.full(Cm.shape[1], s, np.int64))
                cells.append(np.arange(Cm.shape[1], dtype=np.int64))
                sums.append(vsum)
                ns.append(cnt.astype(np.int64))
            return pa.table({
                "sub": pa.array(np.concatenate(subs)),
                "cell": pa.array(np.concatenate(cells)),
                "vsum": pa.array(list(np.concatenate(sums))),
                "n": pa.array(np.concatenate(ns)),
            })

        agg_ds = ds.map_batches(_partial, batch_format="pyarrow") \
            .groupby(["sub", "cell"]).map_groups(
                _moment_reduce, batch_format="pyarrow")
        newC = C.copy()
        for t in agg_ds.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
            subs = t.column("sub").to_numpy()
            cells = t.column("cell").to_numpy()
            ns = t.column("n").to_numpy()
            sums = _stack(t.column("vsum"))
            has = ns > 0
            newC[subs[has], cells[has]] = sums[has] / ns[has, None]
        C = newC
    return C


def pq_encode(ds, codebooks: np.ndarray, *, vec_col: str = "embedding",
              concurrency: int | None = None):
    """Encode every vector to its per-subspace nearest codeword
    (squared-L2 argmin, ties → smallest code): appends integer columns
    ``code_0 … code_{m-1}``. Codebooks broadcast ONCE via ray.put;
    per batch one (N × ks) distance matrix per subspace. At scale the
    output is the 8-byte-per-vector code table the ADC search scans."""
    C = np.asarray(codebooks, np.float64)
    m, ks, dsub = C.shape
    c_ref = ray.put(C)

    def _enc(t: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        vm = _stack(t.column(vec_col)).astype(np.float64)
        for s in range(m):
            x = vm[:, s * dsub:(s + 1) * dsub]
            d2 = ((x[:, None, :] - Cm[s][None, :, :]) ** 2).sum(2)
            t = t.append_column(
                f"code_{s}", pa.array(np.argmin(d2, 1).astype(np.int64)))
        return t

    return ds.map_batches(_enc, batch_format="pyarrow",
                          concurrency=_conc(concurrency))


class _AdcScorer:
    """Actor stage for PQ-ADC search: per-query distance tables
    (nq × m × ks — each entry ‖q_sub − codeword‖²) built ONCE per
    actor; per batch the vectors encode to codes and approximate
    distances are m table gathers + a sum. Emits each batch's local
    top-k per query (≤ k × nq rows per block into the final
    exchange)."""

    def __init__(self, cb_ref, q_ref, k: int, vec_col: str,
                 id_col: str):
        C = ray.get(cb_ref) if isinstance(cb_ref, ray.ObjectRef) else cb_ref
        Q, qids = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) \
            else q_ref
        self.C = np.asarray(C, np.float64)
        self.m, self.ks, self.dsub = self.C.shape
        self.Q = np.asarray(Q, np.float64)
        self.qids = np.asarray(qids, np.int64)
        self.k = k
        self.vec_col, self.id_col = vec_col, id_col
        nq = self.Q.shape[0]
        self.T = np.zeros((nq, self.m, self.ks), np.float64)
        for s in range(self.m):
            qs = self.Q[:, s * self.dsub:(s + 1) * self.dsub]
            self.T[:, s, :] = (
                (qs[:, None, :] - self.C[s][None, :, :]) ** 2).sum(2)

    def __call__(self, t: pa.Table) -> pa.Table:
        vm = _stack(t.column(self.vec_col)).astype(np.float64)
        ids = t.column(self.id_col).to_numpy()
        n = len(ids)
        codes = np.empty((n, self.m), np.int64)
        for s in range(self.m):
            x = vm[:, s * self.dsub:(s + 1) * self.dsub]
            codes[:, s] = np.argmin(
                ((x[:, None, :] - self.C[s][None, :, :]) ** 2).sum(2), 1)
        # adc[q, v] = Σ_s T[q, s, codes[v, s]]
        adc = np.zeros((self.Q.shape[0], n), np.float64)
        for s in range(self.m):
            adc += self.T[:, s, codes[:, s]]
        k = min(self.k, n)
        part = np.argpartition(adc, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        vidx = part.reshape(-1)
        return pa.table({
            "query_id": pa.array(rows_q, pa.int64()),
            "vec_id": pa.array(ids[vidx], pa.int64()),
            "adc_dist": pa.array(
                np.take_along_axis(adc, part, 1).reshape(-1)),
        })


def pq_topk(ds, codebooks: np.ndarray, query_matrix: np.ndarray,
            query_ids, k: int = 5, *, vec_col: str = "embedding",
            id_col: str = "vec_id", concurrency: int | None = None):
    """Approximate nearest neighbours by PQ asymmetric-distance
    computation: block-local ADC top-k (combiner — ≤ k rows per query
    per block move) → one small groupby reduces to the global top-k
    per query. Ties on distance resolve by vec_id. With codebooks
    rich enough to reconstruct every vector exactly, ADC equals exact
    squared L2 (the pytest exactness gate)."""
    cb_ref = ray.put(np.asarray(codebooks, np.float64))
    q_ref = ray.put((np.asarray(query_matrix, np.float64),
                     np.asarray(query_ids, np.int64)))
    partials = ds.map_batches(
        _AdcScorer, fn_constructor_args=(cb_ref, q_ref, k, vec_col,
                                         id_col),
        batch_format="pyarrow", concurrency=_conc(concurrency))

    def _final(g: pa.Table) -> pa.Table:
        d = g.column("adc_dist").to_numpy()
        v = g.column("vec_id").to_numpy()
        order = np.lexsort((v, d))[:k]
        return pa.table({
            "query_id": g.column("query_id").take(pa.array(order)),
            "vec_id": pa.array(v[order], pa.int64()),
            "adc_dist": pa.array(d[order]),
        })

    return partials.groupby("query_id").map_groups(
        _final, batch_format="pyarrow")
