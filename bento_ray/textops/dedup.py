"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Ray-Data-first shapes (see also stages/dedupe.py for exact dedup):

- MinHash signatures are computed per batch (numpy-vectorized universal
  hashing over shingle hashes) — embarrassingly parallel.
- LSH banding explodes each doc into (band_id, band_hash) rows; the
  single shuffle is ``groupby([band_id, band_hash])``, which brings
  candidate duplicates together; pairs are emitted per bucket and
  deduplicated.
- Candidate verification recomputes exact n-gram Jaccard per pair
  against a broadcast doc_id → shingle-set map (one copy per doc); at
  very large scale swap the broadcast for a bucketed pair-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from bento_ray.util import resolve_concurrency as _conc


def _ren(col_from, col_to):
    """Batch fn renaming one column (shared by the near-dup joins)."""
    def _f(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [col_to if c == col_from else c for c in t.column_names])
    return _f
from bento_ray.util import duckdb_round

from bento_ray.textops.quality import hash_word, word_hashes

_MERS = (1 << 61) - 1


def _combine_shingles(hs: np.ndarray, k: int) -> np.ndarray:
    """Polynomial combine of k consecutive word hashes (numpy)."""
    out = np.zeros(len(hs) - k + 1, np.uint64)
    for j in range(k):
        out = (out * np.uint64(1_000_003) + hs[j:len(hs) - k + 1 + j]) \
            % np.uint64(_MERS)
    return np.unique(out)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of word k-shingles (k consecutive words) for one doc."""
    return _shingle_hashes_batch([text], k)[0]


def _shingle_hashes_batch(texts, k: int) -> list[np.ndarray]:
    """Per-doc k-shingle hash arrays with ONE vectorized word-hash
    call across the whole batch (word_hashes setup cost amortizes
    ~10×; measured 204 µs/doc per-call vs 25 µs/doc batched)."""
    flat: list[str] = []
    spans: list[tuple[str, int, int]] = []
    for t in texts:
        ws = (t or "").split()
        if not ws:
            spans.append(("empty", 0, 0))
        elif len(ws) < k:
            spans.append(("joined", len(flat), 1))
            flat.append(" ".join(ws))
        else:
            spans.append(("words", len(flat), len(ws)))
            flat.extend(ws)
    hs = word_hashes(flat) if flat else np.empty(0, np.uint64)
    out: list[np.ndarray] = []
    for kind, start, ln in spans:
        if kind == "empty":
            out.append(np.empty(0, np.uint64))
        elif kind == "joined":
            out.append(hs[start:start + 1].copy())
        else:
            out.append(_combine_shingles(hs[start:start + ln], k))
    return out


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERS, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERS, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHasher:
    """Per-batch MinHash signatures. Permutation parameters are built
    once per actor (seeded, deterministic across the cluster)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        self.a, self.b = _perm_params(num_perm, seed)
        self.num_perm = num_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.full(self.num_perm, _MERS, np.uint64)
        # h_i(x) = (a_i * x + b_i) mod p — broadcast over shingles
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERS)
        return vals.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        shingle_sets = _shingle_hashes_batch(
            t.column("text").to_pylist(), self.k)
        flat, lens = _flat_segments(shingle_sets)
        keep = lens > 0
        starts = np.concatenate(
            [[0], np.cumsum(lens[keep])[:-1]]).astype(np.int64) \
            if keep.any() else np.empty(0, np.int64)
        sigs = np.full((len(lens), self.num_perm), _MERS, np.uint64)
        sigs[keep] = _sig_matrix(flat, starts, self.a, self.b)
        arr = pa.ListArray.from_arrays(
            np.arange(len(lens) + 1, dtype=np.int32) * self.num_perm,
            pa.array(sigs.astype(np.int64).ravel(), pa.int64()))
        return t.append_column("minhash", arr)


def minhash_signatures(ds, num_perm: int = 64, shingle_k: int = 3,
                       seed: int = 42, concurrency: int | None = None):
    return ds.map_batches(MinHasher, fn_constructor_args=(num_perm, shingle_k, seed),
                          batch_format="pyarrow",
                          concurrency=_conc(concurrency))


def _sig_matrix(sh_flat: np.ndarray, starts: np.ndarray,
                a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signatures for contiguous shingle segments, one
    vectorized pass per permutation (no per-doc Python).

    ``sh_flat`` holds the concatenated shingle hashes of the batch's
    NON-EMPTY docs; ``starts`` the segment start index of each doc.
    Returns (n_docs, num_perm) uint64 — identical values to the old
    per-doc ``(sh * a + b) % p → min`` (same uint64 wraparound)."""
    num_perm = len(a)
    if len(starts) == 0:
        return np.empty((0, num_perm), np.uint64)
    M = np.uint64(_MERS)
    sig = np.empty((num_perm, len(starts)), np.uint64)
    for i in range(num_perm):
        v = (sh_flat * a[i] + b[i]) % M
        sig[i] = np.minimum.reduceat(v, starts)
    return sig.T


def _band_hashes(sig_docs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, num_perm) signatures → (n_docs, bands) int64 band
    hashes. ``pd.util.hash_array`` is elementwise, so hashing the whole
    matrix once and summing per band segment is bit-identical to the
    old per-(doc, band) ``hash_array(seg).sum() % 2^62`` calls."""
    n, num_perm = sig_docs.shape
    rows_per_band = num_perm // bands
    h = pd.util.hash_array(np.ascontiguousarray(sig_docs).ravel()) \
        .astype(np.uint64)
    sums = h.reshape(n, bands, rows_per_band).sum(axis=2, dtype=np.uint64)
    return (sums % np.uint64(1 << 62)).astype(np.int64)


def _flat_segments(arrays: list[np.ndarray]):
    """Concatenate per-doc shingle arrays → (flat, lens)."""
    lens = np.array([len(s) for s in arrays], np.int64)
    nonempty = [s for s in arrays if len(s)]
    flat = (np.concatenate(nonempty).astype(np.uint64)
            if nonempty else np.empty(0, np.uint64))
    return flat, lens


def _flat_packed(col) -> tuple[np.ndarray, np.ndarray]:
    """Packed-binary shingle column → (flat uint64 hashes, per-doc
    element counts). Zero-copy view of the Arrow values buffer when
    unsliced/8-aligned; one bytes-join fallback otherwise."""
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lens = (pc.binary_length(arr).fill_null(0)
            .to_numpy(zero_copy_only=False).astype(np.int64) // 8)
    bufs = arr.buffers()
    if arr.null_count == 0 and len(bufs) > 2 and bufs[2] is not None:
        offsets = np.frombuffer(bufs[1], np.int32)[
            arr.offset:arr.offset + len(arr) + 1]
        s, e = int(offsets[0]), int(offsets[-1])
        if s % 8 == 0:
            raw = np.frombuffer(bufs[2], np.uint8)[s:e]
            return raw.view(np.uint64), lens
    flat = b"".join(x or b"" for x in arr.to_pylist())
    return np.frombuffer(flat, np.uint64).copy(), lens


def _band_table(ids: np.ndarray, sig_docs: np.ndarray,
                bands: int) -> pa.Table:
    """(doc ids, signatures) → exploded (doc_id, band_id, band_hash)
    rows, fully vectorized; row order matches the old per-doc loop
    (docs in batch order, bands ascending within each doc)."""
    n = len(ids)
    if n == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "band_id": pa.array([], pa.int32()),
            "band_hash": pa.array([], pa.int64()),
        })
    bh = _band_hashes(sig_docs, bands)
    return pa.table({
        "doc_id": pa.array(np.repeat(ids.astype(np.int64), bands),
                           pa.int64()),
        "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n),
                            pa.int32()),
        "band_hash": pa.array(bh.ravel(), pa.int64()),
    })


class _BandExploder:
    """doc → one row per LSH band: (band_id, band_hash, doc_id). Rows
    are tiny; shingle sets for the verify step travel separately (one
    copy per doc), never one copy per band."""

    def __init__(self, num_perm, bands, shingle_k, seed):
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.hasher = MinHasher(num_perm, shingle_k, seed)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id").to_pylist(), np.int64)
        shingle_sets = _shingle_hashes_batch(
            t.column("text").to_pylist(), self.hasher.k)
        flat, lens = _flat_segments(shingle_sets)
        keep = lens > 0
        starts = np.concatenate(
            [[0], np.cumsum(lens[keep])[:-1]]).astype(np.int64) \
            if keep.any() else np.empty(0, np.int64)
        sig = _sig_matrix(flat, starts, self.hasher.a, self.hasher.b)
        return _band_table(ids[keep], sig, self.bands)


class _ShingleSets:
    """doc → packed sorted-unique shingle hashes. Packed as BINARY
    (int64 little-endian bytes) rather than list<int64> because
    Arrow's hash-join kernel rejects list-typed payload columns; the
    binary round-trips through np.frombuffer zero-copy."""

    def __init__(self, shingle_k):
        self.k = shingle_k

    def __call__(self, t: pa.Table) -> pa.Table:
        sets = [
            sh.astype(np.int64).tobytes()
            for sh in _shingle_hashes_batch(
                t.column("text").to_pylist(), self.k)
        ]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "shingles": pa.array(sets, pa.binary()),
        })


import functools


@functools.lru_cache(maxsize=8)
def _exploder_for(num_perm, bands, shingle_k, seed):
    return _BandExploder(num_perm, bands, shingle_k, seed)


def _explode_packed(t: pa.Table, num_perm: int, bands: int,
                    seed: int) -> pa.Table:
    """Band rows derived from the PACKED shingle column — shingling is
    the dominant per-doc compute and must run once, not once per plan
    consumer. Fully vectorized: the packed binary column is viewed as
    one flat uint64 array, signatures come from per-permutation
    ``minimum.reduceat`` passes, and band hashes from ONE
    ``pd.util.hash_array`` call over the whole signature matrix
    (bit-identical to the old per-(doc, band) loop)."""
    a, b = _perm_params(num_perm, seed)
    ids = np.asarray(t.column("doc_id").to_pylist(), np.int64)
    flat, lens = _flat_packed(t.column("shingles"))
    keep = lens > 0
    starts = np.concatenate(
        [[0], np.cumsum(lens[keep])[:-1]]).astype(np.int64) \
        if keep.any() else np.empty(0, np.int64)
    sig = _sig_matrix(flat, starts, a, b)
    return _band_table(ids[keep], sig, bands)


def _pair_partition_scan(t: pa.Table, num_pair_parts: int) -> pa.Table:
    """Vectorized candidate-pair emission over ONE coarse bucket
    partition: sort by (band_id, band_hash, doc_id), boundary-scan for
    buckets, expand pairs only inside multi-doc buckets (rare), tag
    each pair with a pair-hash partition id for the downstream dedup
    groupby."""
    n = len(t)
    if n == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "pair_part": pa.array([], pa.int64())})
    idx = pa.compute.sort_indices(t, sort_keys=[
        ("band_id", "ascending"), ("band_hash", "ascending"),
        ("doc_id", "ascending")])
    t = t.take(idx)
    bid = t.column("band_id").to_numpy()
    bh = t.column("band_hash").to_numpy()
    docs = t.column("doc_id").to_numpy()
    # Fully vectorized pair expansion — no Python iteration over
    # buckets (a coarse partition at CC scale holds millions of
    # buckets, nearly all singletons; a per-bucket loop is O(buckets)
    # interpreter work for O(pairs) useful output).
    bucket_id = np.zeros(n, np.int64)
    bucket_id[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
    bucket_id = np.cumsum(bucket_id)
    # duplicate (bucket, doc) rows are adjacent after the sort
    dup = np.zeros(n, bool)
    dup[1:] = (docs[1:] == docs[:-1]) & (bucket_id[1:] == bucket_id[:-1])
    if dup.any():
        keep = ~dup
        docs, bucket_id = docs[keep], bucket_id[keep]
        n = len(docs)
    sizes = np.bincount(bucket_id)
    group_start = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    # within-bucket position p: each row is the 'b' of exactly p pairs
    # whose 'a's are the p earlier rows of its bucket (docs ascending
    # within a bucket ⇒ doc_a < doc_b by construction)
    pos = np.arange(n) - group_start[bucket_id]
    total = int(pos.sum())
    if total == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "pair_part": pa.array([], pa.int64())})
    seg_start = np.concatenate([[0], np.cumsum(pos)[:-1]])
    b_idx = np.repeat(np.arange(n), pos)
    a_idx = (np.arange(total) - np.repeat(seg_start, pos)
             + np.repeat(group_start[bucket_id], pos))
    A = docs[a_idx].astype(np.int64)
    B = docs[b_idx].astype(np.int64)
    # local dedup (same pair from several buckets in this partition)
    packed = np.unique(A.astype(np.uint64) << np.uint64(32) |
                       B.astype(np.uint64))
    A = (packed >> np.uint64(32)).astype(np.int64)
    B = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    pair_part = (packed % np.uint64(num_pair_parts)).astype(np.int64)
    return pa.table({"doc_a": pa.array(A, pa.int64()),
                     "doc_b": pa.array(B, pa.int64()),
                     "pair_part": pa.array(pair_part, pa.int64())})


def _unique_pairs_partition(t: pa.Table) -> pa.Table:
    """Global pair dedup within one pair-hash partition (cross-band
    duplicates land in the same partition by construction)."""
    if len(t) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    A = t.column("doc_a").to_numpy().astype(np.uint64)
    B = t.column("doc_b").to_numpy().astype(np.uint64)
    packed = np.unique((A << np.uint64(32)) | B)
    return pa.table({
        "doc_a": pa.array((packed >> np.uint64(32)).astype(np.int64)),
        "doc_b": pa.array((packed & np.uint64(0xFFFFFFFF)).astype(np.int64)),
    })


# Bloom filter over candidate-pair doc ids. 2^23 bits = 1 MiB per
# block-partial and for the merged broadcast array; with k=2 probes the
# false-positive rate is < 1% up to ~0.4M distinct pair-member ids and
# ~9% at 1.5M (fp ≈ (1 - e^(-kn/m))^k). Resize _BLOOM_BITS beyond
# ~0.4M ids to keep pruning effective — false positives only cost
# extra inner-join input, never wrong output.
_BLOOM_BITS = 1 << 23


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized, wraps mod 2^64."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bloom_positions(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h = _mix64(ids.astype(np.uint64))
    m = np.uint64(_BLOOM_BITS)
    return h % m, _mix64(h) % m


def _bloom_set(bits: np.ndarray, ids: np.ndarray) -> None:
    for p in _bloom_positions(ids):
        np.bitwise_or.at(
            bits, (p >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (p & np.uint64(7)).astype(np.uint8)))


def _bloom_test(bits: np.ndarray, ids: np.ndarray) -> np.ndarray:
    mask = np.ones(len(ids), bool)
    for p in _bloom_positions(ids):
        byte = bits[(p >> np.uint64(3)).astype(np.int64)]
        mask &= ((byte >> (p & np.uint64(7)).astype(np.uint8))
                 & np.uint8(1)).astype(bool)
    return mask


def _build_pair_bloom(pairs):
    """Distributed Bloom build over the (already materialized) pairs
    Dataset: each block contributes one fixed-size partial (1 MiB
    regardless of block row count); partials are OR-merged on the
    driver and the merged array broadcast once via ray.put."""

    def _block_bloom(t: pa.Table) -> pa.Table:
        bits = np.zeros(_BLOOM_BITS // 8, np.uint8)
        ids = np.concatenate([
            t.column("doc_a").to_numpy().astype(np.uint64),
            t.column("doc_b").to_numpy().astype(np.uint64)])
        _bloom_set(bits, ids)
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    merged = np.zeros(_BLOOM_BITS // 8, np.uint8)
    partials = pairs.map_batches(_block_bloom, batch_format="pyarrow")
    for batch in partials.iter_batches(batch_format="pyarrow"):
        for buf in batch.column("bloom").to_pylist():
            merged |= np.frombuffer(buf, np.uint8)
    return ray.put(merged)


def near_dup_pairs_minhash(ds, *, num_perm: int = 64, bands: int = 16,
                           shingle_k: int = 3, threshold: float = 0.5,
                           seed: int = 42, concurrency: int | None = None,
                           num_parts: int | None = None):
    """MinHash+LSH near-duplicate pairs with exact-Jaccard
    verification — fully distributed, no driver-side materialization.

    Plan (each wide step is one shuffle, all narrow steps stream):

      docs → map_batches(_BandExploder)          tiny (band,hash,doc) rows
           → groupby(bucket_part).map_groups     P vectorized scans →
             candidate pairs                      (doc_a, doc_b, pair_part)
           → groupby(pair_part).map_groups       global pair dedup
           → shuffle_join(shingles, on=doc_a)    attach shingle set A
           → shuffle_join(shingles, on=doc_b)    attach shingle set B
           → map_batches(jaccard)                exact verify, filter

    Driver RSS stays flat: band rows, pairs and shingle sets all move
    through the object store; the per-partition scans are numpy
    (measured: per-GROUP map_groups cost one Python call per doc-band,
    20s+/80k rows — the coarse-partition scan removes that).

    Returns a Dataset of (doc_a, doc_b, jaccard) with doc_a < doc_b
    and jaccard ≥ threshold. doc_ids must fit in uint32 for the packed
    pair dedup (raise to 10^9 docs per run; shard the corpus above
    that, or widen to two-column dedup)."""
    from bento_ray.stages.join import shuffle_join
    from bento_ray.util import stable_hash

    if num_parts is None:
        from bento_ray.util import cluster_cpus

        num_parts = max(4, cluster_cpus())
    P = num_parts

    # Task-based stages, not actor pools: this plan already runs two
    # hash-join operators (whose aggregator actors reserve CPUs); at
    # low CPU counts three additional fixed actor pools starve them
    # (measured: 10.5s at 32 CPUs but >120s at 8).
    #
    # Shingle ONCE: this plan consumes the shingle table three times
    # (band explosion + both join sides); without materializing, Ray
    # re-executes the upstream read+shingle per consumer — 3× the
    # dominant per-doc compute. The packed table is compact (int64
    # hashes, ~1/3 of text bytes) and spills via the object store.
    _sh_fn = _ShingleSets(shingle_k)
    shingles = ds.map_batches(_sh_fn,
                              batch_format="pyarrow").materialize()

    def _explode(t: pa.Table) -> pa.Table:
        return _explode_packed(t, num_perm, bands, seed)

    exploded = shingles.map_batches(_explode, batch_format="pyarrow")

    def _bucket_part(t: pa.Table) -> pa.Table:
        h = (stable_hash(pd.Series(
            t.column("band_id").to_numpy().astype(np.int64) * 1_000_003
            + t.column("band_hash").to_numpy())) % np.uint64(P))
        return t.append_column("bucket_part",
                               pa.array(h.astype(np.int64), pa.int64()))

    pairs = (exploded
             .map_batches(_bucket_part, batch_format="pyarrow")
             .groupby("bucket_part")
             .map_groups(lambda t: _pair_partition_scan(
                 t.drop_columns(["bucket_part"]), P),
                 batch_format="pyarrow")
             .groupby("pair_part")
             .map_groups(lambda t: _unique_pairs_partition(
                 t.drop_columns(["pair_part"])), batch_format="pyarrow"))


    # Bloom semi-join pruning: only docs that appear in SOME candidate
    # pair need their shingle sets shipped through the attach joins —
    # typically a small fraction of the corpus (near-dup rate << 1).
    # The filter is built distributed (one fixed-size bit array per
    # pairs block, OR-merged on the driver: bounded at _BLOOM_BITS/8
    # bytes per block regardless of corpus size) and broadcast once
    # via ray.put. False positives only ship extra shingle rows into
    # an inner join — output is unchanged; false negatives are
    # impossible. Requires one consumption of `pairs` beyond the
    # joins, so pairs (small: post-dedup candidate pairs) is
    # materialized.
    pairs = pairs.materialize()
    bloom_ref = _build_pair_bloom(pairs)

    def _member(t: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        ids = t.column("doc_id").to_numpy().astype(np.uint64)
        return t.filter(pa.array(_bloom_test(bits, ids)))

    # Bloom-pruned shingle sets feed BOTH joins — materialize once so
    # the shingle explode never recomputes (and the fallback join's
    # schema probe stays O(1)). Bounded: pair-member docs only.
    pruned = shingles.map_batches(_member, batch_format="pyarrow") \
        .materialize()
    sh_a = pruned.map_batches(_ren("doc_id", "doc_a"),
                              batch_format="pyarrow")
    sh_b = pruned.map_batches(_ren("doc_id", "doc_b"),
                              batch_format="pyarrow")
    # force_fallback: the co-bucketed hash join is fully distributed
    # AND has no actor-pool spin-up — Ray's native Join operator spent
    # 40s of a 45s sf0.1 run on aggregator startup for a few hundred
    # Bloom-pruned rows. Both sides here are pair-bounded.
    joined = shuffle_join(pairs, sh_a, on="doc_a", how="inner",
                          suffix="_a", force_fallback=True)
    joined = joined.map_batches(_ren("shingles", "sh_a"),
                                batch_format="pyarrow").materialize()
    joined = shuffle_join(joined, sh_b, on="doc_b", how="inner",
                          suffix="_b", force_fallback=True)
    joined = joined.map_batches(_ren("shingles", "sh_b"),
                                batch_format="pyarrow")

    def _verify(t: pa.Table) -> pa.Table:
        A = t.column("doc_a").to_pylist()
        B = t.column("doc_b").to_pylist()
        SA = t.column("sh_a").to_pylist()
        SB = t.column("sh_b").to_pylist()
        out = []
        for a, b, sa, sb in zip(A, B, SA, SB):
            if not sa or not sb:
                continue
            sa_arr = np.frombuffer(sa, np.int64)
            sb_arr = np.frombuffer(sb, np.int64)
            inter = len(np.intersect1d(sa_arr, sb_arr,
                                       assume_unique=True))
            jac = inter / (len(sa_arr) + len(sb_arr) - inter)
            if jac >= threshold:
                # duckdb_round (half away from zero), not python round:
                # jaccard is oracle-compared against DuckDB ROUND()
                out.append((int(a), int(b), float(duckdb_round(jac, 6))))
        out.sort()
        return pa.table({
            "doc_a": pa.array([o[0] for o in out], pa.int64()),
            "doc_b": pa.array([o[1] for o in out], pa.int64()),
            "jaccard": pa.array([o[2] for o in out], pa.float64()),
        })

    return joined.map_batches(_verify, batch_format="pyarrow")


class SimHasher:
    """64-bit SimHash over word hashes (unit weights): bit b of the
    fingerprint is the sign of the sum of ±1 contributions."""

    def __init__(self):
        pass

    def fingerprint(self, text: str) -> int:
        words = (text or "").split()
        if not words:
            return 0
        return self._fp_from_hashes(word_hashes(words))

    def _fp_from_hashes(self, hs: np.ndarray) -> int:
        if len(hs) == 0:
            return 0
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        fp = np.uint64(0)
        for b in np.flatnonzero(acc > 0):
            fp |= np.uint64(1) << np.uint64(b)
        return int(fp)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        words_per_doc = [(s or "").split() for s in texts]
        flat = [w for ws in words_per_doc for w in ws]
        all_h = word_hashes(flat) if flat else np.empty(0, np.uint64)
        fps = []
        pos = 0
        for ws in words_per_doc:
            n = len(ws)
            hs = all_h[pos:pos + n]
            pos += n
            fps.append(self._fp_from_hashes(hs))
        # store as int64 (reinterpret) for parquet friendliness
        vals = np.array(fps, np.uint64).astype(np.int64)
        return t.append_column("simhash", pa.array(vals, pa.int64()))


def simhash64(ds, concurrency: int | None = None):
    return ds.map_batches(SimHasher, batch_format="pyarrow",
                          concurrency=_conc(concurrency))


# ---------------------------------------------------------------------------
# connected components over near-dup pairs → duplicate groups
# ---------------------------------------------------------------------------

def _star_scan(t: pa.Table, phase: str, num_parts: int) -> pa.Table:
    """One vectorized large-star / small-star pass over ONE coarse
    node partition (edges grouped by their scan endpoint ``u``).
    Emits canonically-oriented edges (big, small) tagged with the next
    round's partition id. No Python iteration over groups."""
    if len(t) == 0:
        return pa.table({"big": pa.array([], pa.int64()),
                         "small": pa.array([], pa.int64()),
                         "part": pa.array([], pa.int64())})
    idx = pa.compute.sort_indices(t, sort_keys=[("u", "ascending"),
                                                ("v", "ascending")])
    t = t.take(idx)
    u = t.column("u").to_numpy()
    v = t.column("v").to_numpy()
    n = len(u)
    gid = np.zeros(n, np.int64)
    gid[1:] = u[1:] != u[:-1]
    gid = np.cumsum(gid)
    starts = np.concatenate([[0], 1 + np.flatnonzero(u[1:] != u[:-1])])
    # v ascending within each u-group ⇒ the group's min neighbor is
    # its first row
    min_v = v[starts]
    if phase == "large":
        # m = min(Γ(u) ∪ {u}); emit (x, m) for every neighbor x > u
        m = np.minimum(min_v, u[starts])[gid]
        keep = v > u
        big, small = v[keep], m[keep]
    else:
        # small-star: edges arrive oriented u > v (u is the larger
        # endpoint), so Γ(u) here is exactly the smaller neighbors.
        # m = min(Γ); emit (x, m) for x ∈ Γ ∪ {u}, x ≠ m
        m = min_v[gid]
        keep = v != m
        big = np.concatenate([v[keep], u[starts]])
        small = np.concatenate([m[keep], min_v])
        keep2 = big != small
        big, small = big[keep2], small[keep2]
    if len(big) == 0:
        return pa.table({"big": pa.array([], pa.int64()),
                         "small": pa.array([], pa.int64()),
                         "part": pa.array([], pa.int64())})
    # partition-local dedup (packed uint64) + next-round partition tag
    packed = np.unique(big.astype(np.uint64) << np.uint64(32)
                       | small.astype(np.uint64))
    big = (packed >> np.uint64(32)).astype(np.int64)
    small = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    nxt = "small" if phase == "large" else "large"
    part = _star_part(big, small, nxt, num_parts)
    return pa.table({"big": pa.array(big, pa.int64()),
                     "small": pa.array(small, pa.int64()),
                     "part": pa.array(part, pa.int64())})


def _star_part(big: np.ndarray, small: np.ndarray, phase: str,
               num_parts: int) -> np.ndarray:
    """Coarse partition id for the NEXT phase's scan endpoint: the
    large-star scan groups by BOTH endpoints (each edge explodes into
    two directed rows — partition by each row's own u), the small-star
    scan groups by the larger endpoint only."""
    mixed = _mix64(big.astype(np.uint64))
    return (mixed % np.uint64(num_parts)).astype(np.int64)


def connected_components(pairs, *, num_parts: int | None = None,
                         max_rounds: int = 32):
    """Duplicate-group labels from a near-dup pair Dataset: each doc
    in a pair gets ``group_id`` = the smallest doc_id in its connected
    component (the canonical representative — "keep group_id, drop the
    rest" is the dedup policy downstream).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SOCC 2014 — public
    paper), the shuffle-native CC formulation: each half-round is ONE
    groupby-shaped exchange of the edge set (coarse hash partitions,
    vectorized numpy scans per partition — no per-group Python, same
    pattern as the LSH bucket scan), and the edge set contracts toward
    star graphs in O(log n) rounds (near-dup clusters: 2-3 rounds).
    Per-round materialization is required by the fixpoint test and
    bounds re-execution; the materialized set shrinks monotonically
    in round count and holds 2 int64s + a tag per edge.

    doc_ids must fit in uint32 (packed-pair dedup), like
    near_dup_pairs_minhash. Returns a Dataset (doc_id, group_id)
    covering every doc that appears in ≥1 pair, group roots included
    (root rows have doc_id == group_id)."""
    if num_parts is None:
        from bento_ray.util import cluster_cpus

        num_parts = max(4, cluster_cpus())
    P = num_parts

    def _seed(t: pa.Table) -> pa.Table:
        # canonical orientation: doc_a < doc_b → (big, small) =
        # (doc_b, doc_a); seed phase is large-star
        a = t.column("doc_a").to_numpy().astype(np.int64)
        b = t.column("doc_b").to_numpy().astype(np.int64)
        big, small = np.maximum(a, b), np.minimum(a, b)
        part = _star_part(big, small, "large", P)
        return pa.table({"big": pa.array(big, pa.int64()),
                         "small": pa.array(small, pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def _explode_large(t: pa.Table) -> pa.Table:
        # large-star scans both directions of every edge
        big = t.column("big").to_numpy()
        small = t.column("small").to_numpy()
        u = np.concatenate([big, small])
        v = np.concatenate([small, big])
        mixed = _mix64(u.astype(np.uint64))
        part = (mixed % np.uint64(P)).astype(np.int64)
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def _orient_small(t: pa.Table) -> pa.Table:
        return pa.table({"u": t.column("big"), "v": t.column("small"),
                         "part": t.column("part")})

    edges = pairs.map_batches(_seed, batch_format="pyarrow").materialize()
    prev_sig = None
    for _ in range(max_rounds):
        # large-star half-round
        exploded = edges.map_batches(_explode_large,
                                     batch_format="pyarrow")
        edges = exploded.groupby("part").map_groups(
            lambda g: _star_scan(g, "large", P), batch_format="pyarrow")
        # small-star half-round (edges already oriented big > small)
        edges = edges.map_batches(_orient_small, batch_format="pyarrow") \
            .groupby("part").map_groups(
                lambda g: _star_scan(g, "small", P),
                batch_format="pyarrow").materialize()
        # fixpoint signature: edge count + two independent hash sums
        # (collision-safe enough; the algorithm's fixpoint is a star
        # forest, at which point both phases are identities). Partial
        # per-batch sums mod 2^64 combine on the driver — one tiny row
        # per block, never a column-wide int64 Sum (which overflows
        # Arrow's int64 on >2^2 large hash values).
        def _sig_partial(t: pa.Table) -> pa.Table:
            big = t.column("big").to_numpy().astype(np.uint64)
            small = t.column("small").to_numpy().astype(np.uint64)
            packed = (big << np.uint64(32)) | small
            h1 = _mix64(packed)
            h2 = _mix64(packed ^ np.uint64(0x9E3779B97F4A7C15))
            with np.errstate(over="ignore"):
                s1, s2 = np.sum(h1, dtype=np.uint64), np.sum(
                    h2, dtype=np.uint64)
            return pa.table({"n": pa.array([len(t)], pa.int64()),
                             "h1": pa.array([int(s1)], pa.uint64()),
                             "h2": pa.array([int(s2)], pa.uint64())})

        parts = edges.map_batches(_sig_partial,
                                  batch_format="pyarrow").take_all()
        M = 1 << 64
        sig = (sum(p["n"] for p in parts),
               sum(p["h1"] for p in parts) % M,
               sum(p["h2"] for p in parts) % M)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError("connected_components did not converge "
                           f"in {max_rounds} rounds")

    def _labels(t: pa.Table) -> pa.Table:
        big = t.column("big").to_numpy()
        small = t.column("small").to_numpy()
        return pa.table({
            "doc_id": pa.array(np.concatenate([big, small]), pa.int64()),
            "group_id": pa.array(np.concatenate([small, small]),
                                 pa.int64())})

    # one final exchange dedups the (root, root) self-labels and any
    # doc reached from several stars (labels agree at fixpoint; min is
    # a no-op safety)
    return edges.map_batches(_labels, batch_format="pyarrow") \
        .groupby("doc_id").min("group_id").map_batches(
            lambda t: t.rename_columns(["doc_id", "group_id"]),
            batch_format="pyarrow")


def dedup_by_groups(docs, labels, *, id_col: str = "doc_id"):
    """Apply duplicate-group labels to the corpus: keep every doc that
    is NOT a non-representative group member (i.e. drop rows whose
    label says doc_id != group_id). The labels side is pair-member
    docs only — orders of magnitude smaller than the corpus on real
    near-dup rates — so it broadcasts once via ray.put and each batch
    filters with one vectorized isin; swap in shuffle_join for corpora
    whose duplicate set itself exceeds worker RAM."""
    import ray

    def _drop_set(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        grp = t.column("group_id").to_numpy()
        return pa.table({"drop_id": pa.array(ids[ids != grp],
                                             pa.int64())})

    drop_tbl = labels.map_batches(_drop_set, batch_format="pyarrow")
    drops = np.sort(np.concatenate(
        [b.column("drop_id").to_numpy() for b in
         drop_tbl.iter_batches(batch_format="pyarrow")] or
        [np.empty(0, np.int64)]))
    drops_ref = ray.put(drops)

    def _filter(t: pa.Table) -> pa.Table:
        d = ray.get(drops_ref)
        if len(d) == 0:
            return t
        ids = t.column(id_col).to_numpy()
        keep = d[np.clip(np.searchsorted(d, ids), 0, len(d) - 1)] != ids
        return t.filter(pa.array(keep))

    return docs.map_batches(_filter, batch_format="pyarrow")


def incremental_dedup(new_docs, snapshot, *, key_col: str = "text",
                      id_col: str = "doc_id"):
    """Dedup a NEW corpus increment against a PRIOR snapshot — the
    incremental-crawl step (CC monthly snapshots, news refeeds): a new
    document whose content already exists in the prior corpus is
    dropped, everything else passes through unchanged.

    Shape: the snapshot side reduces to a PAIR of independent content
    hashes per doc — 61-bit FNV + 64-bit siphash (``stable_hash``),
    ~125 collision bits total, so hash-equality is content-equality
    for any realistic corpus (expected birthday collisions at 10^10
    docs ≈ 10^-18 vs ~20 with a single 61-bit key, which silently
    DROPPED unique documents) — deduped with a per-block ``np.unique``
    combiner (two bounded columns cross the wire, never snapshot
    text), collected into one lexicographically-sorted pair array and
    broadcast once via ``ray.put``; the increment side then filters
    with one vectorized ``searchsorted`` per batch. The broadcast is
    16 B/distinct-snapshot-doc — ~160 GB at 10^10 docs, so beyond
    worker RAM swap the exact set for the Bloom partials in
    ``_build_pair_bloom`` (same OR-merge broadcast; false positives
    then need a confirm join, mirroring the minhash verify pass)."""
    import ray

    from bento_ray.textops.quality import word_hashes
    from bento_ray.util import stable_hash

    def _pair(col) -> tuple[np.ndarray, np.ndarray]:
        return (word_hashes(col).astype(np.uint64),
                stable_hash(col).astype(np.uint64))

    def _keys(t: pa.Table) -> pa.Table:
        h1, h2 = _pair(t.column(key_col))
        u = np.unique(np.rec.fromarrays([h1, h2]))
        return pa.table({"h1": pa.array(u["f0"].astype(np.int64)),
                         "h2": pa.array(u["f1"].astype(np.int64))})

    key_tbl = snapshot.map_batches(_keys, batch_format="pyarrow")
    p1, p2 = [], []
    for b in key_tbl.iter_batches(batch_format="pyarrow"):
        p1.append(b.column("h1").to_numpy().astype(np.uint64))
        p2.append(b.column("h2").to_numpy().astype(np.uint64))
    k1 = np.concatenate(p1) if p1 else np.empty(0, np.uint64)
    k2 = np.concatenate(p2) if p2 else np.empty(0, np.uint64)
    order = np.lexsort((k2, k1))
    keys_ref = ray.put((k1[order], k2[order]))

    def _filter(t: pa.Table) -> pa.Table:
        k1, k2 = ray.get(keys_ref)
        if len(k1) == 0:
            return t
        h1, h2 = _pair(t.column(key_col))
        # h1 is ~unique at 61 bits, so a single probe into the
        # (h1, h2)-sorted pairs suffices: scan the h1-equal range
        # (length 1 except at h1 collisions) for an h2 match
        lo = np.searchsorted(k1, h1, side="left")
        hi = np.searchsorted(k1, h1, side="right")
        hit = np.zeros(len(h1), bool)
        simple = hi - lo <= 1
        pos = np.clip(lo, 0, len(k1) - 1)
        hit[simple] = ((k1[pos] == h1) & (k2[pos] == h2))[simple]
        for i in np.flatnonzero(~simple):
            hit[i] = bool(np.any(k2[lo[i]:hi[i]] == h2[i]))
        return t.filter(pa.array(~hit))

    return new_docs.map_batches(_filter, batch_format="pyarrow")


# -- paragraph-level exact dedup (RefinedWeb/CCNet-style) -------------------

_PARA_BASE = np.uint64(1000003)
_PARA_MOD = np.uint64((1 << 61) - 1)
_PARA_IDX_BITS = 21  # paragraphs per doc packed below doc_id in int64


def _para_layout(lens: np.ndarray, w: int):
    """Per-doc paragraph layout from word counts: paragraphs are
    consecutive ``w``-word chunks (last chunk short). Returns (paras
    per doc, flat start offset of each para into the flat word array,
    para word counts, para doc row, para index within its doc)."""
    npara = -(-lens // w)
    doc_off = np.concatenate([[0], np.cumsum(lens)])[:-1]
    total = int(npara.sum())
    pdoc = np.repeat(np.arange(len(lens)), npara)
    pbase = np.concatenate([[0], np.cumsum(npara)])[:-1]
    plocal = np.arange(total) - np.repeat(pbase, npara)
    pstart = doc_off[pdoc] + plocal * w
    plen = np.minimum(lens[pdoc] - plocal * w, w)
    return npara, pstart, plen, pdoc, plocal


def _para_hashes(wh: np.ndarray, pstart: np.ndarray, plen: np.ndarray,
                 w: int) -> np.ndarray:
    """61-bit polynomial fold of the word FNV hashes per paragraph —
    w masked vector passes, no per-paragraph Python."""
    h = np.zeros(len(pstart), np.uint64)
    for j in range(w):
        m = plen > j
        if not m.any():
            break
        h[m] = (h[m] * _PARA_BASE + wh[pstart[m] + j]) % _PARA_MOD
    return h


def paragraph_dedup(ds, *, words_per_para: int = 10, col: str = "text",
                    id_col: str = "doc_id", keep_cols=()):
    """Corpus-wide paragraph-level exact dedup (the RefinedWeb /
    CCNet boilerplate step at paragraph granularity): every paragraph
    that appears more than once keeps only its FIRST instance (min
    (doc_id, para_idx)); documents are rebuilt from their surviving
    paragraphs. Paragraphs here are consecutive ``words_per_para``-word
    chunks — corpora with real structure pass paragraph-split text.

    Two passes, both bounded:
    1. paragraphs move as 61-bit hashes only: per-batch (hash → count,
       min packed-position) Arrow partials → one groupby — the
       exchange carries ≤ one row per distinct para per block, never
       text. Hashes seen >1× (the duplicated subset — tiny on real
       corpora) come back to the driver and broadcast via ray.put.
    2. a stateless map recomputes each batch's para hashes and drops
       non-winner duplicate instances; clean text is rebuilt with
       Arrow list offsets + binary_join (no per-doc Python strings).
    Swap the broadcast for a shuffle join if a corpus' duplicated-
    paragraph set outgrows worker RAM (same swap as dedup_by_groups).

    Returns (id_col, n_paras, n_kept, clean_text)."""
    import ray
    from ray.data.aggregate import Min as AMin
    from ray.data.aggregate import Sum as ASum

    from bento_ray.textops.quality import word_hashes
    from bento_ray.textops.terms import _split_words

    w = int(words_per_para)

    def _paras(t: pa.Table):
        flat, lens = _split_words(t.column(col))
        wh = word_hashes(flat)
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        npara, pstart, plen, pdoc, plocal = _para_layout(lens, w)
        if plocal.size and plocal.max() >= (1 << _PARA_IDX_BITS):
            raise ValueError("document exceeds packed paragraph-index "
                             "capacity; raise _PARA_IDX_BITS")
        h = _para_hashes(wh, pstart, plen, w)
        pack = (ids[pdoc] << _PARA_IDX_BITS) | plocal
        return flat, lens, ids, npara, pstart, plen, pdoc, plocal, h, pack

    def _partial(t: pa.Table) -> pa.Table:
        *_, h, pack = _paras(t)
        agg = (pa.table({"h": pa.array(h.astype(np.int64)),
                         "pack": pa.array(pack)})
               .group_by("h")
               .aggregate([("pack", "count"), ("pack", "min")]))
        return pa.table({"h": agg.column("h"),
                         "n": agg.column("pack_count").cast(pa.int64()),
                         "winner": agg.column("pack_min")})

    dup_tbl = (ds.map_batches(_partial, batch_format="pyarrow")
               .groupby("h").aggregate(ASum("n", alias_name="n"),
                                       AMin("winner", alias_name="winner")))
    hs, ws = [np.empty(0, np.int64)], [np.empty(0, np.int64)]
    for b in dup_tbl.iter_batches(batch_format="pyarrow"):
        m = pc.greater(b.column("n"), 1)
        bb = b.filter(m)
        hs.append(bb.column("h").to_numpy())
        ws.append(bb.column("winner").to_numpy())
    dh = np.concatenate(hs)
    dw = np.concatenate(ws)
    order = np.argsort(dh)
    dup_ref = ray.put((dh[order], dw[order]))

    def _apply(t: pa.Table) -> pa.Table:
        dh_s, dw_s = ray.get(dup_ref)
        flat, lens, ids, npara, pstart, plen, pdoc, plocal, h, pack = \
            _paras(t)
        keep = np.ones(len(h), bool)
        if len(dh_s):
            hi = h.astype(np.int64)
            pos = np.clip(np.searchsorted(dh_s, hi), 0, len(dh_s) - 1)
            is_dup = dh_s[pos] == hi
            keep[is_dup] = pack[is_dup] == dw_s[pos[is_dup]]
        # word-level mask via each word's global paragraph number
        pbase = np.concatenate([[0], np.cumsum(npara)])[:-1]
        doc_of_word = np.repeat(np.arange(len(lens)), lens)
        pos_in_doc = np.arange(int(lens.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)])[:-1], lens)
        word_para = pbase[doc_of_word] + pos_in_doc // w
        keep_word = keep[word_para] if len(h) else np.zeros(0, bool)
        kept_words = flat.filter(pa.array(keep_word)) if len(keep_word) \
            else flat
        kept_per_doc = np.bincount(doc_of_word[keep_word],
                                   minlength=len(lens)).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(kept_per_doc)])
        clean = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     kept_words.combine_chunks()
                                     if isinstance(kept_words,
                                                   pa.ChunkedArray)
                                     else kept_words), " ")
        n_kept = np.bincount(pdoc[keep], minlength=len(lens)) \
            .astype(np.int64)
        cols = {
            id_col: pa.array(ids),
            "n_paras": pa.array(npara.astype(np.int64)),
            "n_kept": pa.array(n_kept),
            "clean_text": clean,
        }
        for c in keep_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    return ds.map_batches(_apply, batch_format="pyarrow")


# -- SimHash near-dup pairs (banded LSH + exact Hamming verify) -------------

def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    x = x.astype(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)) \
        .astype(np.int64)


def simhash_near_dups(ds, *, max_hamming: int = 3,
                      concurrency: int | None = None,
                      num_parts: int | None = None):
    """SimHash near-duplicate pairs: 4×16-bit band LSH over the 64-bit
    fingerprint, exact Hamming verify. Pigeonhole recall guarantee:
    hamming ≤ 3 < 4 bands ⇒ at least one band matches exactly, so no
    true pair at the default threshold is missed — unlike MinHash LSH
    this stage is EXACT at max_hamming ≤ 3.

    Same distributed plan as the MinHash path (its scan/dedup
    helpers are reused verbatim): band rows → coarse-partition
    vectorized bucket scans → hash-partitioned pair dedup → two
    shuffle joins attach the 8-byte fingerprints → vectorized popcount
    filter. Returns (doc_a, doc_b, hamming), doc_a < doc_b."""
    from bento_ray.stages.join import shuffle_join
    from bento_ray.util import stable_hash

    if num_parts is None:
        from bento_ray.util import cluster_cpus
        num_parts = max(4, cluster_cpus())
    P = num_parts

    sims = simhash64(ds, concurrency) \
        .map_batches(lambda t: t.select(["doc_id", "simhash"]),
                     batch_format="pyarrow").materialize()

    def _explode(t: pa.Table) -> pa.Table:
        h = t.column("simhash").to_numpy().astype(np.uint64)
        ids = t.column("doc_id").to_numpy()
        band_id = np.tile(np.arange(4, dtype=np.int64), len(h))
        hh = np.repeat(h, 4)
        band = (hh >> (band_id.astype(np.uint64) * np.uint64(16))) \
            & np.uint64(0xFFFF)
        return pa.table({
            "band_id": pa.array(band_id),
            "band_hash": pa.array(band, pa.uint64()),
            "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
        })

    def _bucket_part(t: pa.Table) -> pa.Table:
        h = (stable_hash(pd.Series(
            t.column("band_id").to_numpy() * 1_000_003
            + t.column("band_hash").to_numpy().astype(np.int64)))
            % np.uint64(P))
        return t.append_column("bucket_part",
                               pa.array(h.astype(np.int64), pa.int64()))

    pairs = (sims.map_batches(_explode, batch_format="pyarrow")
             .map_batches(_bucket_part, batch_format="pyarrow")
             .groupby("bucket_part")
             .map_groups(lambda t: _pair_partition_scan(
                 t.drop_columns(["bucket_part"]), P),
                 batch_format="pyarrow")
             .groupby("pair_part")
             .map_groups(lambda t: _unique_pairs_partition(
                 t.drop_columns(["pair_part"])), batch_format="pyarrow")
             ).materialize()


    sh_a = sims.map_batches(_ren("doc_id", "doc_a"),
                            batch_format="pyarrow").materialize()
    sh_b = sims.map_batches(_ren("doc_id", "doc_b"),
                            batch_format="pyarrow").materialize()
    j = shuffle_join(pairs, sh_a, on="doc_a", how="inner",
                     force_fallback=True)
    j = shuffle_join(j.materialize(), sh_b, on="doc_b", how="inner",
                     force_fallback=True, suffix="_b")

    def _verify(t: pa.Table) -> pa.Table:
        ha = t.column("simhash").to_numpy().astype(np.uint64)
        hb = t.column("simhash_b").to_numpy().astype(np.uint64)
        ham = _popcount64(ha ^ hb)
        keep = ham <= max_hamming
        out = pa.table({
            "doc_a": t.column("doc_a"),
            "doc_b": t.column("doc_b"),
            "hamming": pa.array(ham, pa.int64()),
        })
        return out.filter(pa.array(keep))

    return j.map_batches(_verify, batch_format="pyarrow")
