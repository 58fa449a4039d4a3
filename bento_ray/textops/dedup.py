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

from bento_ray.util import default_concurrency as _dc


def _conc(c):
    return c if c is not None else _dc()

from bento_ray.textops.quality import hash_word

_MERS = (1 << 61) - 1


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of word k-shingles (k consecutive words)."""
    words = text.split()
    if len(words) < k:
        return np.array([hash_word(" ".join(words))] if words else [], np.uint64)
    hs = np.array([hash_word(w) for w in words], np.uint64)
    # polynomial combine of k consecutive word hashes
    out = np.zeros(len(hs) - k + 1, np.uint64)
    for j in range(k):
        out = (out * np.uint64(1_000_003) + hs[j:len(hs) - k + 1 + j]) \
            % np.uint64(_MERS)
    return np.unique(out)


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
        sigs = [self.signature(s or "") for s in t.column("text").to_pylist()]
        arr = pa.array([s.astype(np.int64).tolist() for s in sigs],
                       pa.list_(pa.int64()))
        return t.append_column("minhash", arr)


def minhash_signatures(ds, num_perm: int = 64, shingle_k: int = 3,
                       seed: int = 42, concurrency: int | None = None):
    return ds.map_batches(MinHasher, fn_constructor_args=(num_perm, shingle_k, seed),
                          batch_format="pyarrow",
                          concurrency=_conc(concurrency))


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
        ids, band_ids, band_hashes = [], [], []
        id_col = t.column("doc_id").to_pylist()
        for did, s in zip(id_col, t.column("text").to_pylist()):
            sh = _shingle_hashes(s or "", self.hasher.k)
            if len(sh) == 0:
                continue
            vals = (sh[None, :] * self.hasher.a[:, None]
                    + self.hasher.b[:, None]) % np.uint64(_MERS)
            sig = vals.min(axis=1)
            for b in range(self.bands):
                seg = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                bh = int(pd.util.hash_array(seg.astype(np.uint64))
                         .astype(np.uint64).sum() % (1 << 62))
                ids.append(did)
                band_ids.append(b)
                band_hashes.append(bh)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
        })


class _ShingleSets:
    def __init__(self, shingle_k):
        self.k = shingle_k

    def __call__(self, t: pa.Table) -> pa.Table:
        sets = [
            _shingle_hashes(s or "", self.k).astype(np.int64).tolist()
            for s in t.column("text").to_pylist()
        ]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "shingles": pa.array(sets, pa.list_(pa.int64())),
        })


def near_dup_pairs_minhash(ds, *, num_perm: int = 64, bands: int = 16,
                           shingle_k: int = 3, threshold: float = 0.5,
                           seed: int = 42, concurrency: int | None = None):
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Shape: signatures per batch → explode to tiny (band, hash, doc_id)
    rows → ONE groupby shuffle brings candidates together → per-bucket
    candidate pairs, deduped across bands → verify exact Jaccard against
    a broadcast {doc_id → shingle set} map built in one pass over the
    docs. At corpus sizes where the shingle map outgrows the object
    store, replace the broadcast with a bucketed pair-join on doc_id —
    the LSH + shuffle skeleton is unchanged.

    Returns a Dataset of (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard ≥ threshold."""
    exploded = ds.map_batches(
        _BandExploder, fn_constructor_args=(num_perm, bands, shingle_k, seed),
        batch_format="pyarrow", concurrency=_conc(concurrency))

    # Band rows are metadata (20 bytes each); buckets are overwhelmingly
    # singletons, so a per-group callback (groupby().map_groups) costs
    # ~one Python call per DOC-BAND — measured 20s+ on 80k rows. Collect
    # the band rows and find co-bucketed docs with one vectorized sort +
    # boundary scan instead. (At 10^12 docs keep the same logic inside a
    # distributed sort: sort by (band_id, band_hash), emit pairs per
    # sorted block, resolve the rare block-boundary buckets after.)
    bdf = exploded.to_pandas()
    bdf = bdf.sort_values(["band_id", "band_hash", "doc_id"], kind="stable")
    bid = bdf["band_id"].to_numpy()
    bh = bdf["band_hash"].to_numpy()
    docs = bdf["doc_id"].to_numpy()
    # bucket boundaries via vectorized neighbor comparison
    if len(bid):
        brk = np.flatnonzero((bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])) + 1
        bounds = np.concatenate([[0], brk, [len(bid)]])
    else:
        bounds = np.array([0, 0])
    out_pairs: set[tuple[int, int]] = set()
    for start, end in zip(bounds[:-1], bounds[1:]):
        if end - start > 1:
            bucket = np.unique(docs[start:end])
            for x in range(len(bucket)):
                for y in range(x + 1, len(bucket)):
                    out_pairs.add((int(bucket[x]), int(bucket[y])))
    pdf = pd.DataFrame(sorted(out_pairs), columns=["doc_a", "doc_b"])
    sh_tbl = ds.map_batches(_ShingleSets, fn_constructor_args=(shingle_k,),
                            batch_format="pyarrow",
                            concurrency=_conc(concurrency)).to_pandas()
    sh = {int(d): frozenset(s) for d, s in
          zip(sh_tbl["doc_id"], sh_tbl["shingles"])}
    out = []
    for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
        sa, sb = sh.get(a), sh.get(b)
        if not sa or not sb:
            continue
        jac = len(sa & sb) / len(sa | sb)
        if jac >= threshold:
            out.append((int(a), int(b), round(jac, 6)))
    out.sort()
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"})


class SimHasher:
    """64-bit SimHash over word hashes (unit weights): bit b of the
    fingerprint is the sign of the sum of ±1 contributions."""

    def __init__(self):
        pass

    def fingerprint(self, text: str) -> int:
        words = (text or "").split()
        if not words:
            return 0
        hs = np.array([hash_word(w) & 0xFFFFFFFFFFFFFFFF for w in words],
                      np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        fp = np.uint64(0)
        for b in np.flatnonzero(acc > 0):
            fp |= np.uint64(1) << np.uint64(b)
        return int(fp)

    def __call__(self, t: pa.Table) -> pa.Table:
        fps = [self.fingerprint(s) for s in t.column("text").to_pylist()]
        # store as int64 (reinterpret) for parquet friendliness
        vals = np.array(fps, np.uint64).astype(np.int64)
        return t.append_column("simhash", pa.array(vals, pa.int64()))


def simhash64(ds, concurrency: int | None = None):
    return ds.map_batches(SimHasher, batch_format="pyarrow",
                          concurrency=_conc(concurrency))
