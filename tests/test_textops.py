"""Training-data operators: dedup (exact/minhash/simhash), similarity
search, quality/langid/fingerprint stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


@pytest.fixture(scope="module")
def doc_ds():
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",  # exact dup
        "the quick brown fox jumps over the lazy dog once more today",  # near dup
        "completely different content about ray data pipelines at scale",
        "der schnelle braune fuchs springt und der hund ist faul",
        "le renard brun rapide saute et le chien est paresseux",
    ]
    return rd.from_items([
        {"doc_id": i, "text": t} for i, t in enumerate(texts)])


def test_exact_dedup_keeps_lowest_id(doc_ds):
    from bento_ray.stages.dedupe import dedupe_exact

    out = dedupe_exact(doc_ds, ["text"], keep="first",
                       order_cols=["doc_id"]).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2, 3, 4, 5]


def test_minhash_finds_exact_and_near_dups(doc_ds):
    from bento_ray.textops import near_dup_pairs_minhash

    pairs = near_dup_pairs_minhash(doc_ds, threshold=0.3).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 1) in got  # exact duplicate: jaccard 1.0
    row = pairs[(pairs["doc_a"] == 0) & (pairs["doc_b"] == 1)]
    assert float(row["jaccard"].iloc[0]) == 1.0
    # the unrelated docs never pair up
    assert not any({a, b} & {3} and {a, b} & {0, 1, 2} for a, b in got)


def test_minhash_deterministic(doc_ds):
    from bento_ray.textops import near_dup_pairs_minhash

    p1 = near_dup_pairs_minhash(doc_ds, threshold=0.3).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    p2 = near_dup_pairs_minhash(doc_ds, threshold=0.3).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(p1, p2)


def test_simhash_similar_docs_close(doc_ds):
    from bento_ray.textops import simhash64

    out = simhash64(doc_ds).to_pandas().set_index("doc_id")["simhash"]
    h = {i: np.uint64(out[i]).astype(np.uint64) for i in out.index}
    def ham(a, b):
        return bin(int(h[a]) ^ int(h[b])).count("1")
    assert ham(0, 1) == 0               # identical text
    assert ham(0, 2) < ham(0, 3)        # near dup closer than unrelated


def test_cosine_topk_matches_numpy_bruteforce():
    from bento_ray.textops import cosine_topk

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    ds = rd.from_items([
        {"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)])
    qm = vecs[:3].astype(np.float64)
    out = cosine_topk(ds, qm, [0, 1, 2], k=5).to_pandas()

    vm = vecs.astype(np.float64)
    vm = vm / np.linalg.norm(vm, axis=1, keepdims=True)
    for q in range(3):
        scores = vm @ vm[q]
        scores[q] = -np.inf
        want = np.argsort(-scores, kind="stable")[:5].tolist()
        got = (out[out["query_id"] == q].sort_values("rank")["vec_id"]
               .tolist())
        assert got == want, f"query {q}: {got} != {want}"


def test_lsh_topk_recall_vs_bruteforce():
    from bento_ray.textops import cosine_topk, lsh_cosine_topk

    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((500, 16)).astype(np.float32)
    ds = rd.from_items([
        {"vec_id": i, "embedding": vecs[i].tolist()} for i in range(500)])
    qm = vecs[:5].astype(np.float64)
    brute = cosine_topk(ds, qm, list(range(5)), k=10).to_pandas()
    approx = lsh_cosine_topk(ds, qm, list(range(5)), k=10,
                             num_planes=3).to_pandas()
    # every query got candidates and recall is nontrivial: 3 planes ⇒
    # each query probes ~1/8 of the space, but hyperplane buckets are
    # correlated with cosine proximity so recall beats random (0.125)
    recalls = []
    for q in range(5):
        b = set(brute[brute["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.15


def test_quality_and_langid_stages(doc_ds):
    from bento_ray.textops import lang_id_stage, quality_stage

    q = quality_stage(doc_ds).to_pandas()
    assert (q["quality_score"] >= 0).all() and (q["quality_score"] <= 1).all()
    # English doc with many stopwords scores a high stop_ratio
    assert q.loc[q["doc_id"] == 0, "stop_ratio"].iloc[0] > 0.2

    lid = lang_id_stage(doc_ds).to_pandas().set_index("doc_id")
    assert lid.loc[0, "pred_lang"] == "en"
    assert lid.loc[4, "pred_lang"] == "de"
    assert lid.loc[5, "pred_lang"] == "fr"


def test_fingerprint_stable_and_discriminative(doc_ds):
    from bento_ray.textops import fingerprint_stage

    fp = fingerprint_stage(doc_ds).to_pandas().set_index("doc_id")
    assert fp.loc[0, "fingerprint"] == fp.loc[1, "fingerprint"]  # same text
    assert fp.loc[0, "fingerprint"] != fp.loc[3, "fingerprint"]


def test_minhash_vs_brute_force_golden(doc_ds):
    """Correctness gate (VERDICT r1): precision is exact (every emitted
    pair's true Jaccard ≥ threshold — verified brute force here), and
    recall over the sf-small corpus is pinned."""
    from bento_ray.textops import near_dup_pairs_minhash
    from bento_ray.textops.dedup import _shingle_hashes

    docs = doc_ds.to_pandas()
    sh = {int(r.doc_id): frozenset(
        _shingle_hashes(r.text or "", 3).tolist())
        for r in docs.itertuples()}
    thr = 0.3
    truth = set()
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sh[a], sh[b]
            if sa and sb and len(sa & sb) / len(sa | sb) >= thr:
                truth.add((a, b))

    got = near_dup_pairs_minhash(doc_ds, threshold=thr).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    # precision = 1.0 by construction (exact verify step)
    assert got_pairs <= truth, got_pairs - truth
    # jaccard values are exact
    for r in got.itertuples():
        sa, sb = sh[int(r.doc_a)], sh[int(r.doc_b)]
        # pipeline rounds jaccard to 6 decimals
        assert abs(r.jaccard - len(sa & sb) / len(sa | sb)) <= 5e-7
    # recall on this corpus with 16 bands / 64 perms: every true pair
    # at this threshold is found (near-dups here are strong)
    assert got_pairs == truth, truth - got_pairs


def test_pair_partition_scan_vectorized_matches_bruteforce():
    """The vectorized (loop-free) candidate-pair expansion emits
    exactly the per-bucket unordered doc pairs, including duplicate
    (bucket, doc) rows and singleton buckets, with the right
    pair-hash partition tag."""
    import itertools
    from collections import defaultdict

    import numpy as np
    import pyarrow as pa

    from bento_ray.textops.dedup import _pair_partition_scan

    rng = np.random.default_rng(0)
    n = 5000
    t = pa.table({
        "band_id": pa.array(rng.integers(0, 8, n), pa.int64()),
        "band_hash": pa.array(
            rng.integers(0, 300, n).astype(np.uint64), pa.uint64()),
        "doc_id": pa.array(rng.integers(0, 120, n), pa.int64()),
    })
    out = _pair_partition_scan(t, 7)
    got = list(zip(out.column("doc_a").to_pylist(),
                   out.column("doc_b").to_pylist()))
    buckets = defaultdict(set)
    for b, h, d in zip(t.column("band_id").to_pylist(),
                       t.column("band_hash").to_pylist(),
                       t.column("doc_id").to_pylist()):
        buckets[(b, h)].add(d)
    want = set()
    for docs in buckets.values():
        want.update(itertools.combinations(sorted(docs), 2))
    assert set(got) == want and len(got) == len(want)  # deduped
    for (a, b), p in zip(got, out.column("pair_part").to_pylist()):
        assert p == ((a << 32) | b) % 7

    # empty and all-singleton inputs
    empty = t.slice(0, 0)
    assert len(_pair_partition_scan(empty, 7)) == 0
    single = pa.table({"band_id": pa.array([0, 1], pa.int64()),
                       "band_hash": pa.array([1, 2], pa.uint64()),
                       "doc_id": pa.array([5, 6], pa.int64())})
    assert len(_pair_partition_scan(single, 7)) == 0


def test_minhash_no_driver_materialization():
    """No DRIVER-side materialization: the result is a Dataset and the
    only eager step is the shingle table pinned in the OBJECT STORE
    (shingling must not re-run per plan consumer); the r1
    implementation pulled candidate pairs into driver memory with
    .to_pandas() at build time."""
    import ray.data as rd

    from bento_ray.textops import near_dup_pairs_minhash

    ds = rd.from_items(
        [{"doc_id": i, "text": f"words w{i} w{i+1} common suffix here"}
         for i in range(50)])
    out = near_dup_pairs_minhash(ds, threshold=0.5)
    assert hasattr(out, "to_pandas") and not isinstance(out, pd.DataFrame)


GOLDEN_QUERIES = ["q_simhash", "q_lang_id", "q_doc_fingerprints",
                  "q_quality_scores", "q_minhash_near_dups", "q_ann_lsh",
                  "q_ann_ivf", "q_cosine_near_dups_lsh"]


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_no_oracle_queries_match_pinned_goldens(name):
    """The non-SQL-expressible queries are deterministic — their
    sf0.001 outputs are hash-pinned as parquet goldens (VERDICT r1
    item 10). Regenerate consciously with tools/make_goldens.py."""
    import os

    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from tools.make_goldens import GOLDEN_DIR, canon

    golden_path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    want = pq.read_table(golden_path).to_pandas()
    got = canon(entrymod.queries()[name]("/root/testdata/sf0.001"), name)
    pd.testing.assert_frame_equal(got, want)


def test_lsh_ann_recall_multiprobe_multitable(ray_session):
    """VERDICT r2 item 10: quantified recall@10 of the LSH ANN path vs
    the brute-force oracle on the sf0.01 embeddings (10 clusters,
    64-dim). Single-table single-probe LSH is structurally weak
    (~0.16); the 4-table 4-probe OR-construction must reach ≥ 0.8
    (measured 0.88) and clearly beat single-table."""
    import numpy as np

    import ray.data as rd
    from bento_ray.textops.similarity import cosine_topk, lsh_cosine_topk

    sf = "/root/testdata/sf0.01"
    rows = rd.read_parquet(f"{sf}/embeddings.parquet").take(10)
    qids = [r["vec_id"] for r in rows]
    qm = np.array([r["embedding"] for r in rows])

    def pairs(res):
        df = res.to_pandas()
        return {(int(a), int(b))
                for a, b in zip(df["query_id"], df["vec_id"])}

    def fresh():
        return rd.read_parquet(f"{sf}/embeddings.parquet")

    truth = pairs(cosine_topk(fresh(), qm, qids, k=10))
    single = pairs(lsh_cosine_topk(fresh(), qm, qids, k=10,
                                   num_planes=4))
    multi = pairs(lsh_cosine_topk(fresh(), qm, qids, k=10, num_planes=4,
                                  num_tables=4, num_probes=4))
    r_single = len(single & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    assert r_multi >= 0.8, (r_single, r_multi)
    assert r_multi >= r_single + 0.3, (r_single, r_multi)


def test_cosine_near_dups_exact_matches_numpy(ray_session):
    """Exact embedding-cosine near-dup pairs equal the O(N²) numpy
    upper-triangle scan — every pair emitted once, ordered a < b."""
    from bento_ray.textops import cosine_near_dups

    rng = np.random.RandomState(3)
    base = rng.standard_normal((300, 16)).astype(np.float32)
    planted = base[:20] + 0.1 * rng.standard_normal((20, 16)) \
        .astype(np.float32)
    vecs = np.vstack([base, planted])
    ds = rd.from_items([
        {"vec_id": i, "embedding": vecs[i].tolist()}
        for i in range(len(vecs))])
    out = cosine_near_dups(ds, 0.9).to_pandas()

    vm = vecs.astype(np.float64)
    vm /= np.linalg.norm(vm, axis=1, keepdims=True)
    S = vm @ vm.T
    ia, ib = np.triu_indices(len(vecs), 1)
    keep = S[ia, ib] >= 0.9
    want = sorted(zip(ia[keep].tolist(), ib[keep].tolist()))
    got = sorted(zip(out["id_a"], out["id_b"]))
    assert len(want) == 20 and got == want


def test_cosine_near_dups_lsh_planted_recall(ray_session):
    """The LSH scale path finds planted near-duplicates (cos ≥ 0.9)
    with recall ~1 at 8 tables × 8 planes, and NEVER emits a
    below-threshold pair (candidates are exact-verified in-bucket, so
    precision is 1.0 by construction)."""
    from bento_ray.textops import cosine_near_dups_lsh

    rng = np.random.RandomState(3)
    base = rng.standard_normal((300, 16)).astype(np.float32)
    planted = base[:20] + 0.1 * rng.standard_normal((20, 16)) \
        .astype(np.float32)
    vecs = np.vstack([base, planted])
    ds = rd.from_items([
        {"vec_id": i, "embedding": vecs[i].tolist()}
        for i in range(len(vecs))])
    out = cosine_near_dups_lsh(ds, 0.9, num_planes=8, num_tables=8,
                               dim=16).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))

    vm = vecs.astype(np.float64)
    vm /= np.linalg.norm(vm, axis=1, keepdims=True)
    S = vm @ vm.T
    ia, ib = np.triu_indices(len(vecs), 1)
    keep = S[ia, ib] >= 0.9
    want = set(zip(ia[keep].tolist(), ib[keep].tolist()))
    assert got <= want                       # precision 1.0
    assert len(got & want) / len(want) >= 0.9


def test_semdedup_far_rule_single_cell(ray_session):
    """SemDeDup priority rules on a hand-computable 1-cell corpus:
    ids 1/2 are a cos≈0.958 near-dup pair, ids 3/4 are identical.
    ``min_id`` keeps {1, 3}; ``far`` (the paper's
    farthest-from-centroid rule) keeps {2, 3} — id 2 has the LOWEST
    centroid similarity (0.650 vs id 1's 0.841), and the 3-vs-4 tie
    breaks to the smaller id."""
    from bento_ray.textops import semdedup

    items = [{"vec_id": 1, "embedding": [1.0, 0.3, 0.0]},
             {"vec_id": 2, "embedding": [1.0, 0.0, 0.0]},
             {"vec_id": 3, "embedding": [0.0, 1.0, 0.0]},
             {"vec_id": 4, "embedding": [0.0, 1.0, 0.0]}]
    kept_min = sorted(semdedup(rd.from_items(items), threshold=0.95,
                               num_cells=1, keep="min_id")
                      .to_pandas()["vec_id"])
    kept_far = sorted(semdedup(rd.from_items(items), threshold=0.95,
                               num_cells=1, keep="far")
                      .to_pandas()["vec_id"])
    assert kept_min == [1, 3]
    assert kept_far == [2, 3]


def test_semdedup_multicell_planted(ray_session):
    """Multi-cell SemDeDup: two well-separated clusters, each with
    planted EXACT duplicates. Identical vectors always share a cell,
    so exactly the min id of each duplicate group survives and every
    non-duplicate survives — regardless of which cell k-means carved
    for it. Also pins that the result is the union over cells (no
    cross-cell comparisons: a planted pair SPLIT across orthogonal
    clusters is never compared, which is the documented
    approximation)."""
    from bento_ray.textops import semdedup

    rng = np.random.RandomState(7)
    a = _normalize_rows(rng.standard_normal((40, 8)) + 6 * np.eye(8)[0])
    b = _normalize_rows(rng.standard_normal((40, 8)) - 6 * np.eye(8)[3])
    vecs = np.vstack([a, b, a[:5], b[:5]])        # dups get ids 80..89
    ds = rd.from_items([{"vec_id": i, "embedding": vecs[i].tolist()}
                        for i in range(len(vecs))])
    kept = sorted(semdedup(ds, threshold=0.999999, num_cells=2,
                           keep="min_id").to_pandas()["vec_id"])
    assert kept == list(range(80))


def _normalize_rows(m):
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def test_ivf_ann_recall_clustered_and_real(ray_session):
    """IVF coarse quantization is data-adaptive: on tightly clustered
    vectors a 2-of-16-cell probe already recovers ≥ 0.9 of true
    top-10 neighbors; on the loosely clustered sf0.01 embeddings
    recall grows monotonically with nprobe (measured 0.26 → 0.57 →
    0.71 for nprobe 1/4/8)."""
    from bento_ray.textops import cosine_topk, ivf_cosine_topk

    def pairs(res):
        df = res.to_pandas()
        return {(int(a), int(b))
                for a, b in zip(df["query_id"], df["vec_id"])}

    # tight synthetic clusters
    rng = np.random.RandomState(5)
    centers = rng.standard_normal((10, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, 60, axis=0) + \
        0.05 * rng.standard_normal((600, 16))
    items = [{"vec_id": i, "embedding": vecs[i].tolist()}
             for i in range(600)]
    qm = vecs[:5].astype(np.float64)
    qids = list(range(5))

    truth = pairs(cosine_topk(rd.from_items(items), qm, qids, k=10))
    approx = pairs(ivf_cosine_topk(rd.from_items(items), qm, qids, k=10,
                                   num_cells=16, nprobe=2,
                                   train_sample=600))
    assert len(approx & truth) / len(truth) >= 0.9

    # real embeddings: recall must grow with nprobe
    sf = "/root/testdata/sf0.01"
    rows = rd.read_parquet(f"{sf}/embeddings.parquet").take(10)
    rqids = [r["vec_id"] for r in rows]
    rqm = np.array([r["embedding"] for r in rows])

    def fresh():
        return rd.read_parquet(f"{sf}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    rtruth = pairs(cosine_topk(fresh(), rqm, rqids, k=10))
    r1 = len(pairs(ivf_cosine_topk(fresh(), rqm, rqids, k=10,
                                   num_cells=16, nprobe=1)) & rtruth) \
        / len(rtruth)
    r8 = len(pairs(ivf_cosine_topk(fresh(), rqm, rqids, k=10,
                                   num_cells=16, nprobe=8)) & rtruth) \
        / len(rtruth)
    assert r8 >= 0.6, (r1, r8)
    assert r8 >= r1 + 0.2, (r1, r8)


class TestRedactAndRepetition:
    def test_redact_batch_patterns_and_order(self):
        import pyarrow as pa

        from bento_ray.textops.redact import redact_batch

        texts = pa.array([
            "mail bob@corp.io now",
            "ssn 123-45-6789 tel 555-123-4567",
            "srv 192.168.0.1 and 10.0.0.255",
            "none here",
            "a@b.co x@y.org",           # two emails in one doc
        ])
        red, counts = redact_batch(texts)
        red = red.to_pylist()
        assert red[0] == "mail <EMAIL> now"
        # SSN matched before PHONE could mis-take it; both redacted
        assert red[1] == "ssn <SSN> tel <PHONE>"
        assert red[2] == "srv <IP> and <IP>"
        assert red[3] == "none here"
        assert red[4] == "<EMAIL> <EMAIL>"
        assert counts["EMAIL"].to_pylist() == [1, 0, 0, 0, 2]
        assert counts["SSN"].to_pylist() == [0, 1, 0, 0, 0]
        assert counts["PHONE"].to_pylist() == [0, 1, 0, 0, 0]
        assert counts["IP"].to_pylist() == [0, 0, 2, 0, 0]

    def test_redact_sql_parity_on_adversarial_strings(self):
        """The Arrow RE2 chain and the generated DuckDB chain must
        agree byte-for-byte, including on boundary-adjacent shapes."""
        import duckdb
        import pyarrow as pa

        from bento_ray.textops.redact import (
            pii_sql_counts,
            pii_sql_replace,
            redact_batch,
        )

        texts = [
            "a.b+c@d-e.museum tail",
            "999-99-99999 not an ssn (5-digit tail)",
            "555.123.4567 dotted phone",
            "1.2.3.4.5 five groups",
            "v1.2.3 semver is not an ip",
            "email@sub.domain.co, trailing comma",
            "123-45-6789x suffix letter",
        ]
        red, counts = redact_batch(pa.array(texts))
        con = duckdb.connect()
        counts_sql = ",".join(f"{e} AS {n}"
                              for n, e in pii_sql_counts("t").items())
        rows = con.execute(
            f"SELECT {pii_sql_replace('t')} AS r, {counts_sql} "
            "FROM (SELECT unnest(?) AS t)", [texts]).fetchall()
        for i, row in enumerate(rows):
            assert row[0] == red.to_pylist()[i], texts[i]
            assert row[1] == counts["EMAIL"].to_pylist()[i], texts[i]
            assert row[2] == counts["SSN"].to_pylist()[i], texts[i]
            assert row[3] == counts["PHONE"].to_pylist()[i], texts[i]
            assert row[4] == counts["IP"].to_pylist()[i], texts[i]

    def test_repetition_metrics_hand_check(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from bento_ray.textops import repetition_metrics

        t = pa.table({
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a b a c a",        # 5 words, a×3: top .6, dist .6, dup 3/5 chars
                "x y z",            # all unique
                "",                 # word-less
                "aa aa b",          # dup chars 4/5
            ],
        })
        out = repetition_metrics(rd.from_arrow(t)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out["top_word_frac"].tolist() == [0.6, 0.333333, 0.0, 0.666667]
        assert out["distinct_word_frac"].tolist() == [0.6, 1.0, 0.0, 0.666667]
        assert out["dup_word_char_frac"].tolist() == [0.6, 0.0, 0.0, 0.8]


class TestNormalizeText:
    def test_engine_agreement_on_repertoire(self):
        """Python unicodedata+lower and DuckDB utf8proc must agree on
        every repertoire string — the invariant the oracle rests on."""
        import duckdb

        from bento_ray.textops.normalize import (
            REPERTOIRE,
            normalize_scalar,
            normalize_sql_expr,
        )

        con = duckdb.connect()
        for s in REPERTOIRE:
            noisy = "  X\t" + s + " \n Y  "
            d = con.execute(
                f"select {normalize_sql_expr('?')}", [noisy]).fetchone()[0]
            assert d == normalize_scalar(noisy), repr(s)

    def test_normalize_stage(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from bento_ray.textops.normalize import normalize_text

        t = pa.table({"doc_id": [0, 1, 2], "text": [
            "CAFÉ   au  lait",   # decomposed E+accent, runs of spaces
            "\tStraße  Å ", # ß survives, A+ring composes to å
            "",
        ]})
        out = normalize_text(rd.from_arrow(t)).to_pandas() \
            .sort_values("doc_id")
        assert out["text"].tolist() == ["café au lait", "straße å", ""]
        # composed output: é is one codepoint
        assert "́" not in out["text"].iloc[0]

    def test_normalize_out_col(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from bento_ray.textops.normalize import normalize_text

        t = pa.table({"text": ["A  B"]})
        out = normalize_text(rd.from_arrow(t), out_col="norm").to_pandas()
        assert out["text"].tolist() == ["A  B"]
        assert out["norm"].tolist() == ["a b"]


def test_term_and_bigram_counts_edge_cases():
    """Empty docs, extra spaces, and single-word docs: empties are
    dropped, bigrams never cross doc boundaries."""
    import ray.data as rd

    from bento_ray.textops import bigram_counts, term_counts

    ds = rd.from_items([
        {"doc_id": 0, "text": "a b  a"},   # double space → empty token
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "c"},
        {"doc_id": 3, "text": "b a"},
    ])
    tc = term_counts(ds).to_pandas().set_index("word")["cnt"].to_dict()
    assert tc == {"a": 3, "b": 2, "c": 1}
    bc = bigram_counts(ds).to_pandas().set_index("bigram")["cnt"].to_dict()
    # "a b", "b a" (from doc0 after empty drop: a b a), "b a" (doc3);
    # no bigram may join doc2's "c" to doc3's "b"
    assert bc == {"a b": 1, "b a": 2}


def test_split_words_null_doc_plus_empty_token():
    """Regression: a batch with a null text AND an empty token used to
    miscount the last non-null doc (reduceat clipping merged its
    segment) and crash _doc_term_counts with unequal column lengths."""
    import numpy as np
    import pyarrow as pa

    from bento_ray.textops.terms import _split_words

    flat, lens = _split_words(pa.array(["a  b", None]))
    assert flat.to_pylist() == ["a", "b"]
    assert lens.tolist() == [2, 0]
    assert int(np.sum(lens)) == len(flat)

    # null doc in the middle, empty tokens across several docs
    flat, lens = _split_words(pa.array(["x ", None, " y  z", "", None]))
    assert flat.to_pylist() == ["x", "y", "z"]
    assert lens.tolist() == [1, 0, 2, 0, 0]


def test_tfidf_top_terms_small():
    import ray.data as rd

    from bento_ray.textops import tfidf_top_terms

    ds = rd.from_items([
        {"doc_id": 0, "text": "x x y common"},
        {"doc_id": 1, "text": "y z common"},
        {"doc_id": 2, "text": "common common"},
    ])
    out = tfidf_top_terms(ds, k=2).to_pandas() \
        .sort_values(["doc_id", "tfidf"], ascending=[True, False])
    d0 = out[out.doc_id == 0]
    # x: tf=2, df=1 → top; common: tf=1, df=3 → idf 0 → never above y
    assert list(d0["term"])[0] == "x"
    import numpy as np

    row = d0[d0.term == "x"].iloc[0]
    assert row["tfidf"] == round(2 * np.log(3 / 1), 6)
    d2 = out[out.doc_id == 2]
    # doc2 has one distinct term; ln(3/3)=0
    assert list(d2["term"]) == ["common"] and float(d2["tfidf"].iloc[0]) == 0.0


def test_hash_sample_deterministic_partition():
    """The 10 residue classes partition the corpus exactly and each
    class is identical across repeated runs."""
    import ray.data as rd

    from bento_ray.textops import hash_sample

    ds = rd.from_items([{"doc_id": i} for i in range(1000)])
    sizes = 0
    first = None
    for r in range(10):
        got = sorted(hash_sample(ds, 10, r).to_pandas()["doc_id"])
        sizes += len(got)
        if r == 3:
            first = got
    assert sizes == 1000
    again = sorted(hash_sample(ds, 10, 3).to_pandas()["doc_id"])
    assert again == first


def test_dup_ngram_stats_semantics():
    """Within-doc repeats alone don't count; cross-doc shared n-grams
    mark every instance in every doc; short docs report 0/0."""
    import ray.data as rd

    from bento_ray.textops import dup_ngram_stats

    shared = "alpha beta gamma"  # the shared trigram
    ds = rd.from_items([
        # doc0: shared trigram twice + own words → 2 dup instances
        {"doc_id": 0, "text": f"{shared} x {shared}"},
        # doc1: shared trigram once
        {"doc_id": 1, "text": f"pre {shared} post"},
        # doc2: repeats ITS OWN trigram twice — df=1, not dup
        {"doc_id": 2, "text": "p q r p q r"},
        # doc3: too short for a trigram
        {"doc_id": 3, "text": "one two"},
    ])
    out = dup_ngram_stats(ds, n=3).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0, "n_ngrams"] == 5 and out.loc[0, "n_dup_ngrams"] == 2
    assert out.loc[1, "n_ngrams"] == 3 and out.loc[1, "n_dup_ngrams"] == 1
    assert out.loc[2, "n_dup_ngrams"] == 0
    assert out.loc[3, "n_ngrams"] == 0 and out.loc[3, "dup_ngram_frac"] == 0.0
    assert out.loc[0, "dup_ngram_frac"] == 0.4


def test_stratified_sample_quota_and_determinism():
    import ray.data as rd

    from bento_ray.textops import stratified_sample

    ds = rd.from_items([
        {"doc_id": i, "lang": ["en", "de", "fr"][i % 3]}
        for i in range(300)])
    out = stratified_sample(ds, "lang", 5).to_pandas()
    assert out.groupby("lang").size().to_dict() == \
        {"en": 5, "de": 5, "fr": 5}
    again = stratified_sample(ds, "lang", 5).to_pandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])
    # a group smaller than the quota returns all its rows
    small = rd.from_items([{"doc_id": i, "lang": "xx"} for i in range(3)])
    assert stratified_sample(small, "lang", 5).count() == 3


# ---------------------------------------------------------------- CC

def test_connected_components_vs_union_find(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from bento_ray.textops import connected_components

    rng = np.random.default_rng(7)
    a = rng.integers(0, 600, 400)
    b = rng.integers(0, 600, 400)
    keep = a != b
    lo = np.minimum(a, b)[keep]
    hi = np.maximum(a, b)[keep]
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array(lo, pa.int64()),
        "doc_b": pa.array(hi, pa.int64())}))
    out = connected_components(pairs, num_parts=5).to_pandas()

    parent = list(range(600))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(lo, hi):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    nodes = set(map(int, lo)) | set(map(int, hi))
    roots: dict = {}
    for v in nodes:
        roots.setdefault(find(v), []).append(v)
    truth = {v: min(vs) for vs in roots.values() for v in vs}
    got = dict(zip(out["doc_id"], out["group_id"]))
    assert got == truth


def test_connected_components_long_chain(ray_session):
    """Worst-case diameter: a 200-node path must still converge to a
    single group labeled by its minimum."""
    import pyarrow as pa
    import ray.data as rd

    from bento_ray.textops import connected_components

    t = pa.table({"doc_a": pa.array(list(range(199)), pa.int64()),
                  "doc_b": pa.array(list(range(1, 200)), pa.int64())})
    out = connected_components(rd.from_arrow(t), num_parts=4).to_pandas()
    assert len(out) == 200
    assert (out["group_id"] == 0).all()


def test_length_quantiles_vs_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from bento_ray.textops.quality import length_quantiles

    rng = np.random.default_rng(3)
    langs = ["en", "de", "fr"]
    rows = []
    for i in range(500):
        lg = langs[int(rng.integers(0, 3))]
        n = int(rng.integers(0, 40))
        rows.append({"lang": lg, "text": " ".join(["w"] * n)})
    rows.append({"lang": "en", "text": None})  # null text → 0 words
    out = length_quantiles(
        rd.from_items(rows).repartition(4)).to_pandas()
    assert list(out["lang"]) == sorted(out["lang"])
    for lg in langs:
        counts = sorted(
            len((r["text"] or "").split()) for r in rows
            if r["lang"] == lg)
        n = len(counts)
        row = out[out["lang"] == lg].iloc[0]
        assert row["n_docs"] == n
        for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            rank = int(np.ceil(q * n))
            assert row[name] == counts[rank - 1], (lg, name)


def test_token_counts_bpe_ish(ray_session):
    import ray.data as rd

    from bento_ray.textops.quality import token_counts

    rows = [{"doc_id": 1, "text": "Hello, world! It's 2024..."},
            {"doc_id": 2, "text": None},
            {"doc_id": 3, "text": "don't we'll df['x']+=1;"}]
    out = token_counts(rd.from_items(rows)).to_pandas() \
        .set_index("doc_id")["n_tokens"]
    # Hello|,| world|!| It|'s| 2024|... = 8
    assert out[1] == 8
    assert out[2] == 0
    # don|'t| we|'ll| df|['|x|']+=|1|; = 10
    assert out[3] == 10


def test_dedup_by_groups_drops_non_representatives(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from bento_ray.textops.dedup import dedup_by_groups

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(10)), pa.int64()),
        "text": pa.array([f"d{i}" for i in range(10)])}))
    # groups: {1,4,7} root 1; {2,9} root 2; rest singletons
    labels = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 4, 7, 2, 9], pa.int64()),
        "group_id": pa.array([1, 1, 1, 2, 2], pa.int64())}))
    kept = sorted(r["doc_id"]
                  for r in dedup_by_groups(docs, labels).take_all())
    assert kept == [0, 1, 2, 3, 5, 6, 8]


def test_dedup_by_groups_no_labels_keeps_all(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from bento_ray.textops.dedup import dedup_by_groups

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([5, 6], pa.int64()),
        "text": pa.array(["a", "b"])}))
    labels = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "group_id": pa.array([], pa.int64())}))
    assert dedup_by_groups(docs, labels).count() == 2


def test_decontaminate_scores(doc_ds):
    from bento_ray.textops import decontaminate

    # eval set = doc 0's text (12 words): docs 0 and 1 (its exact
    # dup) are fully contaminated; doc 3 shares no 4-gram.
    eval_ds = rd.from_items(
        [{"doc_id": 100,
          "text": "the quick brown fox jumps over the lazy dog "
                  "again and again"}])
    out = decontaminate(doc_ds, eval_ds, n=4).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0, "n_ngrams"] == 9  # 12 words → 9 4-grams
    assert out.loc[0, "overlap_frac"] == 1.0
    assert out.loc[1, "overlap_frac"] == 1.0
    assert out.loc[3, "n_overlap"] == 0
    assert out.loc[3, "overlap_frac"] == 0.0
    # near-dup doc 2 shares the leading 4-grams but not the tail
    assert 0.0 < out.loc[2, "overlap_frac"] < 1.0


def test_decontaminate_short_and_empty_docs():
    from bento_ray.textops import decontaminate

    ds = rd.from_items([
        {"doc_id": 0, "text": "too short"},          # < n words
        {"doc_id": 1, "text": ""},                   # no words
        {"doc_id": 2, "text": "one two three four"},  # exactly n
    ])
    ev = rd.from_items([{"doc_id": 9, "text": "one two three four"}])
    out = decontaminate(ds, ev, n=4).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(out["n_ngrams"]) == [0, 0, 1]
    assert list(out["n_overlap"]) == [0, 0, 1]
    assert list(out["overlap_frac"]) == [0.0, 0.0, 1.0]


def test_dsir_ranks_target_like_docs_first(ray_session):
    """DSIR separation: raw corpus is half vocab-A docs, half vocab-B
    docs; the target corpus speaks vocab A. Every A-doc must outweigh
    every B-doc, dsir_select(k=|A|) must return exactly the A ids,
    and n_feats counts unigram+bigram instances (2·w − 1 for a w-word
    doc)."""
    from bento_ray.textops import dsir_select, dsir_weights

    rng = np.random.RandomState(11)
    A = ["alpha", "bravo", "charlie", "delta", "echo"]
    B = ["zulu", "yankee", "xray", "whiskey", "victor"]

    def doc(vocab):
        return " ".join(rng.choice(vocab, 12))

    raw = [{"doc_id": i, "text": doc(A if i < 20 else B)}
           for i in range(40)]
    target = [{"doc_id": 100 + i, "text": doc(A)} for i in range(10)]
    ds, tds = rd.from_items(raw), rd.from_items(target)

    w = dsir_weights(ds, tds, n_buckets=997).to_pandas() \
        .set_index("doc_id").sort_index()
    assert (w["n_feats"] == 23).all()            # 12 uni + 11 bi
    assert w.loc[:19, "micro_weight"].min() > \
        w.loc[20:, "micro_weight"].max()

    sel = dsir_select(ds, tds, k=20, n_buckets=997).to_pandas()
    assert sorted(sel["doc_id"]) == list(range(20))
    assert len(sel) == 20


def test_dsir_empty_docs_and_ties(ray_session):
    """Zero-word docs score exactly 0 and still rank; identical docs
    get identical weights and break ties by doc_id. At this toy size
    Laplace smoothing (α·B ≫ counts) pushes every per-bucket log
    ratio negative — ln((c_t+1)/(N_t+B)) < ln((c_r+1)/(N_r+B)) when
    N_t < N_r even for target-only features — so the empty doc's 0
    legitimately ranks FIRST; the separation test above covers the
    corpus regime where target-like docs win."""
    from bento_ray.textops import dsir_select

    ds = rd.from_items([
        {"doc_id": 3, "text": ""},
        {"doc_id": 1, "text": "same text here"},
        {"doc_id": 2, "text": "same text here"},
    ])
    tds = rd.from_items([{"doc_id": 9, "text": "same text here"}])
    out = dsir_select(ds, tds, k=3, n_buckets=97).to_pandas()
    assert list(out["doc_id"]) == [3, 1, 2]
    assert out["micro_weight"].iloc[0] == 0
    assert out["micro_weight"].iloc[1] == out["micro_weight"].iloc[2] < 0


def test_dsir_gumbel_resampling(ray_session):
    """Gumbel-top-k resampling: over 40 IDENTICAL docs (equal
    weights) the draw is pure noise ranking — the same seed
    reproduces the selection exactly (hash-derived noise, no RNG
    state), a different seed draws a different subset, and strong
    weight signal still dominates the noise (the A/B corpus test
    above would pass unchanged with noise on)."""
    from bento_ray.textops import dsir_select

    ds = rd.from_items([{"doc_id": i, "text": "same text here"}
                        for i in range(40)])
    tds = rd.from_items([{"doc_id": 99, "text": "same text here"}])

    def sel(seed):
        df = dsir_select(ds, tds, k=20, n_buckets=97,
                         gumbel_seed=seed).to_pandas()
        return list(df["doc_id"])

    a1, a2, b = sel(7), sel(7), sel(8)
    assert a1 == a2                      # deterministic per seed
    assert set(a1) != set(b)             # seed changes the draw
    assert len(a1) == 20 and set(a1) <= set(range(40))
    import math

    from bento_ray.textops import unigram_logprob
    from bento_ray.util import duckdb_round

    texts = ["a a b", "b c", ""]
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    out = unigram_logprob(ds).to_pandas() \
        .set_index("doc_id").sort_index()
    # corpus counts: a=2, b=2, c=1, N=5
    micro = {w: float(duckdb_round(math.log(c / 5.0) * 1e6, 0))
             for w, c in {"a": 2, "b": 2, "c": 1}.items()}

    def score(words):
        return float(duckdb_round(
            -sum(micro[w] for w in words) / 1e6 / len(words), 6))

    assert out.loc[0, "n_words"] == 3
    assert out.loc[0, "neg_logprob"] == score(["a", "a", "b"])
    assert out.loc[1, "neg_logprob"] == score(["b", "c"])
    assert out.loc[2, "n_words"] == 0
    assert out.loc[2, "neg_logprob"] == 0.0
    # rare token c scores worse (higher neg-logprob) than common a
    assert out.loc[1, "neg_logprob"] > out.loc[0, "neg_logprob"]


def test_dup_window_coverage_and_removal():
    from bento_ray.textops import dup_window_coverage, remove_dup_spans

    shared = "alpha beta gamma delta"          # 4-token dup window
    ds = rd.from_items([
        {"doc_id": 0, "text": f"{shared} unique tail zero"},
        {"doc_id": 1, "text": f"front one {shared}"},
        {"doc_id": 2, "text": "completely different words here now"},
        {"doc_id": 3, "text": ""},
    ])
    cov = dup_window_coverage(ds, n=4).to_pandas() \
        .set_index("doc_id").sort_index()
    assert cov.loc[0, "n_tokens"] == 7
    assert cov.loc[0, "n_covered"] == 4   # the shared window only
    assert cov.loc[1, "n_covered"] == 4
    assert cov.loc[2, "n_covered"] == 0
    assert cov.loc[3, "n_tokens"] == 0
    assert cov.loc[3, "covered_frac"] == 0.0

    clean = remove_dup_spans(ds, n=4).to_pandas() \
        .set_index("doc_id").sort_index()
    assert clean.loc[0, "clean_text"] == "unique tail zero"
    assert clean.loc[0, "n_removed"] == 4
    assert clean.loc[1, "clean_text"] == "front one"
    assert clean.loc[2, "clean_text"] == \
        "completely different words here now"
    assert clean.loc[2, "n_removed"] == 0
    assert clean.loc[3, "clean_text"] == ""


def test_dup_window_overlapping_spans_union():
    from bento_ray.textops import dup_window_coverage

    # doc 0 and 1 share a 5-token run → two overlapping 4-windows in
    # each; union must count 5 tokens, not 8
    run = "a b c d e"
    ds = rd.from_items([
        {"doc_id": 0, "text": f"{run} x y z"},
        {"doc_id": 1, "text": f"p q {run}"},
    ])
    cov = dup_window_coverage(ds, n=4).to_pandas() \
        .set_index("doc_id").sort_index()
    assert cov.loc[0, "n_covered"] == 5
    assert cov.loc[1, "n_covered"] == 5


def test_within_doc_repeat_is_not_a_dup_span():
    from bento_ray.textops import dup_window_coverage

    rep = "w x y z"
    ds = rd.from_items([
        {"doc_id": 0, "text": f"{rep} mid {rep}"},   # repeats itself
        {"doc_id": 1, "text": "unrelated other text body four"},
    ])
    cov = dup_window_coverage(ds, n=4).to_pandas() \
        .set_index("doc_id").sort_index()
    # cross-document definition: a window repeated only inside one doc
    # does not count
    assert cov.loc[0, "n_covered"] == 0


def test_sequence_packing_prefix_sums():
    from bento_ray.textops import sequence_packing

    docs = [
        {"doc_id": 10, "text": "a b c"},            # 3 tokens, off 0
        {"doc_id": 20, "text": ""},                  # empty → -1 seqs
        {"doc_id": 30, "text": " ".join(["w"] * 6)},  # off 3, crosses
        {"doc_id": 40, "text": "x y"},               # off 9
    ]
    out = sequence_packing(rd.from_items(docs), seq_len=4) \
        .to_pandas().set_index("doc_id").sort_index()
    assert list(out["token_offset"]) == [0, 3, 3, 9]
    assert list(out["n_tokens"]) == [3, 0, 6, 2]
    # doc 10: tokens 0-2 → seq 0 only
    assert out.loc[10, "first_seq"] == 0 and out.loc[10, "last_seq"] == 0
    # empty doc: sentinels
    assert out.loc[20, "first_seq"] == -1 and out.loc[20, "last_seq"] == -1
    # doc 30: tokens 3-8 → seqs 0..2
    assert out.loc[30, "first_seq"] == 0 and out.loc[30, "last_seq"] == 2
    # doc 40: tokens 9-10 → seq 2 only
    assert out.loc[40, "first_seq"] == 2 and out.loc[40, "last_seq"] == 2


def test_incremental_dedup_drops_only_snapshot_content():
    import ray.data as rd

    from bento_ray.textops import incremental_dedup

    snapshot = rd.from_items([
        {"doc_id": 1, "text": "shared boilerplate"},
        {"doc_id": 2, "text": "old news article"},
    ])
    new = rd.from_items([
        {"doc_id": 10, "text": "shared boilerplate"},   # dup → dropped
        {"doc_id": 11, "text": "fresh content"},         # kept
        {"doc_id": 12, "text": "old news article"},      # dup → dropped
        {"doc_id": 13, "text": "shared boilerplate!"},   # near but not equal
    ])
    kept = sorted(incremental_dedup(new, snapshot).to_pandas()["doc_id"])
    assert kept == [11, 13]


def test_incremental_dedup_empty_snapshot_passthrough():
    import ray.data as rd

    from bento_ray.textops import incremental_dedup

    snapshot = rd.from_items([{"doc_id": 0, "text": "x"}]).filter(
        expr="doc_id < 0")
    new = rd.from_items([{"doc_id": 1, "text": "a"},
                         {"doc_id": 2, "text": "b"}])
    assert incremental_dedup(new, snapshot).count() == 2


def test_kmeans_fit_matches_local_lloyd():
    import ray.data as rd

    from bento_ray.textops import kmeans_assign, kmeans_fit
    from bento_ray.textops.similarity import _normalize

    rng = np.random.default_rng(7)
    # three tight clusters on the sphere
    centers = _normalize(rng.normal(size=(3, 16)))
    pts = np.concatenate([
        _normalize(c + 0.05 * rng.normal(size=(40, 16))) for c in centers])
    ds = rd.from_items([
        {"vec_id": i, "embedding": row.astype(np.float32).tolist()}
        for i, row in enumerate(pts)])

    init = pts[:3]
    got = kmeans_fit(ds, 3, iters=4, init=init)

    # local Lloyd reference, same init / same update rule
    C = _normalize(np.asarray(init, np.float64))
    vm = _normalize(np.array(
        [r.astype(np.float32).astype(np.float64) for r in pts]))
    for _ in range(4):
        cell = np.argmax(vm @ C.T, axis=1)
        newC = C.copy()
        for c in range(3):
            m = vm[cell == c]
            newC[c] = m.mean(axis=0) if len(m) else -C[0]
        C = _normalize(newC)
    assert np.allclose(got, C, atol=1e-9)

    # assignments recover the generating clusters
    out = kmeans_assign(ds, got).to_pandas().sort_values("vec_id")
    lab = out["cluster"].to_numpy()
    for g in range(3):
        grp = lab[g * 40:(g + 1) * 40]
        assert (grp == np.bincount(grp).argmax()).mean() == 1.0


def test_kmeans_fit_empty_cell_reseeds():
    import ray.data as rd

    from bento_ray.textops import kmeans_fit

    pts = np.array([[1.0, 0.0], [0.9, 0.1], [0.95, 0.05]])
    ds = rd.from_items([{"embedding": p.tolist()} for p in pts])
    # second centroid starts antipodal → captures nothing → reseeded
    init = np.array([[1.0, 0.0], [-1.0, 0.0]])
    C = kmeans_fit(ds, 2, iters=2, init=init)
    assert C.shape == (2, 2)
    assert np.isfinite(C).all()


def test_seeded_shuffle_deterministic_and_seed_sensitive():
    import ray.data as rd

    from bento_ray.textops import seeded_shuffle

    ds = rd.from_items([{"doc_id": i} for i in range(50)])
    a = seeded_shuffle(ds, seed=1).to_pandas()["doc_id"].tolist()
    b = seeded_shuffle(rd.from_items([{"doc_id": i} for i in range(50)]),
                       seed=1).to_pandas()["doc_id"].tolist()
    c = seeded_shuffle(ds, seed=2).to_pandas()["doc_id"].tolist()
    assert a == b                       # reproducible
    assert a != c                       # epoch-sensitive
    assert sorted(a) == list(range(50))  # a permutation
    assert a != list(range(50))          # actually shuffled


def test_paragraph_dedup_keeps_first_instance():
    import ray.data as rd

    from bento_ray.textops import paragraph_dedup

    bp = "a b c d"  # one 4-word paragraph at w=4
    rows = [
        {"doc_id": 1, "text": bp + " unique one two x"},       # paras: bp, tail
        {"doc_id": 2, "text": bp + " other words here y"},     # bp dropped
        {"doc_id": 3, "text": "totally different body z"},
        {"doc_id": 4, "text": ""},                              # wordless
    ]
    out = paragraph_dedup(rd.from_items(rows), words_per_para=4) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_paras"] == 2 and out.loc[1, "n_kept"] == 2
    assert out.loc[1, "clean_text"] == "a b c d unique one two x"
    assert out.loc[2, "n_paras"] == 2 and out.loc[2, "n_kept"] == 1
    assert out.loc[2, "clean_text"] == "other words here y"
    assert out.loc[3, "n_kept"] == 1
    assert out.loc[4, "n_paras"] == 0 and out.loc[4, "clean_text"] == ""


def test_paragraph_dedup_within_doc_duplicates():
    import ray.data as rd

    from bento_ray.textops import paragraph_dedup

    # the same paragraph twice INSIDE one doc: second instance drops
    rows = [{"doc_id": 7, "text": "p q r s p q r s tail words go here"}]
    out = paragraph_dedup(rd.from_items(rows), words_per_para=4) \
        .to_pandas().iloc[0]
    assert out["n_paras"] == 3 and out["n_kept"] == 2
    assert out["clean_text"] == "p q r s tail words go here"


def test_ccnet_buckets_thirds_and_order():
    import ray.data as rd

    from bento_ray.textops import ccnet_buckets

    # 9 docs, one lang: common-word docs score low (head), rare high
    rows = []
    for i in range(9):
        words = ["common"] * 5 if i < 3 else (
            ["common", "mid", "mid"] if i < 6 else [f"rare{i}a", f"rare{i}b"])
        rows.append({"doc_id": i, "lang": "en", "text": " ".join(words)})
    out = ccnet_buckets(rd.from_items(rows)).to_pandas() \
        .set_index("bucket").sort_index()
    assert out.loc["head", "n_docs"] == 3
    assert out.loc["middle", "n_docs"] == 3
    assert out.loc["tail", "n_docs"] == 3
    assert (out.loc["head", "avg_neg_logprob"]
            < out.loc["middle", "avg_neg_logprob"]
            < out.loc["tail", "avg_neg_logprob"])


def _bpe_reference(word_counts, num_merges):
    """Scalar reference BPE (Sennrich et al.): same tie rule."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        stats = {}
        for w, c in word_counts.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] = stats.get((s[i], s[i + 1]), 0) + c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(s[i]); i += 1
            seqs[w] = out
    return merges


def test_bpe_train_matches_scalar_reference():
    import ray.data as rd

    from bento_ray.textops import bpe_encode_word, bpe_train

    docs = ["low low low lower lowest", "new newer newest low",
            "wider wide wide new"]
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(docs)])
    wc = {}
    for t in docs:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want = _bpe_reference(wc, 8)
    got = bpe_train(ds, num_merges=8)
    assert got == want
    # encoding uses the merges in order
    toks = bpe_encode_word("lowest", got)
    assert "".join(toks) == "lowest"
    assert len(toks) < len("lowest")


def test_bpe_pair_counts_simple():
    import ray.data as rd

    from bento_ray.textops import bpe_pair_counts

    ds = rd.from_items([{"text": "aa ab aa"}])
    out = bpe_pair_counts(ds, k=5).to_pandas().set_index("pair")
    assert out.loc["aa", "cnt"] == 2
    assert out.loc["ab", "cnt"] == 1


def test_weighted_mix_rates_and_determinism():
    import ray.data as rd

    from bento_ray.textops import weighted_mix

    rows = [{"doc_id": i, "source": "a" if i % 2 == 0 else "b"}
            for i in range(2000)]
    ds = rd.from_items(rows)
    out = weighted_mix(ds, {"a": 1.0, "b": 0.25}).to_pandas()
    n_a = (out["source"] == "a").sum()
    n_b = (out["source"] == "b").sum()
    assert n_a == 1000                       # rate 1.0 keeps everything
    assert 150 < n_b < 350                    # ~25% of 1000
    out2 = weighted_mix(rd.from_items(rows),
                        {"a": 1.0, "b": 0.25}).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])  # deterministic
    # default_rate=0 drops unlisted sources
    out3 = weighted_mix(ds, {"a": 0.5}).to_pandas()
    assert (out3["source"] == "b").sum() == 0


def test_curate_documents_gate_rules():
    import ray.data as rd

    from bento_ray.pipelines.curation import curate_documents

    long_unique = " ".join(f"w{i}" for i in range(30))
    other_long = " ".join(f"x{i}" for i in range(40))
    rows = [
        {"doc_id": 1, "lang": "en", "text": long_unique},     # kept
        {"doc_id": 2, "lang": "en", "text": "short doc"},     # < 20 words
        {"doc_id": 3, "lang": "fr", "text": "rep " * 40},      # low distinct
        {"doc_id": 4, "lang": "fr", "text": other_long},       # kept
        # shares ALL paragraphs with doc 1 → deduped below the gate
        {"doc_id": 5, "lang": "de", "text": long_unique + " extra tail"},
    ]
    out = curate_documents(rd.from_items(rows)).to_pandas() \
        .set_index("lang").sort_index()
    assert out.loc["en", "n_docs"] == 1 and out.loc["en", "total_words"] == 30
    assert out.loc["fr", "n_docs"] == 1 and out.loc["fr", "total_words"] == 40
    assert "de" not in out.index   # dedup + gate removed doc 5
    assert (out["avg_kept_frac"] == 1.0).all()  # survivors lost nothing


def test_pagerank_known_graphs():
    import ray.data as rd

    from bento_ray.textops.graph import pagerank

    # 3-cycle: uniform is stationary
    nodes = rd.from_items([{"node": i} for i in range(3)])
    edges = rd.from_items([{"src": 0, "dst": 1}, {"src": 1, "dst": 2},
                           {"src": 2, "dst": 0}])
    out = pagerank(edges, nodes, iters=3).to_pandas()
    assert np.allclose(out["rank"], 1 / 3)

    # star into node 0, 2 iterations vs hand-rolled reference
    nodes = rd.from_items([{"node": i} for i in range(4)])
    edges = rd.from_items([{"src": i, "dst": 0} for i in (1, 2, 3)])
    got = pagerank(edges, nodes, iters=2).to_pandas() \
        .set_index("node")["rank"]
    r = np.full(4, 0.25)
    for _ in range(2):
        s = np.zeros(4)
        s[0] = r[1] + r[2] + r[3]
        r = 0.15 / 4 + 0.85 * s
    assert np.allclose(got.sort_index().to_numpy(), r)

    # isolated node keeps the base rank; dangling mass is dropped
    nodes = rd.from_items([{"node": i} for i in range(3)])
    edges = rd.from_items([{"src": 0, "dst": 1}])
    got = pagerank(edges, nodes, iters=1).to_pandas() \
        .set_index("node")["rank"].sort_index()
    assert np.isclose(got[1], 0.15 / 3 + 0.85 * (1 / 3))
    assert np.isclose(got[0], 0.15 / 3) and np.isclose(got[2], 0.15 / 3)


def test_logreg_hashed_trains_and_separates():
    import ray.data as rd

    from bento_ray.textops.classify import (logreg_fit_hashed,
                                            logreg_score_hashed)

    rng = np.random.default_rng(3)
    ham_vocab = [f"word{i}" for i in range(30)]
    rows = []
    for i in range(200):
        body = " ".join(rng.choice(ham_vocab, 12))
        if i % 2 == 0:
            body += " win free prize click now"
        rows.append({"doc_id": i, "text": body,
                     "y": float(i % 2 == 0)})
    ds = rd.from_items(rows)
    wn = logreg_fit_hashed(ds, label_col="y", n_buckets=64, iters=4)
    assert wn.dtype == np.int64 and len(wn) == 65

    scored = logreg_score_hashed(ds, wn).to_pandas()
    spam = scored[scored["y"] == 1.0]["score"]
    ham = scored[scored["y"] == 0.0]["score"]
    assert spam.mean() > 0.7 > 0.3 > ham.mean()
    # hard decision at 0.5: high accuracy (hash collisions at B=64
    # keep it short of perfect — spam/ham words share buckets)
    acc = ((scored["score"] > 0.5) == (scored["y"] == 1.0)).mean()
    assert acc >= 0.9, acc


def test_logreg_hashed_matches_local_reference():
    import ray.data as rd

    from bento_ray.textops.classify import logreg_fit_hashed
    from bento_ray.textops.quality import hash_word
    from bento_ray.util import duckdb_round

    rows = [{"doc_id": i,
             "text": ["good text here", "spam spam offer",
                      "more nice words", "offer spam now"][i],
             "y": float(i % 2)} for i in range(4)]
    got = logreg_fit_hashed(rd.from_items(rows), label_col="y",
                            n_buckets=16, iters=3)

    # scalar reference with identical quantization
    B = 16
    feats = []
    for r in rows:
        cnt = np.zeros(B + 1, np.int64)
        cnt[0] = 1
        for w in r["text"].split():
            cnt[hash_word(w) % B + 1] += 1
        feats.append(cnt)
    X = np.array(feats)
    y = np.array([r["y"] for r in rows])
    wn = np.zeros(B + 1, np.int64)
    for _ in range(3):
        z = (X @ wn) / 1e9
        sig = 1.0 / (1.0 + np.exp(-z))
        gq = duckdb_round((sig - y) * 1e9, 0).astype(np.int64)
        g = gq @ X
        wn = wn - duckdb_round(g / len(rows), 0).astype(np.int64)
    assert np.array_equal(got, wn)


def test_simhash_near_dups_exact_at_small_hamming():
    import ray.data as rd

    from bento_ray.textops import simhash64, simhash_near_dups
    from bento_ray.textops.dedup import _popcount64

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima")
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},                 # identical → ham 0
        {"doc_id": 2, "text": base + " extra"},      # near
        {"doc_id": 3, "text": "totally different words about other things "
                              "entirely unrelated content here now"},
    ]
    ds = rd.from_items(rows)
    got = simhash_near_dups(ds, max_hamming=3).to_pandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (0, 1) in pairs
    assert got.set_index(["doc_a", "doc_b"]).loc[(0, 1), "hamming"] == 0

    # brute-force ground truth: banding misses NOTHING at ham ≤ 3
    sims = simhash64(ds).to_pandas().set_index("doc_id")["simhash"]
    truth = set()
    for a in range(4):
        for b in range(a + 1, 4):
            ham = int(_popcount64(np.array(
                [np.uint64(sims[a]) ^ np.uint64(sims[b])]))[0])
            if ham <= 3:
                truth.add((a, b))
    assert pairs == truth


def test_popcount64_matches_python():
    from bento_ray.textops.dedup import _popcount64

    rng = np.random.default_rng(5)
    xs = rng.integers(0, 2**63, 1000, dtype=np.int64).astype(np.uint64)
    got = _popcount64(xs)
    want = np.array([bin(int(x)).count("1") for x in xs])
    assert np.array_equal(got, want)


def test_fix_mojibake_repairs_and_passes_through():
    import ray.data as rd

    from bento_ray.textops import fix_mojibake

    rows = [
        {"doc_id": 0, "text": "plain ascii stays put"},
        {"doc_id": 1, "text": "the cafÃ© is open"},          # 1 round
        {"doc_id": 2, "text": "donâ€™t touch â€œquotesâ€\x9d"},
        {"doc_id": 3, "text": "already café fine"},           # real é kept
        {"doc_id": 4, "text": "lone Ã marker no valid utf8"},  # unrepairable
    ]
    out = fix_mojibake(rd.from_items(rows)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0, "fixed_text"] == "plain ascii stays put"
    assert not out.loc[0, "was_mojibake"]
    assert out.loc[1, "fixed_text"] == "the café is open"
    assert out.loc[1, "was_mojibake"]
    assert out.loc[2, "fixed_text"] == "don’t touch “quotes”"
    assert out.loc[3, "fixed_text"] == "already café fine"
    assert not out.loc[3, "was_mojibake"]
    # a bare 'Ã ' that isn't valid UTF-8 after re-encode is left alone
    assert out.loc[4, "fixed_text"] == "lone Ã marker no valid utf8"


def test_fix_mojibake_double_encoded():
    import ray.data as rd

    from bento_ray.textops import fix_mojibake

    once = "café".encode("utf-8").decode("cp1252")       # 'cafÃ©'
    twice = once.encode("utf-8").decode("cp1252")        # double-mojibake
    out = fix_mojibake(rd.from_items(
        [{"doc_id": 0, "text": f"menu {twice} here"}])).to_pandas()
    assert out.iloc[0]["fixed_text"] == "menu café here"


def test_bpe_tokenize_rank_greedy_equals_sequential():
    """The actor stage's rank-greedy encode must equal applying the
    merge list in order (bpe_encode_word) for arbitrary words."""
    import numpy as np

    from bento_ray.textops import bpe_encode_word
    from bento_ray.textops.bpe import _BpeTokenizer

    rng = np.random.default_rng(2)
    alpha = "abcd"
    corpus_words = ["".join(rng.choice(list(alpha), size=rng.integers(1, 9)))
                    for _ in range(60)]
    # derive a plausible merge list by training on the words
    import ray.data as rd

    ds = rd.from_items([{"text": " ".join(corpus_words)}])
    from bento_ray.textops import bpe_train

    merges = bpe_train(ds, num_merges=12)
    tok = _BpeTokenizer(merges, "text")
    for w in corpus_words + ["", "a", "dcba", "aaaaaaaa"]:
        assert tok._encode(w) == bpe_encode_word(w, merges), w


def test_bpe_tokenize_distributed_counts_and_lists():
    import ray.data as rd

    from bento_ray.textops import bpe_encode_word, bpe_tokenize, bpe_train

    rows = [{"doc_id": 0, "text": "low lower lowest"},
            {"doc_id": 1, "text": "new newer newest"},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "low low low"}]
    ds = rd.from_items(rows)
    merges = bpe_train(ds, num_merges=10)
    out = bpe_tokenize(ds, merges).to_pandas().sort_values("doc_id")
    for _, r in out.iterrows():
        words = [w for w in rows[int(r["doc_id"])]["text"].split(" ") if w]
        want = [t for w in words for t in bpe_encode_word(w, merges)]
        assert list(r["bpe_tokens"]) == want
        assert r["n_bpe_tokens"] == len(want)


def test_pq_fit_matches_local_lloyd():
    import numpy as np

    import ray.data as rd

    from bento_ray.textops import pq_fit

    rng = np.random.default_rng(21)
    V = rng.normal(0, 1, size=(200, 16)).astype(np.float64)
    ds = rd.from_items([{"vec_id": i, "embedding": list(map(float, v))}
                        for i, v in enumerate(V)]).repartition(6)
    m, ks, iters = 2, 4, 4
    got = pq_fit(ds, m=m, ks=ks, iters=iters)

    # local reference: same init (first ks rows), same Lloyd updates
    dsub = V.shape[1] // m
    C = np.stack([V[:ks, s * dsub:(s + 1) * dsub] for s in range(m)])
    for _ in range(iters):
        newC = C.copy()
        for s in range(m):
            x = V[:, s * dsub:(s + 1) * dsub]
            d2 = ((x[:, None, :] - C[s][None, :, :]) ** 2).sum(2)
            cell = np.argmin(d2, 1)
            for c in range(ks):
                if (cell == c).any():
                    newC[s, c] = x[cell == c].mean(0)
        C = newC
    assert np.allclose(got, C, atol=1e-9)


def test_pq_topk_exact_at_reconstructing_codebook():
    """With ks ≥ distinct subvectors the quantizer reconstructs every
    vector exactly, so ADC distances equal true squared L2 and the
    PQ top-k must equal brute force."""
    import numpy as np

    import ray.data as rd

    from bento_ray.textops import pq_topk

    rng = np.random.default_rng(8)
    # 12 distinct vectors, 16-dim, m=2: codebooks = all subvectors
    V = rng.normal(0, 1, size=(12, 16))
    m, dsub = 2, 8
    C = np.stack([V[:, s * dsub:(s + 1) * dsub] for s in range(m)])
    ds = rd.from_items([{"vec_id": i, "embedding": list(map(float, v))}
                        for i, v in enumerate(V)]).repartition(4)
    Q = V[:2] + 0.01 * rng.normal(size=(2, 16))
    out = pq_topk(ds, C, Q, [100, 101], k=3).to_pandas()
    for qi, qid in enumerate([100, 101]):
        d2 = ((V - Q[qi]) ** 2).sum(1)
        want = list(np.lexsort((np.arange(len(V)), d2))[:3])
        got = list(out[out["query_id"] == qid].sort_values("adc_dist")
                   ["vec_id"])
        assert got == want, (qid, got, want)


def test_pq_topk_recall_on_trained_codebooks():
    import numpy as np

    import ray.data as rd

    from bento_ray.textops import pq_fit, pq_topk

    rng = np.random.default_rng(30)
    # clustered corpus so PQ cells carry signal
    centers = rng.normal(0, 5, size=(6, 32))
    V = np.concatenate([c + rng.normal(0, 0.5, size=(50, 32))
                        for c in centers])
    ds = rd.from_items([{"vec_id": i, "embedding": list(map(float, v))}
                        for i, v in enumerate(V)]).repartition(8)
    C = pq_fit(ds, m=4, ks=16, iters=4)
    Q = V[:5] + 0.05 * rng.normal(size=(5, 32))
    k = 10
    out = pq_topk(ds, C, Q, list(range(5)), k=k).to_pandas()
    recalls = []
    for qid in range(5):
        d2 = ((V - Q[qid]) ** 2).sum(1)
        truth = set(np.argsort(d2)[:k])
        got = set(out[out["query_id"] == qid]["vec_id"])
        recalls.append(len(got & truth) / k)
    assert np.mean(recalls) >= 0.5, recalls


def test_bigram_logprob_backoff_and_oov_branches():
    """Hand-checkable LM: train on one doc, score another that hits
    every branch — seen bigram, unseen bigram (backoff), OOV token."""
    import numpy as np

    import ray.data as rd

    from bento_ray.textops import bigram_logprob
    from bento_ray.util import duckdb_round

    train = rd.from_items([{"doc_id": 0, "text": "a b a b"}])
    score = rd.from_items([{"doc_id": 1, "text": "a b b z"}])
    out = bigram_logprob(score, train=train).to_pandas()
    # LM: c1(a)=2, c1(b)=2, N=4; bigrams: (a,b)=2, (b,a)=1
    m = lambda x: float(duckdb_round(np.array([np.log(x) * 1e6]), 0)[0])
    u_a, u_b = m(2 / 4), m(2 / 4)
    oov = m(1 / 4)
    bo = -916291
    # tokens: a | (a,b) seen | (b,b) backoff→u_b | (b,z) backoff→oov
    total = u_a + m(2 / 2) + (bo + u_b) + (bo + oov)
    want = float(duckdb_round(np.array([-total / 1e6 / 4]), 6)[0])
    assert out.iloc[0]["n_words"] == 4
    assert out.iloc[0]["neg_logprob2"] == want


def test_word_buffers_sliced_array():
    """Regression (ADVICE r4, low): _word_buffers must honor
    arr.offset — a sliced string array shares its parent's buffers,
    so reading offsets/data from position 0 misaligns the word-
    boundary mask."""
    import numpy as np
    import pyarrow as pa

    from bento_ray.textops.bpe import _word_buffers

    full = pa.array(["aa", "bbb", "cccc", "dd"], pa.string())
    sl = full.slice(1, 2)                 # ["bbb", "cccc"]
    data, offs = _word_buffers(sl)
    assert offs.tolist() == [0, 3, 7]
    assert bytes(data[:7]) == b"bbbcccc"
    # parity with the unsliced equivalent
    d2, o2 = _word_buffers(pa.array(["bbb", "cccc"], pa.string()))
    assert offs.tolist() == o2.tolist()
    assert bytes(data[: offs[-1]]) == bytes(d2[: o2[-1]])


def test_stack_rejects_null_embedding_rows():
    """_stack's fixed-size-list fast path reads the raw values
    buffer; a null row there is garbage/NaN and must fail loudly
    instead of silently poisoning every cosine score."""
    import pyarrow as pa

    from bento_ray.textops.similarity import _stack

    ok = pa.array([[1.0, 2.0], [3.0, 4.0]],
                  pa.list_(pa.float64(), 2))
    out = _stack(ok)
    assert out.shape == (2, 2) and out[1, 0] == 3.0

    with_null = pa.array([[1.0, 2.0], None, [5.0, 6.0]],
                         pa.list_(pa.float64(), 2))
    with pytest.raises(ValueError, match="null row"):
        _stack(with_null)


def test_word_hashes_sliced_array():
    """A zero-copy sliced Array shares buffers with its parent; the
    offsets read must start at arr.offset or the hashes come back
    for the parent's FIRST n words."""
    import pyarrow as pa

    from bento_ray.textops.quality import hash_word, word_hashes

    arr = pa.array(["aaa", "bbb", "ccc", "dddd"])
    got = word_hashes(arr.slice(2))
    assert got.tolist() == [hash_word("ccc"), hash_word("dddd")]
    # unsliced parity with the scalar form stays pinned
    assert word_hashes(arr).tolist() == \
        [hash_word(w) for w in ["aaa", "bbb", "ccc", "dddd"]]


def test_bpe_tokenizer_arbitrary_merge_order_matches_sequential():
    """bpe_tokenize accepts arbitrary merge lists; the actor's greedy
    fast path must agree with the sequential reference even when the
    list is not creation-ordered."""
    from bento_ray.textops.bpe import _BpeTokenizer, bpe_encode_word

    adversarial = [("ab", "c"), ("a", "b")]
    t = _BpeTokenizer(adversarial, "w")
    for w in ["abc", "ababc", "cab"]:
        assert t._encode(w) == bpe_encode_word(w, adversarial), w


# -------------------------------------------- review-finding regressions

def test_split_words_matches_re2_tokens():
    """Tokenization is RE2-\\S+ whitespace runs (the oracle
    convention), not single-space split: tabs/newlines/formfeeds
    separate tokens, vertical tab does NOT (RE2 \\s excludes it)."""
    import pyarrow as pa

    from bento_ray.textops.terms import _split_words

    flat, counts = _split_words(pa.array(
        ["a\tb", "x\ny", " lead  trail ", "keep\x0btogether", "", None]))
    assert flat.to_pylist() == ["a", "b", "x", "y", "lead", "trail",
                                "keep\x0btogether"]
    assert counts.tolist() == [2, 2, 2, 1, 0, 0]
    # the exact-regex fallback path (corpus containing \x0b elsewhere)
    flat2, counts2 = _split_words(pa.array(["a\x0bb", "c\td"]))
    assert flat2.to_pylist() == ["a\x0bb", "c", "d"]
    assert counts2.tolist() == [1, 2]


def test_tfidf_ranks_by_score_not_raw_tf():
    """A high-tf stopword present in nearly every doc must lose to a
    lower-tf rare keyword — ranking is by tf*ln(N/df) itself."""
    import ray as _ray

    from bento_ray.textops.terms import tfidf_top_terms

    docs = [{"doc_id": 0,
             "text": "the the the the the quantum quantum quantum leap"}]
    docs += [{"doc_id": i, "text": "the filler words"}
             for i in range(1, 100)]
    ds = _ray.data.from_items(docs)
    out = tfidf_top_terms(ds, k=1).to_pandas()
    row = out[out.doc_id == 0].iloc[0]
    # tf(the)=5, df(the)=100 → tfidf 0; tf(quantum)=3, df=1 → ~13.8
    assert row["term"] == "quantum"
    assert row["tfidf"] > 10


def test_normalize_series_preserves_null():
    import pyarrow as pa

    from bento_ray.textops.normalize import normalize_series

    out = normalize_series(pa.array(["  A  B ", None, "ÉCOLE"]))
    assert out.to_pylist() == ["a b", None, "école"]


def test_incremental_dedup_pair_hash():
    import ray as _ray

    from bento_ray.textops.dedup import incremental_dedup

    snap = _ray.data.from_items(
        [{"doc_id": i, "text": f"snapshot doc {i}"} for i in range(20)])
    new = _ray.data.from_items(
        [{"doc_id": 100 + i, "text": f"snapshot doc {i}"}
         for i in range(5)]
        + [{"doc_id": 200 + i, "text": f"fresh doc {i}"}
           for i in range(7)])
    kept = incremental_dedup(new, snap).to_pandas()
    assert sorted(kept["doc_id"]) == [200 + i for i in range(7)]
