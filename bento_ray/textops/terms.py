"""Corpus term statistics: term/bigram frequency, TF-IDF keyword
extraction, deterministic hash sampling.

These are the frequency-analysis ops a webtext training-data pipeline
runs corpus-wide (vocabulary building, boilerplate-phrase detection,
keyword extraction, reproducible subsampling). Reference anchor: the
reference engine expresses these as Bloblang/awk aggregations over
message streams (e.g. internal/impl/pure/processor_metric.go counters);
here they are first-class distributed Dataset transforms.

Ray-Data-first shapes:

- **Combiner pattern everywhere.** Raw (word) rows never enter a
  shuffle: each batch pre-aggregates to (word, partial_count) with ONE
  Arrow ``Table.group_by`` — the all-to-all exchange then moves at most
  |vocab| rows per block instead of |tokens|. At 100 TB the shuffle
  input is bounded by vocabulary size × blocks, not corpus size.
- **Per-doc stats need no shuffle at all.** A parquet row (one doc) is
  atomic within a block, so per-doc term counts and top-k selections
  complete inside ``map_batches``.
- **Small sides broadcast.** The document-frequency table (vocabulary-
  sized) is ``ray.put`` once and read per actor, never re-shipped per
  batch; swap for a ``shuffle_join`` on ``term`` when the vocabulary
  itself outgrows worker memory (hundreds of millions of distinct
  terms) — the plan below keeps that substitution local to one stage.
- Splitting is whitespace-run tokenization (RE2 ``\\S+`` semantics,
  empties dropped) — the same convention as quality.py's metrics and
  every DuckDB oracle (``regexp_extract_all(text, '\\S+')``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

from bento_ray.util import duckdb_round

# broadcast bound for the dup-hash set in dup_ngram_stats: 5M uint64
# ≈ 40 MB shipped once per node via the object store — cheap next to
# the hash-shuffle of the full inst table it replaces; beyond it the
# classify step falls back to the co-bucketed shuffle join
BROADCAST_MAX_DUP_HASHES = 5_000_000

__all__ = [
    "term_counts",
    "bigram_counts",
    "top_terms",
    "top_bigrams",
    "tfidf_top_terms",
    "dup_ngram_stats",
    "hash_sample",
    "stratified_sample",
    "decontaminate",
    "dsir_weights",
    "dsir_select",
    "unigram_logprob",
    "dup_window_coverage",
    "remove_dup_spans",
    "sequence_packing",
]

# Knuth multiplicative hash constant (2^32 / phi) — public domain.
_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)


def _split_words(col) -> tuple[pa.Array, np.ndarray]:
    """Vectorized whitespace-run split of a string column with empties
    dropped — token semantics identical to the oracles' RE2
    ``\\S+`` (``\\s`` = ``[\\t\\n\\f\\r ]``, no vertical tab, no
    unicode spaces).

    Returns (flat Arrow word array, per-doc word counts). One Arrow
    kernel pass; no per-row Python — keeping the flat array Arrow
    preserves word_hashes' zero-copy buffer fast path. Arrow's fast
    ``ascii_split_whitespace`` also splits on ``\\x0b``; that is the
    ONLY divergence from RE2, so one SIMD substring scan picks the
    fast kernel unless a vertical tab is actually present."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if (pc.sum(pc.count_substring(arr, "\x0b")).as_py() or 0) == 0:
        la = pc.ascii_split_whitespace(arr)
    else:
        la = pc.split_pattern_regex(arr, "[\t\n\f\r ]+")
    flat = la.flatten()
    lens = pc.list_value_length(la).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    if keep_np.all():
        return flat, lens
    # rebuild per-doc counts after dropping empties: doc-id per flat
    # word, mask to kept words, bincount. Handles null docs (lens=0)
    # and empty tokens in the last doc correctly — unlike a reduceat
    # over clipped segment starts, which merges the final segments.
    doc_ids = np.repeat(np.arange(len(lens)), lens)
    kept_per_doc = np.bincount(doc_ids[keep_np], minlength=len(lens)) \
        .astype(np.int64)
    return flat.filter(keep), kept_per_doc


def _partial_counts(words: pa.Array, name: str) -> pa.Table:
    """ONE Arrow hash-aggregate over the batch's words → compact
    (name, cnt) partial."""
    t = pa.table({name: words})
    agg = t.group_by(name).aggregate([(name, "count")])
    return pa.table({
        name: agg.column(name),
        "cnt": agg.column(f"{name}_count").cast(pa.int64()),
    })


def term_counts(ds, col: str = "text"):
    """Global term frequencies: Dataset of (word, cnt).

    Plan: map_batches partial count (combiner) → groupby(word).sum —
    the only shuffle moves ≤ |vocab| rows per block."""

    def _partial(t: pa.Table) -> pa.Table:
        flat, _ = _split_words(t.column(col))
        return _partial_counts(flat, "word")

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    out = partials.groupby("word").aggregate(Sum("cnt", alias_name="cnt"))

    def _cast(t: pa.Table) -> pa.Table:
        return t.set_column(t.column_names.index("cnt"), "cnt",
                            t.column("cnt").cast(pa.int64()))

    return out.map_batches(_cast, batch_format="pyarrow")


def bigram_counts(ds, col: str = "text"):
    """Global adjacent-word-pair frequencies: Dataset of (bigram, cnt).

    Bigrams are built vectorized from the batch's flattened word array:
    element-wise join of W[:-1] and W[1:], with cross-document pairs
    masked out by doc-boundary positions. Same combiner shape as
    term_counts."""

    def _partial(t: pa.Table) -> pa.Table:
        flat, lens = _split_words(t.column(col))
        n = len(flat)
        if n < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        W = flat
        joined = pc.binary_join_element_wise(
            W.slice(0, n - 1), W.slice(1), " ")
        # positions i where (i, i+1) straddles a doc boundary
        ends = np.cumsum(lens[lens > 0])
        mask = np.ones(n - 1, bool)
        mask[ends[:-1] - 1] = False  # last word of each doc (not final)
        return _partial_counts(joined.filter(pa.array(mask)), "bigram")

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    out = partials.groupby("bigram").aggregate(Sum("cnt", alias_name="cnt"))

    def _cast(t: pa.Table) -> pa.Table:
        return t.set_column(t.column_names.index("cnt"), "cnt",
                            t.column("cnt").cast(pa.int64()))

    return out.map_batches(_cast, batch_format="pyarrow")


def top_terms(ds, k: int = 20, col: str = "text"):
    """Top-k terms by global count (ties → lexicographic)."""
    return term_counts(ds, col).sort(
        ["cnt", "word"], descending=[True, False]).limit(k)


def top_bigrams(ds, k: int = 15, col: str = "text"):
    """Top-k adjacent word pairs by global count."""
    return bigram_counts(ds, col).sort(
        ["cnt", "bigram"], descending=[True, False]).limit(k)


def _doc_term_counts(t: pa.Table, col: str) -> pa.Table:
    """(doc_id, term, tf) for one batch — no shuffle needed: each doc
    is atomic within its block."""
    flat, lens = _split_words(t.column(col))
    ids = t.column("doc_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    rep = np.repeat(ids, lens)
    tt = pa.table({"doc_id": pa.array(rep, pa.int64()),
                   "term": flat})
    agg = tt.group_by(["doc_id", "term"]).aggregate([("term", "count")])
    return pa.table({
        "doc_id": agg.column("doc_id"),
        "term": agg.column("term"),
        "tf": agg.column("term_count").cast(pa.int64()),
    })


class _TfidfScorer:
    """Score per-doc term counts against the broadcast DF table and
    keep each doc's top-k. DF map built once per actor from the
    object-store ref (zero re-ship per batch)."""

    def __init__(self, df_ref, n_docs: int, k: int):
        df_tab = ray.get(df_ref) if isinstance(df_ref, ray.ObjectRef) \
            else df_ref
        # vocab kept as an Arrow array per actor: the per-batch DF
        # lookup is one pc.index_in + numpy take, no Python dict on
        # the hot path (the _UnigramScorer pattern)
        self.vocab = df_tab.column("term").combine_chunks()
        self.dfs = df_tab.column("df").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # lexicographic rank per vocab entry precomputed once so the
        # per-batch tie-break lexsort runs on int keys, not an
        # object-dtype string column (Python sorted() compares code
        # points exactly like the np object lexsort it replaces)
        vterms = self.vocab.to_pylist()
        by_lex = sorted(range(len(vterms)), key=vterms.__getitem__)
        self.term_rank = np.empty(len(vterms), np.int64)
        self.term_rank[by_lex] = np.arange(len(vterms))
        self.n_docs = float(n_docs)
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "tfidf": pa.array([], pa.float64())})
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        terms_col = t.column("term").combine_chunks()
        tf = t.column("tf").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        idx = pc.index_in(terms_col, value_set=self.vocab)
        if idx.null_count:
            raise ValueError("term absent from the broadcast DF table")
        idxn = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = self.dfs[idxn]
        score = duckdb_round(tf * np.log(self.n_docs / dfv), 6)
        # top-k per doc by the TF-IDF score itself (descending), ties
        # broken (tf desc, df asc, term asc). Ranking on the ROUNDED
        # score keeps the order bit-identical to the SQL oracle's
        # ORDER BY ROUND(...) even when numpy log and DuckDB ln differ
        # in the last ulp.
        order = np.lexsort((self.term_rank[idxn], dfv, -tf, -score,
                            ids))
        ids_s = ids[order]
        starts = np.concatenate([[0], np.flatnonzero(
            ids_s[1:] != ids_s[:-1]) + 1])
        rank = np.arange(len(ids_s)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(ids_s)]])))
        keep = order[rank < self.k]
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "term": terms_col.take(pa.array(keep)),
            "tf": pa.array(tf[keep].astype(np.int64), pa.int64()),
            "tfidf": pa.array(score[keep], pa.float64()),
        })


def tfidf_top_terms(ds, k: int = 3, col: str = "text"):
    """Per-document TF-IDF keyword extraction: Dataset of
    (doc_id, term, tf, tfidf) — each doc's top-k terms by
    tf·ln(N/df), ties broken deterministically by (tf desc, df asc,
    term asc).

    Plan: per-batch (doc_id, term, tf) [no shuffle] → DF via the
    term-level combiner groupby [vocab-sized shuffle] → DF broadcast
    via ray.put → per-batch score + top-k [no shuffle]. The corpus is
    read once and the tc Dataset reused for both the DF build and the
    scoring pass (object-store materialize, spills under pressure).

    Scale note: the broadcast DF table is vocabulary-sized; for
    corpora whose distinct-term count outgrows worker memory, replace
    the broadcast stage with ``shuffle_join(tc, df, on="term")`` —
    everything else is unchanged."""
    n_docs = ds.count()
    tc = ds.map_batches(lambda t: _doc_term_counts(t, col),
                        batch_format="pyarrow").materialize()

    def _df_partial(t: pa.Table) -> pa.Table:
        # rows are already distinct (doc, term) pairs → count per term
        agg = t.group_by("term").aggregate([("term", "count")])
        return pa.table({
            "term": agg.column("term"),
            "df": agg.column("term_count").cast(pa.int64()),
        })

    df_ds = (tc.map_batches(_df_partial, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("df", alias_name="df")))
    df_tab = pa.Table.from_pandas(df_ds.to_pandas(), preserve_index=False) \
        .replace_schema_metadata(None)
    df_ref = ray.put(df_tab)

    return tc.map_batches(
        _TfidfScorer, fn_constructor_args=(df_ref, n_docs, k),
        batch_format="pyarrow", concurrency=(1, 8))


def dup_ngram_stats(ds, n: int = 5, col: str = "text"):
    """Cross-document duplicate n-gram contamination per doc:
    (doc_id, n_ngrams, n_dup_ngrams, dup_ngram_frac), where an n-gram
    INSTANCE is duplicated iff its n-gram occurs in ≥2 distinct
    documents corpus-wide (within-doc repeats alone don't count) —
    the Gopher/CCNet-style duplicate-n-gram signal used to score
    boilerplate and cross-shard contamination.

    Plan (n-grams never leave their batch as strings — only 61-bit
    polynomial hashes move; collision odds ~|ngrams|²/2⁶¹):

      docs → map_batches            (doc_id, ngh, inst) per-doc counts
                                    + one (doc_id, −1, 0) row per doc so
                                    zero-n-gram docs stay in the output
           → groupby(ngh).sum       document frequency  [vocab shuffle]
           → filter df ≥ 2          dup-hash table
      classify: when the dup-hash table is broadcast-sized (≤
      BROADCAST_MAX_DUP_HASHES, known exactly — it's materialized),
      ship the sorted hash array once via ray.put and mark each inst
      row in place (searchsorted per batch, no join shuffle); the
      per-doc totals fall out of the SAME pass (n_ngrams = Σ inst per
      doc), so ONE groupby(doc_id).sum finishes the query. When the
      dup table exceeds the broadcast bound (truly vocab-scale dup
      sets) the classify step falls back to the co-bucketed
      shuffle_join — same results, one extra exchange.

    The per-(doc, hash) inst table is object-store-materialized once
    — it is hash-sized, a small fraction of the text bytes — and the
    input is read exactly once."""
    from ray.data.aggregate import Sum as _Sum

    from bento_ray.stages.join import shuffle_join

    def _explode(t: pa.Table):
        # the shared explode (one definition of the polynomial /
        # boundary mask); this caller wants doc IDs per instance,
        # not row indices
        ngh, inst_row, ids, totals, _ = _ngram_hash_explode(t, col, n)
        return ngh, ids[inst_row], ids, totals

    def _inst(t: pa.Table) -> pa.Table:
        ngh, inst_doc, ids, _ = _explode(t)
        tt = pa.table({"doc_id": pa.array(inst_doc, pa.int64()),
                       "ngh": pa.array(ngh, pa.int64())})
        agg = tt.group_by(["doc_id", "ngh"]).aggregate([("ngh", "count")])
        # one sentinel row per doc (ngh = −1 is below every 61-bit
        # hash) so docs with < n words reach the final per-doc sum
        return pa.table({
            "doc_id": pa.concat_arrays(
                [agg.column("doc_id").combine_chunks(),
                 pa.array(ids, pa.int64())]),
            "ngh": pa.concat_arrays(
                [agg.column("ngh").combine_chunks(),
                 pa.array(np.full(len(ids), -1), pa.int64())]),
            "inst": pa.concat_arrays(
                [agg.column("ngh_count").cast(pa.int64()).combine_chunks(),
                 pa.array(np.zeros(len(ids), np.int64))]),
        })

    inst = ds.map_batches(_inst, batch_format="pyarrow").materialize()

    def _df_partial(t: pa.Table) -> pa.Table:
        # inst rows are distinct (doc, ngh) pairs → count per hash
        t = t.filter(pc.greater_equal(t.column("ngh"), 0))  # drop sentinels
        agg = t.group_by("ngh").aggregate([("ngh", "count")])
        return pa.table({
            "ngh": agg.column("ngh"),
            "dfp": agg.column("ngh_count").cast(pa.int64()),
        })

    # materialized: the classify step needs its exact size (and the
    # shuffle-join fallback calls .schema(), which otherwise EXECUTES
    # the sub-plan twice — measured 3.9s of duplicate work at sf0.1)
    dup_hashes = (inst.map_batches(_df_partial, batch_format="pyarrow")
                  .groupby("ngh").aggregate(_Sum("dfp", alias_name="df"))
                  .map_batches(
                      lambda t: t.filter(
                          pc.greater_equal(t.column("df"), 2))
                      .select(["ngh"]),
                      batch_format="pyarrow")).materialize()

    def _final(t: pa.Table) -> pa.Table:
        tot = t.column("n_ngrams").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dup = t.column("n_dup_ngrams").fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        frac = duckdb_round(dup / np.maximum(tot, 1), 6)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_ngrams": pa.array(tot, pa.int64()),
            "n_dup_ngrams": pa.array(dup, pa.int64()),
            "dup_ngram_frac": pa.array(frac, pa.float64()),
        })

    if dup_hashes.count() <= BROADCAST_MAX_DUP_HASHES:
        # broadcast classify: one sorted uint64 array ships once; each
        # inst batch marks dup membership by searchsorted and
        # pre-combines per doc, so the ONLY remaining exchange is the
        # per-doc sum (≤ one row per doc per block)
        arr = np.sort(np.concatenate(
            [b["ngh"] for b in
             dup_hashes.iter_batches(batch_format="numpy")]
            or [np.empty(0, np.int64)]).astype(np.int64))
        dup_ref = ray.put(arr)

        def _classify(t: pa.Table) -> pa.Table:
            dup_arr = ray.get(dup_ref)
            ngh = t.column("ngh").to_numpy(zero_copy_only=False)
            cnt = t.column("inst").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(dup_arr, ngh)
            is_dup = (pos < len(dup_arr)) & (dup_arr[
                np.minimum(pos, max(len(dup_arr) - 1, 0))] == ngh) \
                if len(dup_arr) else np.zeros(len(ngh), bool)
            tt = pa.table({
                "doc_id": t.column("doc_id"),
                "n_ngrams": pa.array(cnt.astype(np.int64)),
                "n_dup_ngrams": pa.array(
                    np.where(is_dup, cnt, 0).astype(np.int64)),
            })
            agg = tt.group_by("doc_id").aggregate(
                [("n_ngrams", "sum"), ("n_dup_ngrams", "sum")])
            return pa.table({
                "doc_id": agg.column("doc_id"),
                "n_ngrams": agg.column("n_ngrams_sum"),
                "n_dup_ngrams": agg.column("n_dup_ngrams_sum")})

        out = (inst.map_batches(_classify, batch_format="pyarrow")
               .groupby("doc_id")
               .aggregate(_Sum("n_ngrams", alias_name="n_ngrams"),
                          _Sum("n_dup_ngrams",
                               alias_name="n_dup_ngrams")))
        return out.map_batches(_final, batch_format="pyarrow")

    # vocab-scale dup set: co-bucketed shuffle join (the fallback
    # path — Ray's Dataset.join aggregator mishandles sparse right
    # sides, see stages/join.py)
    dup_counts = (shuffle_join(
        inst.filter(expr="ngh >= 0"), dup_hashes, on="ngh",
        how="inner", force_fallback=True)
        .groupby("doc_id")
        .aggregate(_Sum("inst", alias_name="n_dup_ngrams"))).materialize()
    totals = (inst.groupby("doc_id")
              .aggregate(_Sum("inst", alias_name="n_ngrams")))
    out = shuffle_join(totals, dup_counts, on="doc_id", how="left",
                       force_fallback=True)
    return out.map_batches(_final, batch_format="pyarrow")


def stratified_sample(ds, group_col: str, n_per_group: int,
                      key: str = "doc_id"):
    """Deterministic per-group quota sample: the n_per_group rows with
    the SMALLEST Knuth-hash of ``key`` within each group (ties broken
    by key) — reproducible across runs/engines/cluster sizes, and the
    standard per-language quota step of a training-data mix.

    Combiner-shaped: each batch pre-prunes to its local per-group
    top-n (one vectorized lexsort), so the groupby shuffle moves at
    most n_per_group rows per group per block — never the corpus."""

    def _rank_hash(t: pa.Table) -> np.ndarray:
        ids = t.column(key).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        return (ids * _KNUTH) % _M32

    def _local_topn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        h = _rank_hash(t)
        g = t.column(group_col).to_pandas().astype(str).to_numpy()
        ids = t.column(key).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, g))
        gs = g[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(gs[1:] != gs[:-1]) + 1])
        rank = np.arange(len(gs)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(gs)]])))
        return t.take(pa.array(order[rank < n_per_group]))

    pruned = ds.map_batches(_local_topn, batch_format="pyarrow")
    return (pruned.groupby(group_col)
            .map_groups(_local_topn, batch_format="pyarrow"))


def hash_sample(ds, denom: int = 10, residue: int = 3,
                key: str = "doc_id"):
    """Deterministic 1/denom subsample by Knuth multiplicative hash of
    an integer key — reproducible across runs, engines and cluster
    sizes (no RNG state), expressible in SQL for cross-engine parity:
    ``(key * 2654435761) % 2^32 % denom == residue``."""
    d = np.uint64(denom)
    r = np.uint64(residue)

    def _f(t: pa.Table) -> pa.Table:
        ids = t.column(key).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h = (ids * _KNUTH) % _M32 % d
        return t.filter(pa.array(h == r))

    return ds.map_batches(_f, batch_format="pyarrow")

def seeded_shuffle(ds, seed: int = 42, key: str = "doc_id",
                   out_col: str = "shuffle_key"):
    """Deterministic global shuffle for training-data ordering: append
    a splitmix64 key derived from ``(row key) XOR mix(seed)`` and sort
    the dataset by it. Unlike ``random_shuffle`` the order is a pure
    function of (key, seed) — reproducible across runs, engines and
    cluster sizes, different per epoch by bumping the seed — and the
    sort is Ray's distributed range-partitioned exchange (one
    all-to-all, the unavoidable cost of a global order). Keys fold to
    61 bits so they stay BIGINT-exact in SQL and parquet."""
    from bento_ray.textops.dedup import _mix64

    const = np.uint64(_mix64(np.array([seed], np.uint64))[0])
    mask = np.uint64((1 << 61) - 1)

    def _key(t: pa.Table) -> pa.Table:
        ids = t.column(key).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        k = _mix64(ids ^ const) % mask
        return t.append_column(out_col, pa.array(k.astype(np.int64)))

    return ds.map_batches(_key, batch_format="pyarrow").sort(out_col)


def weighted_mix(ds, rates: dict[str, float], *, source_col: str = "source",
                 key: str = "doc_id", default_rate: float = 0.0,
                 scale: int = 10_000):
    """Training-mix construction: keep a deterministic per-source
    fraction of rows (e.g. {'wiki': 1.0, 'web': 0.25, 'forums': 0.1})
    via the Knuth multiplicative hash of an integer key — the same
    reproducible-across-engines sampling as ``hash_sample``, but with
    the threshold looked up per source. Rates quantize to
    ``round(rate·scale)`` so the comparison is integer-exact in SQL.
    The rate table broadcasts once via ray.put; the filter is one
    vectorized hash + lookup pass per batch — no shuffle."""
    import ray

    q = {s: int(round(r * scale)) for s, r in rates.items()}
    dflt = int(round(default_rate * scale))
    ref = ray.put((q, dflt))

    def _f(t: pa.Table) -> pa.Table:
        qd, dq = ray.get(ref)
        ids = t.column(key).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h = ((ids * _KNUTH) % _M32 % np.uint64(scale)).astype(np.int64)
        thr = t.column(source_col).to_pandas().map(qd).fillna(dq) \
            .to_numpy(np.int64)
        return t.filter(pa.array(h < thr))

    return ds.map_batches(_f, batch_format="pyarrow")


def _ngram_hash_explode(t: pa.Table, col: str, n: int,
                        with_words: bool = False):
    """Shared n-gram hash explode (the dup_ngram_stats polynomial):
    per-batch (ngram-hash instances, owning doc row index, doc ids,
    per-doc n-gram totals, window start positions within each doc[,
    flat word array + per-doc word counts when ``with_words``]).
    Hashes are 61-bit polynomial folds of the FNV word hashes —
    n-grams move as integers, never strings."""
    from bento_ray.textops.quality import word_hashes

    M = np.uint64((1 << 61) - 1)
    flat, lens = _split_words(t.column(col))
    ids = t.column("doc_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    hs = word_hashes(flat) if len(flat) else np.empty(0, np.uint64)
    total = len(hs)
    if total >= n:
        out = np.zeros(total - n + 1, np.uint64)
        for j in range(n):
            out = (out * np.uint64(1_000_003)
                   + hs[j:total - n + 1 + j]) % M
        doc_of = np.repeat(np.arange(len(lens)), lens)
        valid = doc_of[:total - n + 1] == doc_of[n - 1:]
        flat_idx = np.flatnonzero(valid)
        ngh = out[valid].astype(np.int64)
        inst_row = doc_of[flat_idx]
        word_starts = np.concatenate(
            [[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        pos = flat_idx - word_starts[inst_row]
    else:
        ngh = np.empty(0, np.int64)
        inst_row = np.empty(0, np.int64)
        pos = np.empty(0, np.int64)
    base = (ngh, inst_row, ids, np.maximum(lens - n + 1, 0), pos)
    return (*base, flat, lens) if with_words else base


class _ContaminationScorer:
    """Score each doc's n-gram instances against the broadcast eval
    n-gram hash set (sorted int64). Set fetched once per actor from
    the object store; per batch it's one searchsorted + bincount."""

    def __init__(self, eval_ref, n: int, col: str):
        self.ev = ray.get(eval_ref) if isinstance(
            eval_ref, ray.ObjectRef) else eval_ref
        self.n = n
        self.col = col

    def __call__(self, t: pa.Table) -> pa.Table:
        ngh, inst_row, ids, totals, _ = _ngram_hash_explode(
            t, self.col, self.n)
        if len(ngh) and len(self.ev):
            pos = np.searchsorted(self.ev, ngh)
            hit = self.ev[np.clip(pos, 0, len(self.ev) - 1)] == ngh
            n_overlap = np.bincount(inst_row[hit], minlength=len(ids)) \
                .astype(np.int64)
        else:
            n_overlap = np.zeros(len(ids), np.int64)
        from bento_ray.util import duckdb_round
        frac = duckdb_round(n_overlap / np.maximum(totals, 1), 6)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_ngrams": pa.array(totals.astype(np.int64), pa.int64()),
            "n_overlap": pa.array(n_overlap, pa.int64()),
            "overlap_frac": pa.array(frac, pa.float64()),
        })


def decontaminate(ds, eval_ds, n: int = 8, col: str = "text"):
    """Benchmark decontamination (the GPT-3 appendix-C / C4 step):
    per-doc overlap of n-gram instances against an evaluation corpus,
    as (doc_id, n_ngrams, n_overlap, overlap_frac). A training run
    drops docs whose overlap_frac exceeds its threshold; emitting the
    scores keeps the policy choice out of the operator.

    Plan: the eval side (benchmark suites — orders of magnitude
    smaller than the corpus) explodes to DISTINCT n-gram hashes per
    batch, driver-uniques to one sorted int64 array and broadcasts
    via ray.put; the corpus side is a single stateless actor-pool
    pass (searchsorted membership + bincount per batch) — no shuffle
    at all. Swap the broadcast for ``shuffle_join`` on ``ngh`` only
    if the eval n-gram set itself outgrows worker RAM (it does not
    for any real benchmark suite)."""

    def _eval_partial(t: pa.Table) -> pa.Table:
        ngh, _, _, _, _ = _ngram_hash_explode(t, col, n)
        return pa.table({"ngh": pa.array(np.unique(ngh), pa.int64())})

    parts = [b.column("ngh").to_numpy(zero_copy_only=False)
             for b in eval_ds.map_batches(
                 _eval_partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    ev = np.unique(np.concatenate(parts)) if parts \
        else np.empty(0, np.int64)
    ev_ref = ray.put(ev)

    return ds.map_batches(
        _ContaminationScorer, fn_constructor_args=(ev_ref, n, col),
        batch_format="pyarrow", concurrency=(1, 8))


class _UnigramScorer:
    """Per-doc mean negative log-probability under the broadcast
    unigram LM. The LM ships as (vocab Arrow array, micro-nat int64
    costs): token lookup is one zero-copy ``pc.index_in`` hash pass
    per batch, and the per-doc sum is an INTEGER bincount — exact in
    float64 below 2^53, hence order-independent and bit-identical to
    the SQL oracle's integer SUM."""

    def __init__(self, lm_ref, col: str, keep_cols=()):
        words, micro = ray.get(lm_ref) if isinstance(
            lm_ref, ray.ObjectRef) else lm_ref
        self.words = words
        self.micro = micro
        self.col = col
        self.keep_cols = tuple(keep_cols)

    def __call__(self, t: pa.Table) -> pa.Table:
        from bento_ray.util import duckdb_round

        flat, lens = _split_words(t.column(self.col))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(flat):
            idx = pc.index_in(flat, value_set=self.words) \
                .fill_null(-1).to_numpy(zero_copy_only=False)
            cost = np.where(idx >= 0, self.micro[idx], 0)
            doc_of = np.repeat(np.arange(len(lens)), lens)
            sums = np.bincount(doc_of, weights=cost,
                               minlength=len(lens))
        else:
            sums = np.zeros(len(lens), np.float64)
        score = np.where(
            lens > 0,
            duckdb_round(-sums / 1e6 / np.maximum(lens, 1), 6), 0.0)
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(lens.astype(np.int64), pa.int64()),
            "neg_logprob": pa.array(score, pa.float64()),
        }
        for c in self.keep_cols:
            cols[c] = t.column(c)
        return pa.table(cols)


def unigram_logprob(ds, col: str = "text", keep_cols=()):
    """CCNet-style language-model quality signal, self-trained: fit a
    unigram LM on the corpus (token frequencies), then score every doc
    with its mean negative log-probability in nats — low = common
    fluent text, high = rare-token noise. Returns
    (doc_id, n_words, neg_logprob).

    Cross-engine float discipline: per-token costs are quantized to
    integer micro-nats ONCE on the driver
    (round(ln(count/N)·1e6), DuckDB ROUND convention), so the per-doc
    reduction is an integer sum — associative, order-independent, and
    bit-identical between Ray and the SQL oracle regardless of
    summation order.

    Plan: token counts via the term_counts combiner [vocab-sized
    shuffle] → vocab-sized LM table collected once and broadcast via
    ray.put → one stateless actor-pool scoring pass [no shuffle].
    Swap the broadcast for ``shuffle_join`` on the token when the
    vocabulary outgrows worker RAM."""
    from bento_ray.util import duckdb_round

    vocab = term_counts(ds, col).to_pandas()
    cnts = vocab["cnt"].to_numpy(np.int64)
    n_total = float(cnts.sum())
    micro = duckdb_round(
        np.log(cnts / n_total) * 1e6, 0).astype(np.int64) \
        if len(cnts) else np.empty(0, np.int64)
    words = pa.array(vocab["word"].tolist(), pa.string())
    lm_ref = ray.put((words, micro))

    return ds.map_batches(
        _UnigramScorer, fn_constructor_args=(lm_ref, col, keep_cols),
        batch_format="pyarrow", concurrency=(1, 8))


def ccnet_buckets(ds, col: str = "text", lang_col: str = "lang"):
    """CCNet-style per-language perplexity bucketing: score every doc
    with the self-trained unigram LM (:func:`unigram_logprob`), then
    split each language into head / middle / tail thirds by score.
    Buckets use the cumulative-threshold rule (t1 = smallest score
    with cum-count ≥ ⌈n/3⌉, t2 at ⌈2n/3⌉; bucket by score ≤ t1 / ≤ t2)
    — a pure function of the (score, count) histogram, so score TIES
    are handled identically by any engine (no per-doc rank needed).

    Scale shape: the scored table is a 4-narrow-column projection
    (id, lang, n_words, score — no text) and is materialized once to
    feed two consumers; the histogram pass is a per-(lang, score)
    count combiner — the exchange and the driver table are bounded by
    distinct scores (swap in sketches.kll_quantiles per lang when
    even that outgrows the driver); thresholds broadcast as a tiny
    per-lang dict and assignment is one stateless pass.

    Returns (lang, bucket, n_docs, avg_neg_logprob)."""
    from ray.data.aggregate import Count as ACount
    from ray.data.aggregate import Mean as AMean
    from ray.data.aggregate import Sum as ASum

    from bento_ray.util import duckdb_round

    sc = unigram_logprob(ds, col, keep_cols=(lang_col,)).materialize()

    def _hist(t: pa.Table) -> pa.Table:
        agg = (pa.table({"lang": t.column(lang_col),
                         "nl": t.column("neg_logprob")})
               .group_by(["lang", "nl"]).aggregate([("nl", "count")]))
        return pa.table({"lang": agg.column("lang"),
                         "nl": agg.column("nl"),
                         "n": agg.column("nl_count").cast(pa.int64())})

    hist = (sc.map_batches(_hist, batch_format="pyarrow")
            .groupby(["lang", "nl"]).aggregate(ASum("n", alias_name="n"))
            .to_pandas())
    th: dict[str, tuple[float, float]] = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("nl")
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        n1, n2 = -(-n // 3), -(-2 * n // 3)
        vals = g["nl"].to_numpy()
        th[str(lang)] = (float(vals[np.searchsorted(cum, n1)]),
                         float(vals[np.searchsorted(cum, n2)]))
    th_ref = ray.put(th)

    def _assign(t: pa.Table) -> pa.Table:
        d = ray.get(th_ref)
        langs = t.column(lang_col).to_pandas()
        t1 = langs.map({k: v[0] for k, v in d.items()}).to_numpy(np.float64)
        t2 = langs.map({k: v[1] for k, v in d.items()}).to_numpy(np.float64)
        nl = t.column("neg_logprob").to_numpy()
        bucket = np.where(nl <= t1, "head",
                          np.where(nl <= t2, "middle", "tail"))
        return pa.table({"lang": t.column(lang_col),
                         "bucket": pa.array(bucket, pa.string()),
                         "neg_logprob": t.column("neg_logprob")})

    out = (sc.map_batches(_assign, batch_format="pyarrow")
           .groupby(["lang", "bucket"])
           .aggregate(ACount(alias_name="n_docs"),
                      AMean("neg_logprob", alias_name="avg_neg_logprob")))

    def _round(t: pa.Table) -> pa.Table:
        v = duckdb_round(t.column("avg_neg_logprob").to_numpy(
            zero_copy_only=False), 4)
        i = t.column_names.index("avg_neg_logprob")
        return t.set_column(i, "avg_neg_logprob", pa.array(v, pa.float64()))

    return out.map_batches(_round, batch_format="pyarrow")


def _dsir_bucket_instances(t: pa.Table, col: str, n_buckets: int):
    """Hashed bag-of-ngrams feature instances (DSIR's representation):
    every unigram and adjacent-bigram occurrence, hashed into
    ``n_buckets`` buckets (the 61-bit n-gram polynomial % buckets).
    Returns (bucket ids per instance, owning doc row, doc ids)."""
    u_h, u_row, ids, _, _ = _ngram_hash_explode(t, col, 1)
    b_h, b_row, _, _, _ = _ngram_hash_explode(t, col, 2)
    bk = np.concatenate([u_h, b_h]) % n_buckets
    row = np.concatenate([u_row, b_row])
    return bk.astype(np.int64), row.astype(np.int64), ids


def _dsir_bucket_counts(ds, col: str, n_buckets: int) -> np.ndarray:
    """Dense per-bucket feature counts for a corpus. Combiner-shaped:
    each batch collapses to ≤ n_buckets (bucket, cnt) rows, the groupby
    sums bucket-sized partials, and the driver assembles one dense
    int64 vector (n_buckets ≤ ~100k ⇒ KBs — the distribution IS the
    model, and it is small by construction)."""

    def _partial(t: pa.Table) -> pa.Table:
        bk, _, _ = _dsir_bucket_instances(t, col, n_buckets)
        cnt = np.bincount(bk, minlength=n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz], pa.int64())})

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt"))
    dense = np.zeros(n_buckets, np.int64)
    for b in agg.iter_batches(batch_format="pyarrow"):
        dense[b.column("bucket").to_numpy(zero_copy_only=False)
              .astype(np.int64)] = \
            b.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    return dense


class _DsirScorer:
    """Per-doc DSIR importance weight under the broadcast log-ratio
    table: one bucket-hash pass + an integer bincount per batch. The
    λ table is fetched once per actor; with ``local_k`` set, each
    batch emits only its local top-k rows (weight desc, doc_id asc) so
    the downstream global sort sees ≤ k rows per block."""

    def __init__(self, lam_ref, col: str, n_buckets: int, local_k,
                 gumbel_seed=None):
        self.lam = ray.get(lam_ref) if isinstance(
            lam_ref, ray.ObjectRef) else lam_ref
        self.col = col
        self.n_buckets = n_buckets
        self.local_k = local_k
        self.gumbel_seed = gumbel_seed

    def __call__(self, t: pa.Table) -> pa.Table:
        bk, row, ids = _dsir_bucket_instances(t, self.col, self.n_buckets)
        if len(bk):
            # integer micro-nat weights; per-doc sums stay < 2^53 so
            # the float64 bincount accumulator is exact
            w = np.bincount(row, weights=self.lam[bk].astype(np.float64),
                            minlength=len(ids)).astype(np.int64)
            nf = np.bincount(row, minlength=len(ids)).astype(np.int64)
        else:
            w = np.zeros(len(ids), np.int64)
            nf = np.zeros(len(ids), np.int64)
        if self.gumbel_seed is not None:
            # Gumbel-top-k resampling (the paper's sampling step):
            # deterministic per-doc Gumbel noise from a splitmix64
            # finalizer over (doc_id, seed) — an affine Knuth mix is
            # NOT enough here: adjacent seeds would only rotate the
            # 32-bit ring, leaving small rankings unchanged. No RNG
            # state, reproducible across runs/engines/cluster sizes;
            # micro-nat quantized so the noised score stays int64.
            z = ids.astype(np.uint64) + np.uint64(
                (self.gumbel_seed * 0x9E3779B97F4A7C15) % (1 << 64))
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
            u = ((z >> np.uint64(11)).astype(np.float64) + 0.5) * 2.0**-53
            w = w + np.round(-np.log(-np.log(u)) * 1e6).astype(np.int64)
        if self.local_k is not None and len(ids) > self.local_k:
            order = np.lexsort((ids, -w))[:self.local_k]
            ids, nf, w = ids[order], nf[order], w[order]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_feats": pa.array(nf, pa.int64()),
            "micro_weight": pa.array(w, pa.int64()),
        })


def _dsir_lambda(ds, target, n_buckets: int, alpha: float, col: str):
    from bento_ray.util import duckdb_round

    cr = _dsir_bucket_counts(ds, col, n_buckets)
    ct = _dsir_bucket_counts(target, col, n_buckets)
    lam = duckdb_round(
        (np.log((ct + alpha) / (ct.sum() + alpha * n_buckets))
         - np.log((cr + alpha) / (cr.sum() + alpha * n_buckets))) * 1e6,
        0).astype(np.int64)
    return ray.put(lam)


def dsir_weights(ds, target, n_buckets: int = 10_000, alpha: float = 1.0,
                 col: str = "text"):
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every raw doc by how target-like its hashed bag-of-ngrams
    features are — λ_b = ln p_target(b) − ln p_raw(b) per bucket
    (Laplace-smoothed), doc weight = Σ instances λ_bucket. Returns
    (doc_id, n_feats, micro_weight).

    Cross-engine float discipline: λ is quantized to integer
    micro-nats ONCE on the driver (DuckDB ROUND convention), so the
    per-doc reduction is an integer sum — associative and
    order-independent, bit-identical to the SQL oracle.

    Plan: two bucket-count passes (combiner; shuffle ≤ n_buckets rows
    per block) → one dense λ array (~80 KB at the paper's 10k buckets)
    broadcast via ray.put → one stateless actor-pool scoring pass
    [no shuffle]."""
    lam_ref = _dsir_lambda(ds, target, n_buckets, alpha, col)
    return ds.map_batches(
        _DsirScorer, fn_constructor_args=(lam_ref, col, n_buckets, None),
        batch_format="pyarrow", concurrency=(1, 8))


def dsir_select(ds, target, k: int, n_buckets: int = 10_000,
                alpha: float = 1.0, col: str = "text",
                gumbel_seed: int | None = None):
    """DSIR data selection: the ``k`` raw docs with the highest
    importance weight (ties break to the smaller doc_id). With
    ``gumbel_seed`` set, this is the paper's Gumbel-top-k resampling
    (docs drawn ∝ their importance weight): per-doc Gumbel noise is
    derived deterministically from a splitmix64 hash of
    (doc_id, seed) and added in micro-nats, so the draw is
    reproducible with no RNG state shipped anywhere.

    Scale shape: scoring batches emit only their LOCAL top-k, so the
    global sort+limit ranks ≤ k rows per block instead of the corpus;
    at 100 TB that is a k×blocks exchange, not an all-to-all."""
    lam_ref = _dsir_lambda(ds, target, n_buckets, alpha, col)
    scored = ds.map_batches(
        _DsirScorer,
        fn_constructor_args=(lam_ref, col, n_buckets, k, gumbel_seed),
        batch_format="pyarrow", concurrency=(1, 8))
    return scored.sort(["micro_weight", "doc_id"],
                       descending=[True, False]).limit(k)


def _dup_window_hashes(ds, n: int, col: str):
    """Window hashes that occur in ≥2 DISTINCT docs corpus-wide, as a
    sorted int64 array broadcast via ray.put. Two-phase: per-batch
    distinct (doc, hash) pairs (a doc is atomic within its block, so
    batch-local distinct IS global) → groupby(hash) partial-sum →
    filter df ≥ 2. The collected set is the corpus's duplicated-window
    vocabulary — bounded by redundancy, not corpus size; swap the
    driver collect + broadcast for a shuffle_join on the hash when
    that vocabulary outgrows worker RAM."""
    from ray.data.aggregate import Sum as _Sum

    def _inst(t: pa.Table) -> pa.Table:
        ngh, inst_row, _, _, _ = _ngram_hash_explode(t, col, n)
        tt = pa.table({"d": pa.array(inst_row, pa.int64()),
                       "ngh": pa.array(ngh, pa.int64())})
        agg = tt.group_by(["d", "ngh"]).aggregate([("ngh", "count")])
        dfp = agg.group_by("ngh").aggregate([("ngh", "count")])
        return pa.table({
            "ngh": dfp.column("ngh"),
            "dfp": dfp.column("ngh_count").cast(pa.int64()),
        })

    df = (ds.map_batches(_inst, batch_format="pyarrow")
          .groupby("ngh").aggregate(_Sum("dfp", alias_name="df")))
    parts = [b.filter(pc.greater_equal(b.column("df"), 2))
             .column("ngh").to_numpy(zero_copy_only=False)
             for b in df.iter_batches(batch_format="pyarrow")]
    dup = np.sort(np.concatenate(parts)) if parts \
        else np.empty(0, np.int64)
    return ray.put(dup)


def _covered_mask(t: pa.Table, col: str, n: int, dup: np.ndarray):
    """Per-batch token-coverage machinery shared by the two span ops:
    → (ids, flat words, per-doc word counts, boolean covered-mask over
    the flat token index). Interval union is one vectorized
    delta-array cumsum (no per-window loop)."""
    ngh, inst_row, ids, _, pos, flat, lens = _ngram_hash_explode(
        t, col, n, with_words=True)
    total = int(lens.sum())
    covered = np.zeros(total + 1, np.int64)
    if len(ngh) and len(dup):
        at = dup[np.clip(np.searchsorted(dup, ngh), 0,
                         len(dup) - 1)] == ngh
        if at.any():
            starts = np.concatenate(
                [[0], np.cumsum(lens)[:-1]]).astype(np.int64)
            s = starts[inst_row[at]] + pos[at]   # flat start index
            np.add.at(covered, s, 1)
            np.add.at(covered, s + n, -1)
    mask = np.cumsum(covered[:-1]) > 0
    return ids, flat, lens, mask


def dup_window_coverage(ds, n: int = 8, col: str = "text"):
    """Span-level duplication signal (Lee et al. 2022, 'Deduplicating
    Training Data Makes Language Models Better' — the hash-window
    approximation of their suffix-array substring match): per doc, the
    fraction of TOKENS covered by at least one n-token window whose
    hash occurs in ≥2 distinct documents. Returns
    (doc_id, n_tokens, n_covered, covered_frac).

    Plan: dup-window vocabulary via the combiner two-phase (shuffle ∝
    distinct windows) → broadcast sorted hash set → one stateless
    scoring pass (searchsorted + delta-array interval union)."""
    from bento_ray.util import duckdb_round

    dup_ref = _dup_window_hashes(ds, n, col)

    class _Score:
        def __init__(self):
            self.dup = ray.get(dup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, _, lens, mask = _covered_mask(t, col, n, self.dup)
            doc_of = np.repeat(np.arange(len(lens)), lens)
            ncov = np.bincount(doc_of[mask], minlength=len(lens)) \
                .astype(np.int64) if len(mask) else \
                np.zeros(len(lens), np.int64)
            frac = duckdb_round(ncov / np.maximum(lens, 1), 6)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(lens.astype(np.int64), pa.int64()),
                "n_covered": pa.array(ncov, pa.int64()),
                "covered_frac": pa.array(frac, pa.float64()),
            })

    return ds.map_batches(_Score, batch_format="pyarrow",
                          concurrency=(1, 8))


def remove_dup_spans(ds, n: int = 8, col: str = "text"):
    """The APPLY step of span-level dedup: drop every token covered by
    a cross-document duplicated n-token window and re-join the
    remainder with single spaces. Returns
    (doc_id, clean_text, n_removed) — the text surgery is Arrow-native
    (ListArray over the kept flat words + one binary_join kernel), no
    per-doc Python string building."""
    dup_ref = _dup_window_hashes(ds, n, col)

    class _Clean:
        def __init__(self):
            self.dup = ray.get(dup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, flat, lens, mask = _covered_mask(t, col, n, self.dup)
            nd = len(lens)
            if len(mask):
                doc_of = np.repeat(np.arange(nd), lens)
                keep = ~mask
                kept_words = flat.filter(pa.array(keep))
                kept_per_doc = np.bincount(doc_of[keep], minlength=nd)
                removed = (lens - kept_per_doc).astype(np.int64)
            else:
                kept_words = flat
                kept_per_doc = np.zeros(nd, np.int64)
                removed = np.zeros(nd, np.int64)
            offsets = np.concatenate(
                [[0], np.cumsum(kept_per_doc)]).astype(np.int32)
            lists = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                kept_words.combine_chunks() if isinstance(
                    kept_words, pa.ChunkedArray) else kept_words)
            joined = pc.binary_join(lists, " ")
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "clean_text": joined,
                "n_removed": pa.array(removed, pa.int64()),
            })

    return ds.map_batches(_Clean, batch_format="pyarrow",
                          concurrency=(1, 8))


def sequence_packing(ds, seq_len: int = 512, col: str = "text",
                     id_col: str = "doc_id"):
    """Training-batch sequence packing: concatenate documents in
    ``id_col`` order and chunk into fixed ``seq_len``-token sequences;
    report per doc its global token offset and the first/last sequence
    it lands in (−1 sentinels for empty docs). This is the
    tokenize-and-pack step of an LLM data pipeline, and the
    distributed ORDERED PREFIX-SUM pattern:

      1. per-doc token counts (one vectorized pass, no shuffle);
      2. range-bucket partial sums (combiner) → the driver sees ONE
         row per bucket and computes bucket-prefix offsets;
      3. one groupby(bucket) exchange; each bucket sorts its own docs
         and adds the broadcast bucket prefix.

    Shuffle moves 2-int rows (never text); the driver holds only
    bucket count × 16 bytes. Buckets are doc-id ranges so packing is
    deterministic and independent of block layout."""
    from bento_ray.util import cluster_cpus, duckdb_round  # noqa: F401

    def _counts(t: pa.Table) -> pa.Table:
        _, lens = _split_words(t.column(col))
        return pa.table({
            id_col: t.column(id_col).cast(pa.int64()),
            "ntok": pa.array(lens.astype(np.int64), pa.int64()),
        })

    counts = ds.map_batches(_counts, batch_format="pyarrow") \
        .materialize()
    max_id = counts.max(id_col)
    n_buckets = max(1, 64 * cluster_cpus())
    width = max(1, (int(max_id) + n_buckets) // n_buckets)

    def _bucket_partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        b = ids // width
        s = np.bincount(b, weights=t.column("ntok").to_numpy(
            zero_copy_only=False).astype(np.float64))
        nz = np.flatnonzero(s)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "bsum": pa.array(s[nz].astype(np.int64),
                                          pa.int64())})

    from ray.data.aggregate import Sum as _Sum

    bsums = counts.map_batches(_bucket_partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(_Sum("bsum", alias_name="bsum")) \
        .take_all()
    bmap = {int(r["bucket"]): int(r["bsum"]) for r in bsums}
    prefix = np.zeros(n_buckets + 1, np.int64)
    acc = 0
    for b in range(n_buckets):
        prefix[b] = acc
        acc += bmap.get(b, 0)
    prefix_ref = ray.put(prefix)

    def _add_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(ids // width, pa.int64()))

    def _within(g: pa.Table) -> pa.Table:
        pre = ray.get(prefix_ref)
        order = np.argsort(g.column(id_col).to_numpy(
            zero_copy_only=False), kind="stable")
        g = g.take(pa.array(order))
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        ntok = g.column("ntok").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = int(g.column("bucket")[0].as_py())
        off = pre[b] + np.concatenate([[0], np.cumsum(ntok)[:-1]])
        end = off + ntok
        first = np.where(ntok > 0, off // seq_len, -1)
        lastq = np.where(ntok > 0, (end - 1) // seq_len, -1)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(ntok, pa.int64()),
            "token_offset": pa.array(off.astype(np.int64), pa.int64()),
            "first_seq": pa.array(first.astype(np.int64), pa.int64()),
            "last_seq": pa.array(lastq.astype(np.int64), pa.int64()),
        })

    return counts.map_batches(_add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(_within, batch_format="pyarrow")


class _BigramScorer:
    """Per-doc mean negative log-probability under the broadcast
    BIGRAM LM with stupid backoff. The LM ships as three aligned
    structures: (vocab Arrow array, unigram micro-nat costs,
    sorted packed bigram keys + bigram micro-nat costs). Per batch:
    one ``pc.index_in`` vocab pass, one searchsorted over the packed
    bigram keys, one integer bincount — order-independent and
    bit-identical to the SQL oracle's integer SUM."""

    BACKOFF_MICRO = -916291          # round(ln(0.4) * 1e6)

    def __init__(self, lm_ref, col: str):
        import ray as _ray

        lm = _ray.get(lm_ref) if isinstance(lm_ref, _ray.ObjectRef) \
            else lm_ref
        (self.words, self.uni_micro, self.bi_keys, self.bi_micro,
         self.oov_micro) = lm
        self.col = col

    def __call__(self, t: pa.Table) -> pa.Table:
        from bento_ray.util import duckdb_round

        flat, lens = _split_words(t.column(self.col))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(flat)
        if n:
            idx = pc.index_in(flat, value_set=self.words) \
                .fill_null(-1).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            doc_of = np.repeat(np.arange(len(lens)), lens)
            V = np.int64(len(self.words))
            first = np.zeros(n, bool)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            first[starts[lens > 0]] = True
            def _uni(i: np.ndarray) -> np.ndarray:
                # out-of-vocabulary tokens (possible when the LM is
                # trained on a subset) pay the OOV floor cost
                return np.where(i >= 0, self.uni_micro[np.maximum(i, 0)],
                                self.oov_micro)

            cost = np.empty(n, np.int64)
            cost[first] = _uni(idx[first])
            trans = ~first
            a, b = idx[np.flatnonzero(trans) - 1], idx[trans]
            # OOV on either side can never be a seen bigram; b == -1
            # would otherwise alias key (a-1)*V + (V-1)
            known = (a >= 0) & (b >= 0)
            key = np.where(known, a * V + np.maximum(b, 0), -1)
            if len(self.bi_keys):
                pos = np.searchsorted(self.bi_keys, key)
                pos_safe = np.minimum(pos, len(self.bi_keys) - 1)
                hit = known & (self.bi_keys[pos_safe] == key)
                bi_cost = self.bi_micro[pos_safe]
            else:
                hit = np.zeros(len(key), bool)
                bi_cost = np.zeros(len(key), np.int64)
            cost[trans] = np.where(
                hit, bi_cost, self.BACKOFF_MICRO + _uni(b))
            sums = np.bincount(doc_of, weights=cost, minlength=len(lens))
        else:
            sums = np.zeros(len(lens), np.float64)
        score = np.where(
            lens > 0,
            duckdb_round(-sums / 1e6 / np.maximum(lens, 1), 6), 0.0)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(lens.astype(np.int64), pa.int64()),
            "neg_logprob2": pa.array(score, pa.float64()),
        })


def bigram_logprob(ds, col: str = "text", train=None):
    """Order-2 upgrade of :func:`unigram_logprob` (the CCNet-style
    quality signal): score every doc with a self-trained BIGRAM LM
    under stupid backoff (Brants et al. 2007) —
    cost(w_i | w_{i-1}) = ln(c2(a,b)/c1(a)) when the bigram was seen,
    else ln(0.4) + ln(c1(b)/N); the first token pays its unigram
    cost. All costs quantized to integer micro-nats on the driver
    (same discipline as the unigram LM) so both engines reduce an
    identical integer sum.

    ``train`` (default: ``ds`` itself) is the corpus the LM fits on —
    pass a subset (e.g. one language) to score out-of-domain docs;
    out-of-vocabulary tokens then pay the OOV floor cost
    round(ln(1/N)·1e6) and unseen bigrams take the backoff branch.

    Plan: TWO combiner passes (term_counts + bigram_counts — both
    vocab-bounded shuffles) → the LM collected once, packed to
    (sorted a·V+b int64 keys, micro costs) and broadcast via ray.put
    → one stateless scoring pass (index_in + searchsorted + bincount,
    no shuffle). Swap the broadcast for a shuffle_join on the packed
    key when the bigram table outgrows worker RAM."""
    from bento_ray.util import duckdb_round

    if train is None:
        train = ds
    vocab = term_counts(train, col).to_pandas().sort_values("word") \
        .reset_index(drop=True)
    cnts = vocab["cnt"].to_numpy(np.int64)
    n_total = float(cnts.sum())
    uni_micro = duckdb_round(
        np.log(cnts / n_total) * 1e6, 0).astype(np.int64) \
        if len(cnts) else np.empty(0, np.int64)
    words = pa.array(vocab["word"].tolist(), pa.string())
    w2i = {w: i for i, w in enumerate(vocab["word"].tolist())}

    big = bigram_counts(train, col).to_pandas()
    V = np.int64(len(words))
    if len(big):
        parts = big["bigram"].str.split(" ", n=1, expand=True)
        a = parts[0].map(w2i).to_numpy(np.int64)
        b = parts[1].map(w2i).to_numpy(np.int64)
        c2 = big["cnt"].to_numpy(np.int64)
        micro2 = duckdb_round(
            np.log(c2 / cnts[a].astype(np.float64)) * 1e6, 0) \
            .astype(np.int64)
        keys = a * V + b
        order = np.argsort(keys)
        bi_keys, bi_micro = keys[order], micro2[order]
    else:
        bi_keys = np.empty(0, np.int64)
        bi_micro = np.empty(0, np.int64)

    oov_micro = int(duckdb_round(
        np.array([np.log(1.0 / max(n_total, 1.0)) * 1e6]), 0)[0])
    lm_ref = ray.put((words, uni_micro, bi_keys, bi_micro, oov_micro))
    return ds.map_batches(
        _BigramScorer, fn_constructor_args=(lm_ref, col),
        batch_format="pyarrow", concurrency=(1, 8))
