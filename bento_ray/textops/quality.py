"""Text analysis for large-scale training-data pipelines: document
stats, quality scoring, language ID, token counting, fingerprinting.

All stages are vectorized ``map_batches`` transforms; the regex-holding
ones are actor classes so patterns compile once per actor, not per
batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bento_ray.util import resolve_concurrency as _conc
from bento_ray.util import duckdb_round
import pyarrow.compute as pc

# minimal per-language stopword profiles for the n-gram/stopword
# language-ID heuristic (public common-word lists)
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "den", "von"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "que", "por"},
    "pt": {"o", "a", "os", "de", "e", "um", "uma", "que", "para", "com"},
    "zh": set(),
    "ar": set(),
    "hi": set(),
}


def doc_stats(ds, text_col: str = "text"):
    """Add n_chars / n_words / n_sentences columns. Pure pyarrow.compute
    kernels — zero-copy, no Python row loop. Definitions (mirrored in
    the DuckDB oracle): n_words = count of maximal \\S+ runs,
    n_sentences = count of [.!?] characters."""

    def _f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        t = t.append_column("n_chars_calc", pc.utf8_length(txt).cast(pa.int64()))
        t = t.append_column(
            "n_words", pc.count_substring_regex(txt, r"\S+").cast(pa.int64()))
        t = t.append_column(
            "n_sentences", pc.count_substring_regex(txt, r"[.!?]").cast(pa.int64()))
        return t

    return ds.map_batches(_f, batch_format="pyarrow")


class QualityScorer:
    """Quality heuristics per document: stopword ratio, digit ratio,
    mean word length, and a combined [0,1] score. Actor-pool stage —
    the tokenizer regex compiles once per actor."""

    def __init__(self):
        import re

        # re.ASCII: DuckDB's RE2 \S is ASCII-only — Python's default
        # unicode \s would split on NBSP etc. and diverge from the
        # oracle on non-ASCII corpora
        self.word = re.compile(r"\S+", re.ASCII)
        self.digit = re.compile(r"[0-9]")
        self.stop = _STOPWORDS["en"]

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        stop_ratio = np.zeros(len(texts))
        digit_ratio = np.zeros(len(texts))
        mean_wlen = np.zeros(len(texts))
        for i, s in enumerate(texts):
            words = self.word.findall(s or "")
            if not words:
                continue
            stop_ratio[i] = sum(w.lower() in self.stop for w in words) / len(words)
            mean_wlen[i] = sum(len(w) for w in words) / len(words)
            # ASCII digits only — str.isdigit also counts '²', '٣'
            # etc., which the oracle's [^0-9] strip does not
            nd = len(self.digit.findall(s))
            digit_ratio[i] = nd / max(1, len(s))
        # crude composite: plausible text has some stopwords, word
        # lengths 3-8, few digits
        score = (np.clip(stop_ratio * 5, 0, 1) * 0.4
                 + np.clip(1 - np.abs(mean_wlen - 5.0) / 5.0, 0, 1) * 0.4
                 + np.clip(1 - digit_ratio * 10, 0, 1) * 0.2)
        # duckdb_round (half-away-from-zero), not np.round (half-even):
        # the driver gate hash-compares these against a DuckDB ROUND()
        from bento_ray.util import duckdb_round

        t = t.append_column("stop_ratio", pa.array(duckdb_round(stop_ratio, 6)))
        t = t.append_column("mean_word_len",
                            pa.array(duckdb_round(mean_wlen, 6)))
        t = t.append_column("digit_ratio",
                            pa.array(duckdb_round(digit_ratio, 6)))
        return t.append_column("quality_score",
                               pa.array(duckdb_round(score, 6)))


def quality_stage(ds, concurrency: int | None = None):
    return ds.map_batches(QualityScorer, batch_format="pyarrow",
                          concurrency=_conc(concurrency))


class LangId:
    """N-gram/stopword language-ID heuristic: score each language by
    stopword hits + character-class evidence; emit the argmax and its
    confidence. Deterministic; stopword profiles load once per actor."""

    def __init__(self):
        import re

        self.word = re.compile(r"[^\W\d_]+", re.U)
        self.langs = [lg for lg in _STOPWORDS if _STOPWORDS[lg]]

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        preds, confs = [], []
        for s in texts:
            words = [w.lower() for w in self.word.findall(s or "")]
            if not words:
                preds.append("und")
                confs.append(0.0)
                continue
            scores = {
                lg: sum(w in _STOPWORDS[lg] for w in words) / len(words)
                for lg in self.langs
            }
            best = max(sorted(scores), key=lambda lg: scores[lg])
            preds.append(best if scores[best] > 0 else "und")
            # duckdb_round (half away from zero), the repo convention
            # for every oracle-compared float
            confs.append(float(duckdb_round(
                np.array([scores[best]]), 6)[0]))
        t = t.append_column("pred_lang", pa.array(preds, pa.string()))
        return t.append_column("lang_conf", pa.array(confs, pa.float64()))


def lang_id_stage(ds, concurrency: int | None = None):
    return ds.map_batches(LangId, batch_format="pyarrow",
                          concurrency=_conc(concurrency))


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


class Fingerprinter:
    """Rolling-hash document fingerprint (winnowing-style): polynomial
    rolling hash over word-hash sequences with window w; fingerprint =
    min rolling hash (plus the count of distinct window hashes)."""

    def __init__(self, window: int = 8):
        self.window = window

    _WORD_RE = None

    def _doc_fp(self, s: str) -> tuple[int, int]:
        import numpy as np

        if Fingerprinter._WORD_RE is None:
            import re

            # ASCII \S+ runs — matches the oracle's RE2 tokenizer
            # (str.split() splits on unicode whitespace too)
            Fingerprinter._WORD_RE = re.compile(r"\S+", re.ASCII)
        words = Fingerprinter._WORD_RE.findall(s)
        if not words:
            return 0, 0
        hs = word_hashes(words)
        w = min(self.window, len(hs))
        # vectorized window hashes: same polynomial combine as the
        # minhash shingles — one (w × n) broadcast, no rolling loop
        n = len(hs) - w + 1
        out = np.zeros(n, np.uint64)
        for j in range(w):
            out = (out * np.uint64(_FP_BASE) + hs[j:n + j]) \
                % np.uint64(_FP_MOD)
        uniq = np.unique(out)
        return int(uniq.min()), int(len(uniq))

    def __call__(self, t: pa.Table) -> pa.Table:
        res = [self._doc_fp(s or "") for s in t.column("text").to_pylist()]
        t = t.append_column("fingerprint",
                            pa.array([r[0] for r in res], pa.int64()))
        return t.append_column("n_windows",
                               pa.array([r[1] for r in res], pa.int64()))


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def word_hashes(words) -> np.ndarray:
    """Vectorized FNV-1a 61-bit word hashes — byte-identical to the
    scalar :func:`hash_word` but computed as ``max_word_len`` masked
    numpy passes over a padded byte matrix (O(total_bytes) C ops, no
    per-word Python). Words arrive as any string sequence; hashing all
    of a batch's words in ONE call amortizes the setup."""
    import pyarrow as pa

    n = len(words)
    if n == 0:
        return np.empty(0, np.uint64)
    arr = pa.array(words, pa.string()) if not isinstance(
        words, (pa.Array, pa.ChunkedArray)) else words
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # index the offsets buffer from arr.offset and rebase the data
    # view — a zero-copy sliced Array shares buffers with its parent
    # and a position-0 read would hash the parent's FIRST n words
    # (same guard as dedup._flat_packed / bpe._word_buffers)
    offs = np.frombuffer(arr.buffers()[1], np.int32,
                         count=arr.offset + n + 1)[arr.offset:]
    data_buf = arr.buffers()[2]
    data = np.frombuffer(data_buf, np.uint8, count=offs[-1]) \
        if data_buf is not None else np.empty(0, np.uint8)
    lengths = np.diff(offs)
    maxlen = int(lengths.max()) if n else 0
    h = np.full(n, _FNV_OFFSET, np.uint64)
    if maxlen:
        starts = offs[:-1]
        for pos in range(maxlen):
            mask = lengths > pos
            if not mask.any():
                break
            b = data[starts[mask] + pos].astype(np.uint64)
            h[mask] = (h[mask] ^ b) * _FNV_PRIME  # uint64 wrap = & mask
    return h % np.uint64(_FP_MOD)


def hash_word(w: str) -> int:
    """Deterministic 61-bit word hash (FNV-1a over utf-8, folded) —
    the scalar form of :func:`word_hashes`."""
    h = 0xCBF29CE484222325
    for b in w.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h % _FP_MOD


def fingerprint_stage(ds, window: int = 8, concurrency: int | None = None):
    return ds.map_batches(Fingerprinter, fn_constructor_args=(window,),
                          batch_format="pyarrow",
                          concurrency=_conc(concurrency))


def repetition_metrics(ds, text_col: str = "text"):
    """Gopher-style repetition signals per document, position-free so
    the same definitions are expressible in the DuckDB oracle:

    - ``top_word_frac``      — occurrences of the most frequent word
                               over total words
    - ``distinct_word_frac`` — distinct words over total words
    - ``dup_word_char_frac`` — fraction of word characters belonging to
                               words that occur more than once

    Words are whitespace-run tokens (RE2 ``\\S+``, matching
    ``regexp_extract_all(text, '\\S+')`` in SQL). Word-less
    documents report 0 for all three. Vectorized: one Arrow split per
    batch, then C-speed pandas groupbys over (doc, word) — no Python
    row loop."""
    import pandas as pd

    from bento_ray.util import duckdb_round

    def _f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        if (pc.sum(pc.count_substring(txt, "\x0b")).as_py() or 0) == 0:
            lists = pc.ascii_split_whitespace(txt)   # RE2-\S+ tokens
        else:
            lists = pc.split_pattern_regex(txt, "[\t\n\f\r ]+")
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"d": parents, "w": flat.to_pandas()})
        df = df[df["w"] != ""]
        n_docs = len(t)
        top = np.zeros(n_docs)
        dis = np.zeros(n_docs)
        dup = np.zeros(n_docs)
        if len(df):
            wc = df.groupby(["d", "w"], sort=False).size().rename("c") \
                .reset_index()
            wc["chars"] = wc["w"].str.len() * wc["c"]
            per = wc.groupby("d", sort=False)
            n_words = per["c"].sum()
            max_c = per["c"].max()
            n_distinct = per.size()
            tot_chars = per["chars"].sum()
            dup_chars = wc.loc[wc["c"] > 1, ["d", "chars"]] \
                .groupby("d")["chars"].sum().reindex(n_words.index,
                                                     fill_value=0)
            idx = n_words.index.to_numpy()
            top[idx] = (max_c / n_words).to_numpy()
            dis[idx] = (n_distinct / n_words).to_numpy()
            nz = tot_chars.to_numpy() > 0
            dup[idx[nz]] = (dup_chars.to_numpy()[nz]
                            / tot_chars.to_numpy()[nz])
        t = t.append_column("top_word_frac", pa.array(duckdb_round(top, 6)))
        t = t.append_column("distinct_word_frac",
                            pa.array(duckdb_round(dis, 6)))
        return t.append_column("dup_word_char_frac",
                               pa.array(duckdb_round(dup, 6)))

    return ds.map_batches(_f, batch_format="pyarrow")


def length_quantiles(ds, text_col: str = "text",
                     group_col: str = "lang"):
    """Per-group word-count quantiles (p50/p90/p99) + doc count via a
    bounded histogram combiner — the 100 TB shape for distribution
    stats: each batch collapses to (group, n_words, cnt) partials with
    one Arrow hash-aggregate (shuffle volume ∝ groups × distinct
    lengths, NOT docs), the global groupby sums them, and only the
    tiny histogram reaches the driver for CDF inversion (langs ×
    distinct doc lengths — bounded by the length cap of real corpora;
    never the documents themselves).

    Quantile definition (mirrored exactly in the DuckDB oracle):
    q-quantile = smallest w with cumulative count ≥ ceil(q·n) —
    word counts are integers so this is exact, no interpolation."""
    import numpy as np

    import ray.data as rd

    def _partial(t: pa.Table) -> pa.Table:
        # null text counts as 0 words (COALESCE(text,'') in the oracle)
        w = pc.count_substring_regex(
            t.column(text_col), r"\S+").cast(pa.int64()).fill_null(0)
        small = pa.table({group_col: t.column(group_col), "w": w})
        return pa.TableGroupBy(small, [group_col, "w"]).aggregate(
            [([], "count_all")]).rename_columns(
                [group_col, "w", "cnt"])

    hist = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby([group_col, "w"]).sum("cnt")
    rows = hist.take_all()  # bounded: the HISTOGRAM, not the docs
    if not rows:
        return rd.from_arrow(pa.table({
            group_col: pa.array([], pa.string()),
            "p50": pa.array([], pa.int64()),
            "p90": pa.array([], pa.int64()),
            "p99": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64())}))
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r[group_col], []).append(
            (r["w"], r["sum(cnt)"]))
    out = {group_col: [], "p50": [], "p90": [], "p99": [],
           "n_docs": []}
    for g in sorted(by_group):
        pairs = sorted(by_group[g])
        ws = np.array([p[0] for p in pairs], np.int64)
        cum = np.cumsum([p[1] for p in pairs])
        n = int(cum[-1])
        out[group_col].append(g)
        for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            rank = int(np.ceil(q * n))
            out[name].append(int(ws[np.searchsorted(cum, rank)]))
        out["n_docs"].append(n)
    return rd.from_arrow(pa.table({
        group_col: pa.array(out[group_col], pa.string()),
        "p50": pa.array(out["p50"], pa.int64()),
        "p90": pa.array(out["p90"], pa.int64()),
        "p99": pa.array(out["p99"], pa.int64()),
        "n_docs": pa.array(out["n_docs"], pa.int64())}))


# GPT-2-style pre-tokenizer shape, restricted to explicit ASCII
# classes so the pattern means the same thing in every RE2 host
# (Arrow's count_substring_regex here, DuckDB's regexp_extract_all in
# the oracle): contraction suffixes, space-prefixed letter / digit /
# punctuation runs, residual whitespace runs. Non-ASCII letters land
# in the punctuation class — a documented simplification of the
# byte-level BPE behaviour.
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^A-Za-z0-9\s]+"
    r"|\s+"
)


def token_counts(ds, text_col: str = "text"):
    """Append ``n_tokens``: BPE-ish pre-tokenizer token count per doc
    (the training-data budget metric — whitespace words undercount
    code/punctuation-heavy text). One RE2 kernel pass per batch,
    zero-copy; null text counts 0."""

    def _f(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if pa.types.is_null(col.type):  # all-null block
            col = col.cast(pa.string())
        n = pc.count_substring_regex(
            col, BPE_TOKEN_PATTERN).cast(pa.int64()).fill_null(0)
        return t.append_column("n_tokens", n)

    return ds.map_batches(_f, batch_format="pyarrow")
