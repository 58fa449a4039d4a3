"""Byte-pair-encoding primitives over a distributed corpus.

BPE training never needs the corpus itself — only the (word, count)
frequency table, which is vocabulary-sized. So the distributed part is
exactly one pass: the ``term_counts`` combiner (per-block Arrow
hash-aggregates, one vocab-bounded shuffle). The merge loop then runs
on the driver over that table (classic Sennrich et al. 2016
algorithm), touching ``|vocab| × avg_word_len`` symbols per merge —
megabytes at web scale, independent of corpus bytes.

``bpe_pair_counts`` exposes the pair-statistics pass itself as a
distributed operator (the inner loop of merge #1, and a corpus
character-bigram profile in its own right): per-batch byte-level pair
histograms (one ``np.bincount(65536)`` per batch — zero-copy over the
Arrow word buffer) → one 2-int-column shuffle bounded by 65536 rows
per block. ASCII corpora only for the string rendering (byte == char;
multi-byte UTF-8 pairs are counted at byte level and rendered
lossily — the oracle restricts itself to the same ASCII convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum

__all__ = ["bpe_pair_counts", "bpe_train", "bpe_encode_word"]


def _word_buffers(flat: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(flat)
    # a sliced array shares its parent's buffers; index the offsets
    # from flat.offset and rebase the data window to offs[0], else the
    # word-boundary mask misaligns (same guard as dedup._flat_packed)
    offs = np.frombuffer(flat.buffers()[1], np.int32,
                         count=flat.offset + n + 1)[flat.offset:]
    data_buf = flat.buffers()[2]
    if data_buf is None:
        data = np.empty(0, np.uint8)
    else:
        data = np.frombuffer(data_buf, np.uint8,
                             count=int(offs[-1]))[int(offs[0]):]
    return data, (offs - offs[0]).astype(np.int32)


def bpe_pair_counts(ds, col: str = "text", k: int = 20):
    """Top-k adjacent byte pairs within words across the corpus —
    merge #1's statistics as a driver-visible operator. Per batch:
    one boolean mask excludes cross-word byte positions, one
    ``np.bincount`` builds the 65536-bin histogram; the global
    exchange carries ≤ 65536 (pair, n) rows per block."""
    from bento_ray.textops.terms import _split_words

    def _partial(t: pa.Table) -> pa.Table:
        flat, _ = _split_words(t.column(col))
        data, offs = _word_buffers(flat)
        if len(data) < 2:
            return pa.table({"pair_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        first = data[:-1].astype(np.int64)
        second = data[1:].astype(np.int64)
        # a pair is valid when both bytes belong to the same word:
        # positions offs[i]-1 (last byte of word i) start a cross-word
        # pair — mask them out
        valid = np.ones(len(data) - 1, bool)
        ends = offs[1:-1].astype(np.int64) - 1  # last byte index per word
        valid[ends[(ends >= 0) & (ends < len(valid))]] = False
        pair = first[valid] * 256 + second[valid]
        hist = np.bincount(pair, minlength=65536)
        nz = np.flatnonzero(hist)
        return pa.table({"pair_id": pa.array(nz.astype(np.int64)),
                         "n": pa.array(hist[nz].astype(np.int64))})

    agg = (ds.map_batches(_partial, batch_format="pyarrow")
           .groupby("pair_id").aggregate(Sum("n", alias_name="cnt")))

    def _render(t: pa.Table) -> pa.Table:
        pid = t.column("pair_id").to_numpy()
        pairs = [bytes([p // 256, p % 256]).decode("latin-1")
                 for p in pid]  # k rows only — post-limit
        return pa.table({"pair": pa.array(pairs, pa.string()),
                         "cnt": t.column("cnt")})

    return (agg.sort(["cnt", "pair_id"], descending=[True, False])
            .limit(k).map_batches(_render, batch_format="pyarrow"))


def bpe_train(ds, num_merges: int = 50, col: str = "text"
              ) -> list[tuple[str, str]]:
    """Learn BPE merges from a distributed corpus: ONE distributed
    word-frequency pass (the ``term_counts`` combiner), then the
    classic greedy merge loop on the driver over the vocab-sized
    table. Ties on pair count break to the lexicographically smallest
    pair — fully deterministic. Returns the merge list in order."""
    from bento_ray.textops.terms import term_counts

    vocab = term_counts(ds, col).to_pandas()
    seqs = [tuple(w) for w in vocab["word"].astype(str)]
    cnts = vocab["cnt"].to_numpy(np.int64)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        stats: dict[tuple[str, str], int] = {}
        for s, c in zip(seqs, cnts):
            for a, b in zip(s, s[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + int(c)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        new_seqs = []
        for s in seqs:
            if a not in s:
                new_seqs.append(s)
                continue
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_seqs.append(tuple(out))
        seqs = new_seqs
    return merges


def bpe_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges to one word (test/CLI helper — corpus
    tokenization at scale goes through a broadcast merge table inside
    map_batches, not per-row Python)."""
    s = list(word)
    for a, b in merges:
        i = 0
        out: list[str] = []
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


class _BpeTokenizer:
    """Actor-pool tokenization stage: merges resolved ONCE per actor
    (rank table + per-actor word→tokens cache — web text is Zipfian,
    so nearly every word in a batch is a dict hit after warmup).
    Per batch: one Arrow split pass, np.unique over the batch's words
    (tokenize each distinct word once), then a vectorized
    inverse-index expansion back to docs."""

    def __init__(self, merges_ref, col: str):
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) \
            else merges_ref
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.col = col
        self.cache: dict[str, list[str]] = {}
        # rank-greedy == sequential ONLY for creation-ordered merge
        # lists (every part is a single char or the product of an
        # EARLIER merge — what training emits). Arbitrary/reordered
        # lists (e.g. [('ab','c'), ('a','b')]) diverge, so those take
        # the exact sequential path instead.
        built: set[str] = set()
        ordered = True
        for a, b in (tuple(p) for p in merges):
            if (len(a) > 1 and a not in built) or \
                    (len(b) > 1 and b not in built):
                ordered = False
                break
            built.add(a + b)
        if ordered:
            self._merges_seq = None
        else:
            self._merges_seq = [tuple(p) for p in merges]

    def _encode(self, word: str) -> list[str]:
        """Rank-greedy BPE (GPT-2 style): repeatedly merge the
        lowest-rank adjacent pair — equivalent to applying the merge
        list in order for creation-ordered lists (pinned against
        bpe_encode_word in pytest); non-creation-ordered lists run
        the sequential reference directly."""
        hit = self.cache.get(word)
        if hit is not None:
            return hit
        if self._merges_seq is not None:
            s = bpe_encode_word(word, self._merges_seq)
            if len(self.cache) < 1_000_000:
                self.cache[word] = s
            return s
        s = list(word)
        ranks = self.ranks
        while len(s) > 1:
            best_i, best_r = -1, None
            for i in range(len(s) - 1):
                r = ranks.get((s[i], s[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            # merge EVERY occurrence of the chosen pair left-to-right
            a, b = s[best_i], s[best_i + 1]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        if len(self.cache) < 1_000_000:   # bound actor RAM
            self.cache[word] = s
        return s

    def __call__(self, t: pa.Table) -> pa.Table:
        from bento_ray.textops.terms import _split_words

        flat, lens = _split_words(t.column(self.col))
        words = flat.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(words, return_inverse=True) if len(words) \
            else (np.array([], object), np.array([], np.int64))
        toks = [self._encode(str(w)) for w in uniq]
        ntok = np.array([len(x) for x in toks], np.int64)
        per_word = ntok[inv] if len(words) else np.array([], np.int64)
        doc_ids = np.repeat(np.arange(len(lens)), lens)
        n_bpe = np.bincount(doc_ids, weights=per_word,
                            minlength=len(lens)).astype(np.int64) \
            if len(lens) else np.array([], np.int64)
        # per-doc token lists, rebuilt with Arrow list offsets (no
        # per-doc Python joins)
        flat_tokens = pa.array(
            [tok for i in inv for tok in toks[i]] if len(words) else [],
            pa.string())
        word_tok_offsets = np.concatenate([[0], np.cumsum(per_word)])
        doc_word_offsets = np.concatenate([[0], np.cumsum(lens)])
        doc_tok_offsets = word_tok_offsets[doc_word_offsets]
        tokens = pa.ListArray.from_arrays(
            pa.array(doc_tok_offsets, pa.int32()), flat_tokens)
        t = t.append_column("bpe_tokens", tokens)
        return t.append_column("n_bpe_tokens", pa.array(n_bpe))


def bpe_tokenize(ds, merges: list[tuple[str, str]], col: str = "text",
                 concurrency: int | None = None, batch_size: int = 256):
    """Distributed corpus tokenization with a trained merge list
    (the apply step after ``bpe_train``): merges broadcast once via
    ``ray.put``, actor pool tokenizes batches (distinct-word dedup +
    per-actor cache), appending ``bpe_tokens`` (list<string>) and
    ``n_bpe_tokens`` per row. No shuffle at all — the stage is
    embarrassingly parallel."""
    import ray

    from bento_ray.util import default_concurrency

    if concurrency is None:
        concurrency = default_concurrency()
    ref = ray.put([tuple(p) for p in merges])
    return ds.map_batches(
        _BpeTokenizer, fn_constructor_args=(ref, col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


__all__.append("bpe_tokenize")
