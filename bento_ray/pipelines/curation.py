"""End-to-end LLM-training-data curation: the composed pipeline the
individual textops exist for, as ONE Dataset plan —

    paragraph-level boilerplate dedup  →  quality gate
    (min length + distinct-word ratio) →  per-language corpus summary

Every stage keeps its documented scale shape (paragraphs move as
hashes with a combiner + duplicated-subset broadcast; the quality gate
is a stateless vectorized pass; the summary is a per-lang combiner
aggregate), and the WHOLE chain is DuckDB-oracled end-to-end by
``q_curation_pipeline`` — composition is where per-op oracles usually
stop helping, so the chain itself is hash-checked.

The quality gate is integer-exact on both engines: word counts are
``\\S+`` token counts, and the distinct-word ratio test is the
cross-multiplied ``10·distinct ≥ 3·words`` (never a float divide).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Mean, Sum

__all__ = ["curate_documents"]

MIN_WORDS = 20
DISTINCT_NUM = 3    # keep if 10 * distinct >= 3 * words
DISTINCT_DEN = 10


def curate_documents(ds, *, words_per_para: int = 10,
                     lang_col: str = "lang"):
    """Run the curation chain over (doc_id, text, lang) and return the
    per-language summary (lang, n_docs, total_words, avg_kept_frac).

    avg_kept_frac is the mean surviving-paragraph fraction of the KEPT
    docs — the dedup pressure indicator a curation run reports."""
    from bento_ray.textops import paragraph_dedup
    from bento_ray.textops.terms import _split_words
    from bento_ray.util import duckdb_round

    deduped = paragraph_dedup(ds, words_per_para=words_per_para,
                              keep_cols=(lang_col,))

    def _gate(t: pa.Table) -> pa.Table:
        flat, lens = _split_words(t.column("clean_text"))
        doc_of = np.repeat(np.arange(len(lens)), lens)
        df = pd.DataFrame({"d": doc_of,
                           "w": flat.to_numpy(zero_copy_only=False)})
        nd = df.groupby("d")["w"].nunique() if len(df) else pd.Series(
            dtype=np.int64)
        n_distinct = np.zeros(len(lens), np.int64)
        if len(nd):
            n_distinct[nd.index.to_numpy()] = nd.to_numpy()
        keep = (lens >= MIN_WORDS) & \
               (DISTINCT_DEN * n_distinct >= DISTINCT_NUM * lens)
        kept_frac = duckdb_round(
            t.column("n_kept").to_numpy().astype(np.float64)
            / np.maximum(t.column("n_paras").to_numpy(), 1), 6)
        out = pa.table({
            lang_col: t.column(lang_col),
            "n_words": pa.array(lens.astype(np.int64)),
            "kept_frac": pa.array(kept_frac, pa.float64()),
        })
        return out.filter(pa.array(keep))

    gated = deduped.map_batches(_gate, batch_format="pyarrow")
    out = gated.groupby(lang_col).aggregate(
        Count(alias_name="n_docs"),
        Sum("n_words", alias_name="total_words"),
        Mean("kept_frac", alias_name="avg_kept_frac"))

    def _round(t: pa.Table) -> pa.Table:
        i = t.column_names.index("avg_kept_frac")
        v = duckdb_round(t.column("avg_kept_frac").to_numpy(
            zero_copy_only=False), 4)
        t = t.set_column(i, "avg_kept_frac", pa.array(v, pa.float64()))
        j = t.column_names.index("total_words")
        return t.set_column(j, "total_words",
                            t.column("total_words").cast(pa.int64()))

    return out.map_batches(_round, batch_format="pyarrow")
