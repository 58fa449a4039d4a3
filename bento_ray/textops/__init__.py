from bento_ray.textops.dedup import (
    connected_components,
    minhash_signatures,
    near_dup_pairs_minhash,
    simhash64,
)
from bento_ray.textops.quality import (
    doc_stats,
    fingerprint_stage,
    lang_id_stage,
    quality_stage,
    repetition_metrics,
)
from bento_ray.textops.normalize import normalize_text
from bento_ray.textops.redact import redact_pii
from bento_ray.textops.similarity import (
    cosine_near_dups,
    cosine_near_dups_lsh,
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
    semdedup,
)

from bento_ray.textops.terms import (
    term_counts,
    bigram_counts,
    top_terms,
    top_bigrams,
    tfidf_top_terms,
    dup_ngram_stats,
    hash_sample,
    stratified_sample,
    decontaminate,
    unigram_logprob,
    dup_window_coverage,
    remove_dup_spans,
    sequence_packing,
)
from bento_ray.textops.urlops import (
    parse_urls,
    domain_stats,
    top_domains,
    filter_domains,
)

__all__ = [
    "doc_stats",
    "term_counts",
    "bigram_counts",
    "top_terms",
    "top_bigrams",
    "tfidf_top_terms",
    "dup_ngram_stats",
    "hash_sample",
    "stratified_sample",
    "parse_urls",
    "domain_stats",
    "top_domains",
    "filter_domains",
    "quality_stage",
    "repetition_metrics",
    "redact_pii",
    "normalize_text",
    "lang_id_stage",
    "fingerprint_stage",
    "minhash_signatures",
    "connected_components",
    "near_dup_pairs_minhash",
    "simhash64",
    "cosine_topk",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "cosine_near_dups",
    "cosine_near_dups_lsh",
    "semdedup",
    "decontaminate",
    "unigram_logprob",
    "dup_window_coverage",
    "remove_dup_spans",
    "sequence_packing",
]
