"""queries() vs oracle_sql() parity at sf0.001 (a fast subset — the
full catalogue is checked by tools/check_oracle.py at sf0.01, which the
driver mirrors)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
SUBSET = [
    "q1_pricing_summary",
    "q_window_tumbling",
    "q_window_session",
    "q_dedupe_first_event",
    "q_dedup_exact_docs",
    "q_orders_by_segment",
    "q_switch_route",
    "q_ann_topk",
    "q_token_count_by_lang",
    "q_pii_redact",
    "q_repetition_metrics",
    "q_term_frequency",
    "q_top_bigrams",
    "q_tfidf_top_terms",
    "q_hash_sample",
    "q_dup_ngram_stats",
    "q_lang_id",
    "q_stratified_sample",
    "q_interval_join",
    "q_cep_followed_by",
    "q_cep_absence",
    "q_topk_per_group",
    "q_window_topk",
    "q_rolling_avg",
    "q_bpe_tokenize",
    "q_asof_join",
    "q_pq_encode",
    "q_window_cumulate",
    "q_window_distinct",
    "q_bigram_logprob",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, con):
    from bento_ray.pipelines.queries import QUERIES

    fn, sql = QUERIES[name]
    got = fn(SF)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    got = _canon(got)
    want = _canon(con.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want)
