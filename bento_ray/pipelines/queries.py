"""Driver-contract query catalogue: one entry per implemented operator
family (SURVEY.md §2 + the training-data ops), each with a DuckDB
oracle where SQL can express it.

Conventions shared by Ray implementation and oracle SQL so value-hash
comparison is exact:
- every float aggregate is ROUND(x, 4) (distributed summation order
  differs from DuckDB's — rounding removes last-bit noise);
- every computed column carries the SAME name on both sides;
- event-time windows use the engine's left-open/right-closed UTC-epoch
  arithmetic, expressed in SQL as ``((epoch_us(ts) + S - 1) // S) * S``;
- timestamps stay timezone-naive (matching the parquet files and
  DuckDB).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

HOUR_US = 3_600_000_000
HALF_HOUR_US = 1_800_000_000


def _strip_meta(t: pa.Table) -> pa.Table:
    """Drop the file-level ``pandas`` schema metadata the parquet
    writer attached: Ray's block concat dedupes schemas by hashing
    them, and the metadata dict makes that fail (the BENCH-tail
    "Failed to hash the schemas" warning) — every downstream concat
    then pays a full unify instead of the early-exit."""
    return t.replace_schema_metadata(None)


def _t(sf_dir: str, name: str, columns=None):
    """Read one testdata table. ``override_num_blocks ≈ CPUs`` — the
    default splits small files into hundreds of tiny blocks whose
    per-task overhead dominates (measured 6.5s → 1.1s on TPC-H Q1 at
    sf0.1 / 32 CPUs)."""
    try:
        import ray

        nb = max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        nb = 8
    # sources.read_parquet passes a metadata-stripped footer schema so
    # Ray's schema dedupe works (no pandas-metadata dicts in any batch)
    from bento_ray.sources.inputs import read_parquet

    return read_parquet(f"{sf_dir}/{name}.parquet", columns=columns,
                        override_num_blocks=nb)


def _round_cols(ds, cols: list[str], digits: int = 4):
    from bento_ray.util import duckdb_round

    def _f(t: pa.Table) -> pa.Table:
        for c in cols:
            if c in t.column_names:
                i = t.column_names.index(c)
                vals = duckdb_round(
                    t.column(c).cast(pa.float64()).to_numpy(zero_copy_only=False),
                    digits)
                t = t.set_column(i, c, pa.array(vals, pa.float64()))
        return t
    return ds.map_batches(_f, batch_format="pyarrow")


def _tumble_naive(t: pa.Table, ts_col: str, size_us: int,
                  out: str = "window_end") -> pa.Table:
    ts = t.column(ts_col).cast(pa.int64()).to_numpy()
    we = ((ts + size_us - 1) // size_us) * size_us
    return t.append_column(out, pa.array(we, pa.timestamp("us")))


# ---------------------------------------------------------------------------
# relational core: mapping / filter / aggregate / sort / joins
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filter + grouped aggregate over lineitem.
    Exercises mapping (computed columns) + groupby().aggregate()."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "l_shipdate"])

    def _prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"),
                                   pa.scalar(pd.Timestamp("1998-09-02"))))
        disc = pc.multiply(t.column("l_extendedprice"),
                           pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return t.append_column("disc_price", disc)

    ds = ds.map_batches(_prep, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Mean("l_quantity", alias_name="avg_qty"),
        Count(alias_name="count_order"),
    )
    return _round_cols(out, ["sum_qty", "sum_base_price", "sum_disc_price",
                             "avg_qty"])


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4)                          AS sum_qty,
       ROUND(SUM(l_extendedprice), 4)                     AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)  AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)                          AS avg_qty,
       COUNT(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_filter_map(sf_dir: str):
    """Row-level mapping + filter (Bloblang mapping/deleted() idiom)."""
    ds = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
             "l_discount"])

    def _f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_quantity"), pa.scalar(45.0)))
        # raw double expression, same operand order as the SQL — the
        # per-row result is bit-identical without any rounding
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        t = t.append_column("revenue", rev)
        return t.select(["l_orderkey", "l_linenumber", "revenue"])

    return ds.map_batches(_f, batch_format="pyarrow")


SQL_REVENUE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem WHERE l_quantity > 45
"""


def q_topk_orders(sf_dir: str):
    """Global sort + limit (top-k)."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderpriority"])
    return ds.sort(["o_totalprice", "o_orderkey"],
                   descending=[True, False]).limit(10)


SQL_TOPK = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_orders_by_segment(sf_dir: str):
    """Broadcast hash join (stream-table enrichment) + aggregate."""
    from bento_ray.stages.join import broadcast_join

    import pyarrow.parquet as pq

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    cust = cust.rename_columns(["o_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, cust, on="o_custkey", how="inner")
    out = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"),
        Sum("o_totalprice", alias_name="sum_total"),
    )
    return _round_cols(out, ["sum_total"])


SQL_SEGMENT = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 4) AS sum_total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_priority_revenue(sf_dir: str):
    """Large-large equi-join (bucketed hash shuffle) + aggregate.

    Combiner before the exchange: lineitem is clustered by orderkey,
    so a per-block (l_orderkey → n, revenue) partial shrinks the big
    join side ~4× before any row moves — the shape that keeps this
    join viable at 10^12 rows (never ship raw fact rows a pre-group
    can collapse)."""
    from bento_ray.stages.join import shuffle_join

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def _rev_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        tt = pa.table({"l_orderkey": t.column("l_orderkey"),
                       "revenue": rev})
        agg = tt.group_by("l_orderkey").aggregate(
            [("revenue", "sum"), ("revenue", "count")])
        return pa.table({
            "l_orderkey": agg.column("l_orderkey"),
            "revenue": agg.column("revenue_sum"),
            "n": agg.column("revenue_count").cast(pa.int64()),
        })

    li = li.map_batches(_rev_partial, batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    orders = orders.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_orderpriority"]),
        batch_format="pyarrow")
    joined = shuffle_join(li, orders, on="l_orderkey", how="inner")
    out = joined.groupby("o_orderpriority").aggregate(
        Sum("n", alias_name="n_items"),
        Sum("revenue", alias_name="revenue"),
    )
    return _round_cols(out, ["revenue"])


SQL_PRIORITY = """
SELECT o_orderpriority, COUNT(*) AS n_items,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_switch_route(sf_dir: str):
    """The switch processor: per-row routing into per-case transforms,
    reassembled in input order, then aggregated."""
    from bento_ray.stages.compose import switch_table

    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount",
             "l_tax"])

    def _with_val(mult_expr):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("routed_val", mult_expr(t))
        return fn

    cases = [
        (lambda t: pc.equal(t.column("l_returnflag"), pa.scalar("A")),
         _with_val(lambda t: pc.multiply(
             t.column("l_extendedprice"),
             pc.subtract(pa.scalar(1.0), t.column("l_discount"))))),
        (lambda t: pc.equal(t.column("l_returnflag"), pa.scalar("R")),
         _with_val(lambda t: pc.multiply(
             t.column("l_extendedprice"),
             pc.add(pa.scalar(1.0), t.column("l_tax"))))),
        (None,
         _with_val(lambda t: t.column("l_extendedprice"))),
    ]
    routed = ds.map_batches(lambda t: switch_table(t, cases),
                            batch_format="pyarrow")
    out = routed.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("routed_val", alias_name="sum_routed"),
        Count(alias_name="n"),
    )
    return _round_cols(out, ["sum_routed"])


SQL_SWITCH = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(CASE WHEN l_returnflag = 'A'
                      THEN l_extendedprice * (1 - l_discount)
                      WHEN l_returnflag = 'R'
                      THEN l_extendedprice * (1 + l_tax)
                      ELSE l_extendedprice END), 4) AS sum_routed,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_docs_by_lang(sf_dir: str):
    """group_by_value semantics as a global grouped aggregate."""
    ds = _t(sf_dir, "documents", ["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Mean("n_chars", alias_name="avg_chars"),
    )
    return _round_cols(out, ["avg_chars"])


SQL_DOCS_LANG = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       ROUND(AVG(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang
"""


def q_branch_enrich(sf_dir: str):
    """The branch processor: request_map → child → result_map merge."""
    from bento_ray.stages.compose import branch

    ds = _t(sf_dir, "documents", ["doc_id", "source"])
    out = branch(
        ds,
        request_map=lambda t: t.select(["source"]),
        child=lambda t: pa.table(
            {"source_upper": pc.utf8_upper(t.column("source"))}),
        result_map=lambda orig, res: orig.append_column(
            "source_upper", res.column("source_upper")),
    )
    return out.select_columns(["doc_id", "source_upper"])


SQL_BRANCH = "SELECT doc_id, UPPER(source) AS source_upper FROM documents"


def q_json_extract(sf_dir: str):
    """JSON path extraction through the real ``jq`` engine
    (processor_jq.go semantics, bento_ray.jqlang): the query compiles
    once per actor and extracts ``.k`` per document; the aggregate
    stays a vectorized groupby."""
    ds = _t(sf_dir, "events", ["event_type", "props"])

    class _JQExtract:
        def __init__(self):
            from bento_ray.jqlang import JQ

            self.q = JQ(".k")

        def __call__(self, t: pa.Table) -> pa.Table:
            ks = []
            for p in t.column("props").to_pylist():
                out = self.q(json.loads(p)) if p else []
                ks.append(out[0] if out else None)
            return pa.table({
                "event_type": t.column("event_type"),
                "k": pa.array(ks, pa.int64()),
            })

    ds = ds.map_batches(_JQExtract, batch_format="pyarrow",
                        concurrency=(1, 8))
    return ds.groupby("event_type").aggregate(
        Sum("k", alias_name="sum_k"), Count(alias_name="n"))


SQL_JSON = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# event-time windowing over the events stream
# ---------------------------------------------------------------------------

def q_window_tumbling(sf_dir: str):
    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])
    ds = ds.map_batches(lambda t: _tumble_naive(t, "ts", HOUR_US),
                        batch_format="pyarrow")
    out = ds.groupby(["window_end", "event_type"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
    )
    return _round_cols(out, ["sum_value"])


SQL_TUMBLING = f"""
SELECT make_timestamp(((epoch_us(ts) + {HOUR_US - 1}) // {HOUR_US}) * {HOUR_US})
         AS window_end,
       event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_window_sliding(sf_dir: str):
    """Sliding windows size=1h slide=30m: every event lands in 2 panes."""
    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])

    def _assign(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        e0 = ((ts + HALF_HOUR_US - 1) // HALF_HOUR_US) * HALF_HOUR_US
        idx = np.repeat(np.arange(len(ts)), 2)
        ends = np.column_stack([e0, e0 + HALF_HOUR_US]).reshape(-1)
        out = t.take(pa.array(idx))
        return out.append_column("window_end", pa.array(ends, pa.timestamp("us")))

    ds = ds.map_batches(_assign, batch_format="pyarrow")
    out = ds.groupby(["window_end", "event_type"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"))
    return _round_cols(out, ["sum_value"])


SQL_SLIDING = f"""
SELECT make_timestamp(we) AS window_end, event_type, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM (
  SELECT ((epoch_us(ts) + {HALF_HOUR_US - 1}) // {HALF_HOUR_US}) * {HALF_HOUR_US}
           AS we, event_type, value FROM events
  UNION ALL
  SELECT ((epoch_us(ts) + {HALF_HOUR_US - 1}) // {HALF_HOUR_US}) * {HALF_HOUR_US}
           + {HALF_HOUR_US} AS we, event_type, value FROM events
) GROUP BY we, event_type
"""


def q_window_session(sf_dir: str):
    """Session windows per user (gap 30m) — the reference has no session
    windows; new semantics per the north rule.

    Partition-level vectorized (VERDICT r1 item 5): hash user_id into P
    coarse partitions, then ONE numpy break-scan + segment-reduce per
    partition — P Python calls total, not one per user. Scales with the
    cluster core count; the per-key map_groups it replaces paid one
    Python call per user (measured 20s+/80k rows on small groups)."""
    from bento_ray.util import duckdb_round, salted_partition

    ds = _t(sf_dir, "events", ["ts", "user_id", "event_id", "value"])
    P = 16

    def _pid(t: pa.Table) -> pa.Table:
        pid = salted_partition(t.column("user_id"), P)
        return t.append_column("__pid", pa.array(pid, pa.int64()))

    def _sessions(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.string()),
                "session_start": pa.array([], pa.timestamp("us")),
                "session_end": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
            })
        idx = pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        t = t.take(idx)
        ts = t.column("ts").combine_chunks().cast(pa.int64()).to_numpy()
        from bento_ray.stages.window import session_breaks

        brk = session_breaks(t.column("user_id"), ts, HALF_HOUR_US)
        starts = np.flatnonzero(brk)
        counts = np.diff(np.r_[starts, n])
        seg_last = np.r_[starts[1:], n] - 1
        vals = t.column("value").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        # duckdb_round (half-away-from-zero) — np.round's half-even
        # diverges from the oracle's ROUND() at dyadic halfway sums
        sums = duckdb_round(np.add.reduceat(vals, starts), 4)
        users = t.column("user_id").take(pa.array(starts))
        return pa.table({
            "user_id": users,
            "session_start": pa.array(ts[starts], pa.timestamp("us")),
            "session_end": pa.array(ts[seg_last], pa.timestamp("us")),
            "n_events": pa.array(counts, pa.int64()),
            "sum_value": pa.array(sums, pa.float64()),
        })

    return (ds.map_batches(_pid, batch_format="pyarrow")
              .groupby("__pid")
              .map_groups(_sessions, batch_format="pyarrow"))


SQL_SESSION = f"""
WITH s AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {HALF_HOUR_US}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM g GROUP BY user_id, sid
"""


def q_dedupe_first_event(sf_dir: str):
    """Streaming dedupe, FIFO strategy: first row per key by event time
    (processor_dedupe.go FIFO semantics, globally)."""
    from bento_ray.stages.dedupe import dedupe_exact

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    out = dedupe_exact(ds, ["user_id", "event_type"], keep="first",
                       order_cols=["ts", "event_id"])
    return out.select_columns(["user_id", "event_type", "event_id", "value"])


SQL_DEDUPE_FIRST = """
SELECT user_id, event_type, event_id, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) = 1
"""


def q_dedupe_last_event(sf_dir: str):
    """LIFO strategy: keep the LAST row per key."""
    from bento_ray.stages.dedupe import dedupe_exact

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    out = dedupe_exact(ds, ["user_id", "event_type"], keep="last",
                       order_cols=["ts", "event_id"])
    return out.select_columns(["user_id", "event_type", "event_id", "value"])


SQL_DEDUPE_LAST = """
SELECT user_id, event_type, event_id, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
"""


# ---------------------------------------------------------------------------
# training-data ops: text analysis, dedup, similarity
# ---------------------------------------------------------------------------

def q_doc_stats(sf_dir: str):
    from bento_ray.textops import doc_stats

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = doc_stats(ds)
    return out.select_columns(["doc_id", "n_chars_calc", "n_words",
                               "n_sentences"])


SQL_DOC_STATS = r"""
SELECT doc_id, LENGTH(text) AS n_chars_calc,
       LEN(regexp_extract_all(text, '\S+')) AS n_words,
       LEN(regexp_extract_all(text, '[.!?]')) AS n_sentences
FROM documents
"""


def q_warc_curation(sf_dir: str):
    """Common-Crawl ingestion end-to-end: documents are reached ONLY
    through a synthesized .warc.gz corpus (testgen/warcgen.py —
    deterministic, cached) → gzip member decompress → ISO 28500
    Content-Length record walk → typed parse → vectorized curation
    (regex word counts, ≥10-word keep gate) → per-lang summary. The
    oracle runs the same curation on the parquet directly, so the
    whole WARC writer/scanner/reader chain sits on the
    value-hash-checked path."""
    from ray.data.aggregate import Sum as _Sum

    from bento_ray.sources.scanners import read_warc
    from bento_ray.testgen.warcgen import ensure_warc_corpus

    paths = ensure_warc_corpus(sf_dir)
    ds = read_warc(paths, compression="gzip")

    def _partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("warc_type"), "response"))
        lang = pc.list_element(
            pc.split_pattern(t.column("target_uri"), "/"), 3)
        text = t.column("payload").cast(pa.string())
        nw = pc.count_substring_regex(text, r"\S+").cast(pa.int64())
        kept = pc.greater_equal(nw, 10).cast(pa.int64())
        tt = pa.table({"lang": lang,
                       "one": pa.array(np.ones(len(t), np.int64)),
                       "kept": kept, "nw": nw})
        agg = tt.group_by("lang").aggregate(
            [("one", "sum"), ("kept", "sum"), ("nw", "sum")])
        return pa.table({"lang": agg.column("lang"),
                         "n_docs": agg.column("one_sum"),
                         "n_kept": agg.column("kept_sum"),
                         "total_words": agg.column("nw_sum")})

    return (ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("lang").aggregate(
                _Sum("n_docs", alias_name="n_docs"),
                _Sum("n_kept", alias_name="n_kept"),
                _Sum("total_words", alias_name="total_words")))


SQL_WARC_CURATION = r"""
WITH s AS (
  SELECT lang, LEN(regexp_extract_all(text, '\S+')) AS nw
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN nw >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(nw) AS BIGINT) AS total_words
FROM s GROUP BY lang
"""


def q_token_count_by_lang(sf_dir: str):
    from bento_ray.textops import doc_stats

    ds = _t(sf_dir, "documents", ["lang", "text"])
    out = doc_stats(ds).groupby("lang").aggregate(
        Sum("n_words", alias_name="total_tokens"),
        Count(alias_name="n_docs"))
    return out


SQL_TOKENS = r"""
SELECT lang,
       CAST(SUM(LEN(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang
"""


def q_dedup_exact_docs(sf_dir: str):
    """Exact content dedup: keep the lowest doc_id per distinct text."""
    from bento_ray.stages.dedupe import dedupe_exact

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    out = dedupe_exact(ds, ["text"], keep="first", order_cols=["doc_id"])
    return out.select_columns(["doc_id", "lang", "source"])


SQL_DEDUP_DOCS = """
SELECT doc_id, lang, source FROM documents
QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""


def q_quality_filter(sf_dir: str):
    from bento_ray.textops import doc_stats

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = doc_stats(ds)

    def _f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("n_words"), pa.scalar(60)))
        return t.select(["doc_id", "n_words"])

    return out.map_batches(_f, batch_format="pyarrow")


SQL_QUALITY_FILTER = r"""
SELECT doc_id, LEN(regexp_extract_all(text, '\S+')) AS n_words
FROM documents
WHERE LEN(regexp_extract_all(text, '\S+')) >= 60
"""


def _query_vectors(sf_dir: str, n: int = 5):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    df = t.to_pandas().sort_values("vec_id").head(n)
    return np.array(df["embedding"].tolist(), np.float64), df["vec_id"].tolist()


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k against broadcast query vectors (queries
    = the 5 lowest vec_ids, k=10, self excluded)."""
    from bento_ray.textops import cosine_topk

    qm, qids = _query_vectors(sf_dir, 5)
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = cosine_topk(ds, qm, qids, k=10)
    return out.select_columns(["query_id", "vec_id", "rank"])


SQL_ANN = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings ORDER BY vec_id LIMIT 5
)
SELECT query_id, vec_id, rank FROM (
  SELECT q.query_id, e.vec_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) DESC,
                    e.vec_id) AS rank
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
) WHERE rank <= 10
"""


def q_embedding_norms(sf_dir: str):
    ds = _t(sf_dir, "embeddings", ["label", "embedding"])

    def _f(t: pa.Table) -> pa.Table:
        m = np.array(t.column("embedding").to_pylist(), np.float64)
        norms = np.linalg.norm(m, axis=1)
        return pa.table({"label": t.column("label"),
                         "norm": pa.array(norms, pa.float64())})

    ds = ds.map_batches(_f, batch_format="pyarrow")
    out = ds.groupby("label").aggregate(
        Count(alias_name="n_vecs"), Mean("norm", alias_name="avg_norm"))
    return _round_cols(out, ["avg_norm"])


SQL_NORMS = """
SELECT label, COUNT(*) AS n_vecs,
       ROUND(AVG(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[])))), 4)
         AS avg_norm
FROM embeddings GROUP BY label
"""


def q_salted_hot_key_agg(sf_dir: str):
    """Salted-key skew mitigation, verified: ``event_type`` has only 5
    values (every key is hot), so a naive groupby serializes 2k+ rows
    per reducer on one key. Two-phase with salt: partial aggregates per
    (event_type, salt) inside map_batches — 16× more, far smaller groups
    — then a final merge re-combines the salted groups. Result must
    equal the plain GROUP BY."""
    from bento_ray.util import stable_hash

    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])
    SALTS = 16

    def _partial(t: pa.Table) -> pa.Table:
        # Arrow-native combiner: ONE hash-aggregate per batch, no
        # pandas round-trip in the hot path
        salt = pa.array((stable_hash(t.column("event_id")) % SALTS)
                        .astype(np.int64), pa.int64())
        agg = (t.append_column("__salt", salt)
                .group_by(["event_type", "__salt"])
                .aggregate([("value", "count"), ("value", "sum")]))
        return pa.table({
            "event_type": agg.column("event_type"),
            "__salt": agg.column("__salt"),
            "n": agg.column("value_count").cast(pa.int64()),
            "s": agg.column("value_sum"),
        })

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    out = partials.groupby("event_type").aggregate(
        Sum("n", alias_name="n_events"), Sum("s", alias_name="sum_value"))

    def _fix(t: pa.Table) -> pa.Table:
        from bento_ray.util import duckdb_round

        t = t.set_column(t.column_names.index("n_events"), "n_events",
                         t.column("n_events").cast(pa.int64()))
        vals = duckdb_round(t.column("sum_value").to_numpy(
            zero_copy_only=False), 4)
        return t.set_column(t.column_names.index("sum_value"), "sum_value",
                            pa.array(vals, pa.float64()))

    return out.map_batches(_fix, batch_format="pyarrow")


SQL_SALTED = """
SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY event_type
"""


def q_nation_revenue(sf_dir: str):
    """Multi-join: orders ⋈ customer (hash shuffle) ⋈ nation (broadcast)
    → revenue per nation."""
    import pyarrow.parquet as pq

    from bento_ray.stages.join import broadcast_join, shuffle_join

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda t: t.rename_columns(["c_custkey", "o_totalprice"]),
        batch_format="pyarrow")
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = shuffle_join(orders, cust, on="c_custkey", how="inner")
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nation = nation.rename_columns(["c_nationkey", "n_name"])
    joined = broadcast_join(joined, nation, on="c_nationkey", how="inner")
    out = joined.groupby("n_name").aggregate(
        Count(alias_name="n_orders"),
        Sum("o_totalprice", alias_name="revenue"))
    return _round_cols(out, ["revenue"])


SQL_NATION = """
SELECT n_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 4) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_minmax_events(sf_dir: str):
    ds = _t(sf_dir, "events", ["event_type", "value", "ts"])
    out = ds.groupby("event_type").aggregate(
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
        Min("ts", alias_name="first_ts"),
        Max("ts", alias_name="last_ts"),
    )
    return _round_cols(out, ["min_value", "max_value"])


SQL_MINMAX = """
SELECT event_type, ROUND(MIN(value), 4) AS min_value,
       ROUND(MAX(value), 4) AS max_value,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM events GROUP BY event_type
"""


def q_distinct_users(sf_dir: str):
    """COUNT(DISTINCT …): two-level grouped aggregate (the distributed
    distinct idiom — dedupe to pairs, then count)."""
    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="__c")).select_columns(["event_type", "user_id"])
    return pairs.groupby("event_type").aggregate(
        Count(alias_name="n_users"))


SQL_DISTINCT = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def q_union_streams(sf_dir: str):
    """broker fan-in (union) of two filtered streams + aggregate."""
    ds = _t(sf_dir, "events", ["event_type", "value"])
    a = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), pa.scalar("click"))),
        batch_format="pyarrow")
    b = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), pa.scalar("view"))),
        batch_format="pyarrow")
    out = a.union(b).groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    return _round_cols(out, ["sum_value"])


SQL_UNION = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM (
  SELECT event_type, value FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT event_type, value FROM events WHERE event_type = 'view'
) GROUP BY event_type
"""


# -- hash-arithmetic text ops: oracled via FNV-1a replicated in SQL --------

# The engine's 61-bit word hash (textops/quality.py word_hashes:
# FNV-1a over utf-8 bytes with uint64 wraparound, folded % (2^61-1))
# replicated in DuckDB: bytes via hex(encode(w)) digit pairs, the
# xor-multiply chain as a list_reduce fold in HUGEINT (the 2^64 wrap
# is an explicit mod; products stay < 2^104 so int128 never
# overflows). Bit-identical to hash_word() — pinned in tests.
def _fnv_sql(expr: str) -> str:
    return f"""CAST(list_reduce(
    list_prepend(CAST(14695981039346656037 AS HUGEINT),
      list_transform(generate_series(1, octet_length(encode({expr}))),
        i -> CAST(strpos('0123456789abcdef',
                         substr(lower(hex(encode({expr}))), 2*i-1, 1)) * 16
           + strpos('0123456789abcdef',
                    substr(lower(hex(encode({expr}))), 2*i, 1)) - 17
             AS HUGEINT))),
    (h, x) -> (((h - (h % 256))
                + CAST(xor(CAST(h % 256 AS BIGINT), CAST(x AS BIGINT))
                       AS HUGEINT)) * 1099511628211)
              % 18446744073709551616
  ) % 2305843009213693951 AS BIGINT)"""


def q_minhash_near_dups(sf_dir: str):
    """MinHash+LSH candidate pairs with exact-Jaccard verification.
    Oracle: the exact-Jaccard 3-shingle self-join (SQL_MINHASH) — the
    verify step's ground truth. Equality holds because every true
    pair on this corpus sits at J ≥ 0.9, where the 16-band/64-perm
    LSH recall is 1 − (1 − 0.9⁴)¹⁶ ≈ 1 − 3e-8 and the run is
    deterministic (recall measured separately in pytest at lower
    thresholds)."""
    from bento_ray.textops import near_dup_pairs_minhash

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return near_dup_pairs_minhash(ds, threshold=0.15)


# Exact-Jaccard ground truth over the engine's own shingle space:
# distinct polynomial 3-gram shingles of FNV word hashes per doc
# (1-2-word docs hash the joined words as one shingle), self-join on
# shingle, |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold. The polynomial here
# needs no 2^64-wrap emulation for SET semantics (any injective image
# preserves intersection sizes), but uses the same fold as the
# fingerprint SQL for uniformity.
_SQL_MINHASH_BODY = rf"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS words FROM documents
),
wh AS (
  SELECT doc_id, unnest(generate_series(1, len(words))) AS i,
         {_fnv_sql('unnest(words)')} AS h
  FROM d WHERE len(words) >= 3
),
sh3 AS (
  SELECT DISTINCT a.doc_id,
    CAST((((CAST(a.h AS HUGEINT) * 1000003 + b.h) % 18446744073709551616)
           % 2305843009213693951 * 1000003 + c.h)
          % 18446744073709551616 % 2305843009213693951 AS BIGINT) AS shingle
  FROM wh a JOIN wh b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN wh c ON c.doc_id = a.doc_id AND c.i = a.i + 2
),
shj AS (
  SELECT doc_id, {_fnv_sql("array_to_string(words, ' ')")} AS shingle
  FROM d WHERE len(words) BETWEEN 1 AND 2
),
sh AS (SELECT * FROM sh3 UNION ALL SELECT * FROM shj),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(i / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.15
"""

SQL_MINHASH = _SQL_MINHASH_BODY + "ORDER BY doc_a, doc_b\n"


def q_dup_groups(sf_dir: str):
    """Duplicate groups: connected components over the verified
    MinHash near-dup pairs — each doc labeled with the smallest doc_id
    in its component (the canonical keeper for dedup). Distributed via
    alternating large-star/small-star (Kiveris et al. SOCC'14); the
    oracle computes the same components with a recursive reachability
    CTE over the exact-Jaccard pair set (equal to the engine's pairs —
    q_minhash_near_dups' green oracle)."""
    from bento_ray.textops import (connected_components,
                                   near_dup_pairs_minhash)

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    pairs = near_dup_pairs_minhash(ds, threshold=0.15)
    return connected_components(pairs)


SQL_DUP_GROUPS = rf"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_SQL_MINHASH_BODY}) mh
),
e AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(src, dst) AS (
  SELECT u, u FROM e
  UNION
  SELECT r.src, e2.v FROM reach r JOIN e e2 ON e2.u = r.dst
)
SELECT src AS doc_id, MIN(dst) AS group_id FROM reach GROUP BY src
ORDER BY doc_id
"""


def q_dedup_keep(sf_dir: str):
    """End-to-end near-dup group dedup: MinHash pairs → connected
    components → drop every non-representative member
    (textops.dedup_by_groups) — the full "keep one per duplicate
    cluster" pipeline a training-data run executes. Oracle: documents
    whose doc_id is not a non-root member of a component over the
    exact-Jaccard pair set."""
    from bento_ray.textops import (connected_components,
                                   near_dup_pairs_minhash)
    from bento_ray.textops.dedup import dedup_by_groups

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    pairs = near_dup_pairs_minhash(ds, threshold=0.15)
    labels = connected_components(pairs)
    return dedup_by_groups(ds, labels).select_columns(["doc_id"])


SQL_DEDUP_KEEP = rf"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_SQL_MINHASH_BODY}) mh
),
e AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(src, dst) AS (
  SELECT u, u FROM e
  UNION
  SELECT r.src, e2.v FROM reach r JOIN e e2 ON e2.u = r.dst
),
grp AS (
  SELECT src AS doc_id, MIN(dst) AS group_id FROM reach GROUP BY src
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM grp WHERE doc_id != group_id)
ORDER BY d.doc_id
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: per-doc 8-gram instance overlap
    against an eval set (here the deterministic doc_id % 29 == 0
    slice of the corpus, so eval docs self-report overlap 1.0 and
    their near-dups report high fractions). Oracle replicates the
    engine's FNV-word-hash 8-gram polynomial (the fingerprint fold)
    and the instance-join counting in SQL."""
    from bento_ray.textops import decontaminate

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _eval_slice(t):
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 29 == 0))

    eval_ds = ds.map_batches(_eval_slice, batch_format="pyarrow")
    return decontaminate(ds, eval_ds, n=8)


SQL_DECONTAMINATE = rf"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS words FROM documents
),
wh AS (
  SELECT doc_id, unnest(generate_series(1, len(words))) AS i,
         {_fnv_sql('unnest(words)')} AS h
  FROM d WHERE len(words) >= 1
),
hl AS (SELECT doc_id, list(h ORDER BY i) AS hs FROM wh GROUP BY doc_id),
ng AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(hs) - 7),
           i -> CAST(list_reduce(
                  list_prepend(CAST(0 AS HUGEINT),
                    list_transform(hs[i : i + 7],
                                   x -> CAST(x AS HUGEINT))),
                  (acc, x) -> ((acc * 1000003 + x)
                               % 18446744073709551616)
                              % 2305843009213693951) AS BIGINT)))
           AS ngh
  FROM hl WHERE len(hs) >= 8
),
ev AS (SELECT DISTINCT ngh FROM ng WHERE doc_id % 29 = 0),
hits AS (SELECT g.doc_id, count(*) AS n_overlap
         FROM ng g JOIN ev USING (ngh) GROUP BY g.doc_id),
tot AS (SELECT doc_id,
               GREATEST(COALESCE(len(words), 0) - 7, 0) AS n_ngrams
        FROM d)
SELECT t.doc_id, t.n_ngrams,
       COALESCE(h.n_overlap, 0) AS n_overlap,
       ROUND(COALESCE(h.n_overlap, 0)
             / GREATEST(t.n_ngrams, 1), 6) AS overlap_frac
FROM tot t LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
"""


def q_unigram_logprob(sf_dir: str):
    """Self-trained unigram-LM quality signal (CCNet-style perplexity
    proxy): mean negative log-prob per doc in nats. Float parity with
    the oracle holds bit-exactly because per-token costs are quantized
    to integer micro-nats before the per-doc sum (order-independent
    integer reduction on both engines)."""
    from bento_ray.textops import unigram_logprob

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return unigram_logprob(ds)


SQL_UNIGRAM_LOGPROB = r"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS words FROM documents
),
tok AS (SELECT doc_id, unnest(words) AS w FROM d),
vocab AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
tot AS (SELECT SUM(c) AS n FROM vocab),
q AS (SELECT w, CAST(ROUND(ln(c / n) * 1000000) AS BIGINT) AS micro
      FROM vocab, tot),
s AS (SELECT doc_id, SUM(micro) AS sm, count(*) AS cnt
      FROM tok JOIN q USING (w) GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(s.cnt, 0) AS n_words,
       COALESCE(ROUND(-s.sm / 1000000.0 / s.cnt, 6), 0.0) AS neg_logprob
FROM d LEFT JOIN s USING (doc_id)
ORDER BY d.doc_id
"""


def q_bigram_logprob(sf_dir: str):
    """Order-2 LM quality signal (stupid backoff), trained on the
    ENGLISH subset and scoring EVERY doc — so out-of-domain docs
    exercise the backoff and OOV branches on the hash-checked path.
    Same integer micro-nat discipline as q_unigram_logprob; the SQL
    replays the identical cost arithmetic (seen-bigram ln(c2/c1(a)),
    unseen ln(0.4)+unigram, OOV floor ln(1/N))."""
    from bento_ray.textops import bigram_logprob

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    train = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("lang"), pa.scalar("en"))),
        batch_format="pyarrow")
    return bigram_logprob(ds, train=train).sort("doc_id")


SQL_BIGRAM_LOGPROB = r"""
WITH d AS (
  SELECT doc_id, lang, regexp_extract_all(text, '\S+') AS words
  FROM documents
),
tok AS (SELECT doc_id, lang, unnest(words) AS w,
               unnest(range(1, len(words) + 1)) AS i FROM d),
ttr AS (SELECT * FROM tok WHERE lang = 'en'),
trans_tr AS (SELECT a.doc_id, a.w AS a, b.w AS b
             FROM ttr a JOIN ttr b
               ON b.doc_id = a.doc_id AND b.i = a.i + 1),
vocab AS (SELECT w, count(*) AS c FROM ttr GROUP BY w),
tot AS (SELECT SUM(c) AS n FROM vocab),
oov AS (SELECT CAST(ROUND(ln(1.0 / n) * 1000000) AS BIGINT) AS m
        FROM tot),
q1 AS (SELECT w, CAST(ROUND(ln(c / n) * 1000000) AS BIGINT) AS micro
       FROM vocab, tot),
big AS (SELECT a, b, count(*) AS c2 FROM trans_tr GROUP BY a, b),
q2 AS (SELECT big.a, big.b,
              CAST(ROUND(ln(big.c2 / v.c) * 1000000) AS BIGINT) AS micro
       FROM big JOIN vocab v ON v.w = big.a),
trans AS (SELECT a.doc_id, a.w AS a, b.w AS b
          FROM tok a JOIN tok b
            ON b.doc_id = a.doc_id AND b.i = a.i + 1),
costs AS (
  SELECT f.doc_id, COALESCE(q1.micro, (SELECT m FROM oov)) AS micro
  FROM (SELECT doc_id, w FROM tok WHERE i = 1) f
  LEFT JOIN q1 ON q1.w = f.w
  UNION ALL
  SELECT t.doc_id,
         COALESCE(q2.micro,
                  -916291 + COALESCE(q1b.micro, (SELECT m FROM oov)))
  FROM trans t LEFT JOIN q2 ON q2.a = t.a AND q2.b = t.b
               LEFT JOIN q1 q1b ON q1b.w = t.b
),
s AS (SELECT doc_id, CAST(SUM(micro) AS BIGINT) AS sm, count(*) AS cnt
      FROM costs GROUP BY doc_id)
SELECT d.doc_id, COALESCE(s.cnt, 0) AS n_words,
       COALESCE(ROUND(-s.sm / 1000000.0 / s.cnt, 6), 0.0) AS neg_logprob2
FROM d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id
"""


def q_dsir_select(sf_dir: str):
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169):
    hashed unigram+bigram bucket distributions fit on the full corpus
    (raw) and on its English subset (target); every doc scored by the
    integer micro-nat log-ratio sum; deterministic top-100 (weight
    desc, doc_id asc). The oracle replicates the FNV word hash, the
    bigram polynomial fold, the 10k-bucket mod, the Laplace-smoothed
    log-ratio quantization and the ranking in SQL — the whole
    selection pipeline is on the hash-checked path."""
    from bento_ray.textops import dsir_select

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    target = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("lang"), pa.scalar("en"))),
        batch_format="pyarrow")
    return dsir_select(ds, target, k=100)


SQL_DSIR_SELECT = rf"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS words FROM documents
),
wh AS (
  SELECT doc_id, unnest(generate_series(1, len(words))) AS i,
         {_fnv_sql('unnest(words)')} AS h
  FROM d WHERE len(words) >= 1
),
hl AS (SELECT doc_id, list(h ORDER BY i) AS hs FROM wh GROUP BY doc_id),
bi AS (
  SELECT doc_id, CAST(list_reduce(
           list_prepend(CAST(0 AS HUGEINT),
             list_transform(hs[i : i + 1], x -> CAST(x AS HUGEINT))),
           (acc, x) -> ((acc * 1000003 + x) % 18446744073709551616)
                       % 2305843009213693951) AS BIGINT) % 10000 AS b
  FROM (SELECT doc_id, unnest(generate_series(1, len(hs) - 1)) AS i, hs
        FROM hl WHERE len(hs) >= 2)
),
feats AS (
  SELECT doc_id, h % 10000 AS b FROM wh
  UNION ALL SELECT doc_id, b FROM bi
),
cr AS (SELECT b, count(*) AS c FROM feats GROUP BY b),
nr AS (SELECT count(*) AS n FROM feats),
tf AS (SELECT f.doc_id, f.b FROM feats f
       JOIN documents doc ON doc.doc_id = f.doc_id
       WHERE doc.lang = 'en'),
ct AS (SELECT b, count(*) AS c FROM tf GROUP BY b),
nt AS (SELECT count(*) AS n FROM tf),
lam AS (
  SELECT cr.b,
         CAST(ROUND((ln((COALESCE(ct.c, 0) + 1.0) / (nt.n + 10000.0))
                   - ln((cr.c + 1.0) / (nr.n + 10000.0))) * 1000000)
              AS BIGINT) AS micro
  FROM cr LEFT JOIN ct USING (b), nr, nt
),
s AS (SELECT doc_id, count(*) AS n_feats, SUM(micro) AS w
      FROM feats JOIN lam USING (b) GROUP BY doc_id)
SELECT d.doc_id, COALESCE(s.n_feats, 0) AS n_feats,
       CAST(COALESCE(s.w, 0) AS BIGINT) AS micro_weight
FROM d LEFT JOIN s USING (doc_id)
ORDER BY micro_weight DESC, d.doc_id
LIMIT 100
"""


def q_dup_window_coverage(sf_dir: str):
    """Span-level duplication coverage (Lee et al. 2022 hash-window
    approximation): per-doc fraction of tokens covered by an 8-token
    window duplicated across ≥2 documents. Oracle replicates the
    window-hash fold, the distinct-doc document frequency, and the
    interval union (DISTINCT positions) in SQL."""
    from bento_ray.textops import dup_window_coverage

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return dup_window_coverage(ds, n=8)


# Shared CTE body: per-doc (position, window-hash) pairs, the ≥2-doc
# duplicated-window set, and the DISTINCT covered token positions.
_SQL_DUPWIN_BODY = rf"""
d AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS words FROM documents
),
wh AS (
  SELECT doc_id, unnest(generate_series(1, len(words))) AS i,
         {_fnv_sql('unnest(words)')} AS h
  FROM d WHERE len(words) >= 1
),
hl AS (SELECT doc_id, list(h ORDER BY i) AS hs FROM wh GROUP BY doc_id),
ngp AS (
  SELECT doc_id, u['s'] AS s, u['h'] AS ngh
  FROM (SELECT doc_id,
          unnest(list_transform(generate_series(1, len(hs) - 7),
            i -> {{'s': i, 'h': CAST(list_reduce(
                   list_prepend(CAST(0 AS HUGEINT),
                     list_transform(hs[i : i + 7],
                                    x -> CAST(x AS HUGEINT))),
                   (acc, x) -> ((acc * 1000003 + x)
                                % 18446744073709551616)
                               % 2305843009213693951) AS BIGINT)}})) AS u
        FROM hl WHERE len(hs) >= 8)
),
dup AS (SELECT ngh FROM (SELECT ngh, count(DISTINCT doc_id) AS dd
                         FROM ngp GROUP BY ngh) WHERE dd >= 2),
cov AS (SELECT DISTINCT doc_id, p FROM (
          SELECT g.doc_id AS doc_id,
                 unnest(generate_series(g.s, g.s + 7)) AS p
          FROM ngp g JOIN dup USING (ngh)))
"""


SQL_DUP_WINDOW_COVERAGE = rf"""
WITH {_SQL_DUPWIN_BODY},
tot AS (SELECT doc_id, COALESCE(len(words), 0) AS n_tokens FROM d),
ccount AS (SELECT doc_id, count(*) AS n_covered FROM cov GROUP BY doc_id)
SELECT t.doc_id, t.n_tokens,
       COALESCE(c.n_covered, 0) AS n_covered,
       ROUND(COALESCE(c.n_covered, 0)
             / GREATEST(t.n_tokens, 1), 6) AS covered_frac
FROM tot t LEFT JOIN ccount c USING (doc_id)
ORDER BY t.doc_id
"""


def q_remove_dup_spans(sf_dir: str):
    """The span-dedup APPLY step: drop every token covered by a
    duplicated 8-token window and re-join with single spaces (Arrow
    ListArray + binary_join — no per-doc Python strings). Hash-level
    text parity with the SQL oracle."""
    from bento_ray.textops import remove_dup_spans

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return remove_dup_spans(ds, n=8)


SQL_REMOVE_DUP_SPANS = rf"""
WITH {_SQL_DUPWIN_BODY},
tok AS (SELECT doc_id, unnest(generate_series(1, len(words))) AS i,
               unnest(words) AS w
        FROM d WHERE len(words) >= 1),
kept AS (SELECT t.doc_id, t.i, t.w FROM tok t
         LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.i
         WHERE c.doc_id IS NULL),
ctext AS (SELECT doc_id,
                 array_to_string(list(w ORDER BY i), ' ') AS clean_text,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(c.clean_text, '') AS clean_text,
       COALESCE(len(d.words), 0) - COALESCE(c.n_kept, 0) AS n_removed
FROM d LEFT JOIN ctext c USING (doc_id)
ORDER BY d.doc_id
"""


def q_snowcat_pii(sf_dir: str):
    """opensnowcat drop + PII-transform semantics, driver-oracled:
    deterministic Snowplow enriched-TSV rows synthesized from the
    documents table run through the processor engine (drop filter on
    the second IP octet, SHA-256+salt user hash, 2-octet IP
    anonymization, network-id redaction, tsv output); the oracle
    replicates the exact column surgery in SQL (sha256(), substring
    masking, ci-contains drop)."""
    from bento_ray.snowcat import COLUMNS, OpenSnowcat

    ds = _t(sf_dir, "documents", ["doc_id", "lang"])
    ncols = len(COLUMNS)

    def _run(t):
        eng = OpenSnowcat(
            output_format="tsv",
            drop={"user_ipaddress": {"contains": ["10.3."]}},
            transform={"salt": "salty", "hash_algo": "SHA-256",
                       "fields": {
                           "user_id": {"strategy": "hash"},
                           "user_ipaddress": {
                               "strategy": "anonymize_ip",
                               "anon_octets": 2},
                           "network_userid": {
                               "strategy": "redact",
                               "redact_value": "[REDACTED]"}}})
        ids = t.column("doc_id").to_pylist()
        langs = t.column("lang").to_pylist()
        out_ids, out_tsv = [], []
        for i, lang in zip(ids, langs):
            cols = [""] * ncols
            cols[0] = f"app{i % 7}"
            cols[5] = "page_view"
            cols[12] = f"user{i}"
            cols[13] = f"10.{i % 256}.{(i // 256) % 256}.{i % 100}"
            cols[17] = f"net{i}"
            cols[77] = f"UA {lang}"
            res = eng.process("\t".join(cols))
            if res is not None:
                out_ids.append(i)
                out_tsv.append(res)
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "out_tsv": pa.array(out_tsv, pa.string())})

    return ds.map_batches(_run, batch_format="pyarrow")


SQL_SNOWCAT_PII = r"""
WITH base AS (
  SELECT doc_id,
    'app' || CAST(doc_id % 7 AS VARCHAR) AS app_id,
    'user' || CAST(doc_id AS VARCHAR) AS uid,
    '10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
          || CAST((doc_id // 256) % 256 AS VARCHAR) || '.'
          || CAST(doc_id % 100 AS VARCHAR) AS ip,
    'net' || CAST(doc_id AS VARCHAR) AS net,
    'UA ' || lang AS ua
  FROM documents
),
kept AS (SELECT * FROM base
         WHERE NOT contains(lower(ip), '10.3.')),
tx AS (
  SELECT doc_id, app_id,
         sha256(uid || 'salty') AS uid_h,
         split_part(ip, '.', 1) || '.' || split_part(ip, '.', 2)
           || '.x.x' AS ip_a,
         '[REDACTED]' AS net_r, ua
  FROM kept
)
SELECT doc_id,
       app_id || repeat(chr(9), 5) || 'page_view'
              || repeat(chr(9), 7) || uid_h
              || chr(9) || ip_a
              || repeat(chr(9), 4) || net_r
              || repeat(chr(9), 60) || ua
              || repeat(chr(9), 53) AS out_tsv
FROM tx
ORDER BY doc_id
"""


def q_wasm_uppercase(sf_dir: str):
    """The ``wasm`` processor as a distributed stage: every document's
    text runs through the reference's TinyGo uppercase example module
    (processor_wazero_test.go:20, rebuilt bytecode-for-bytecode by
    wasmbuild.build_uppercase_module) on the from-scratch interpreter.
    Actor-pool stage: the module decodes + instantiates ONCE per actor
    in __init__; per batch each row becomes a message and the module's
    exported ``process()`` is invoked against it (the per-message
    contract of processor_wazero.go:141). The oracle replicates the
    module's exact ASCII-only semantics with translate() — upper()
    would diverge on non-ASCII."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    class _WasmUpper:
        def __init__(self):
            from bento_ray.config.processors import Runtime
            from bento_ray.wasmbuild import build_uppercase_module
            from bento_ray.wasmproc import WasmProcessor

            self.proc = WasmProcessor(
                module_bytes=build_uppercase_module())
            self.rt = Runtime()

        def __call__(self, t: pa.Table) -> pa.Table:
            from bento_ray.blobl.interp import Message

            batch = [Message.from_content(s.encode())
                     for s in t.column("text").to_pylist()]
            out = self.proc.process_batch(batch, self.rt)[0] \
                if batch else []
            return pa.table({
                "doc_id": t.column("doc_id"),
                "text_upper": pa.array(
                    [m.content_bytes().decode() for m in out],
                    pa.string()),
            })

    # interpreter-bound (~3 ms/doc): width, not batch shape, sets the
    # wall time — small batches keep the actor pool load-balanced
    return ds.map_batches(_WasmUpper, batch_format="pyarrow",
                          concurrency=(4, 16), batch_size=64)


_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
SQL_WASM_UPPER = f"""
SELECT doc_id,
       translate(text, '{_ASCII_LOWER}', '{_ASCII_LOWER.upper()}')
         AS text_upper
FROM documents
"""


def q_sequence_packing(sf_dir: str):
    """Tokenize-and-pack: concatenate docs in doc_id order, chunk into
    512-token sequences, report per-doc token offset + first/last
    sequence. Oracle is the SQL running-sum window; the engine is the
    distributed ordered prefix-sum (range buckets → driver-sized
    bucket prefixes → one groupby exchange)."""
    from bento_ray.textops import sequence_packing

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return sequence_packing(ds, seq_len=512)


SQL_SEQUENCE_PACKING = r"""
WITH d AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+')) AS ntok
  FROM documents
),
o AS (
  SELECT doc_id, ntok,
         CAST(COALESCE(SUM(ntok) OVER (ORDER BY doc_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM d
)
SELECT doc_id,
       ntok AS n_tokens,
       off AS token_offset,
       CASE WHEN ntok = 0 THEN -1 ELSE off // 512 END AS first_seq,
       CASE WHEN ntok = 0 THEN -1
            ELSE (off + ntok - 1) // 512 END AS last_seq
FROM o
ORDER BY doc_id
"""


def q_simhash(sf_dir: str):
    """64-bit SimHash per doc; oracle SQL_SIMHASH replicates the FNV
    word hashes and the per-bit ±1 vote exactly (bits 61-63 of a
    61-bit hash are always 0, so their votes are all −1 and never
    set)."""
    from bento_ray.textops import simhash64

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return simhash64(ds).select_columns(["doc_id", "simhash"])


SQL_SIMHASH = rf"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS words FROM documents
),
wh AS (
  SELECT doc_id, {_fnv_sql('unnest(words)')} AS h
  FROM d WHERE len(words) >= 1
),
hc AS (SELECT doc_id, h, COUNT(*) AS c FROM wh GROUP BY doc_id, h),
bits AS (
  SELECT doc_id, bb.b AS b,
         SUM(CASE WHEN (h >> bb.b) & 1 = 1 THEN c ELSE -c END) AS acc
  FROM hc, (SELECT unnest(generate_series(0, 60)) AS b) bb
  GROUP BY doc_id, bb.b
),
sfp AS (
  SELECT doc_id,
         SUM(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
           AS simhash
  FROM bits GROUP BY doc_id
)
SELECT d2.doc_id AS doc_id, CAST(COALESCE(sfp.simhash, 0) AS BIGINT) AS simhash
FROM documents d2 LEFT JOIN sfp ON sfp.doc_id = d2.doc_id
"""


def q_length_quantiles(sf_dir: str):
    """Per-language word-count quantiles via the bounded histogram
    combiner (textops.length_quantiles) — exact integer quantiles
    (smallest w with cumulative count ≥ ceil(q·n)), mirrored 1:1 in
    the SQL's cumulative-window formulation."""
    from bento_ray.textops.quality import length_quantiles

    ds = _t(sf_dir, "documents", ["lang", "text"])
    return length_quantiles(ds)


SQL_LENGTH_QUANTILES = r"""
WITH wc AS (
  SELECT lang, LEN(regexp_extract_all(COALESCE(text, ''), '\S+')) AS w
  FROM documents
),
n AS (SELECT lang, COUNT(*) AS n FROM wc GROUP BY lang),
cum AS (
  SELECT lang, w,
         SUM(COUNT(*)) OVER (PARTITION BY lang ORDER BY w) AS c
  FROM wc GROUP BY lang, w
)
SELECT cum.lang,
  MIN(CASE WHEN c >= CAST(CEIL(0.50 * n.n) AS BIGINT) THEN w END) AS p50,
  MIN(CASE WHEN c >= CAST(CEIL(0.90 * n.n) AS BIGINT) THEN w END) AS p90,
  MIN(CASE WHEN c >= CAST(CEIL(0.99 * n.n) AS BIGINT) THEN w END) AS p99,
  CAST(MAX(n.n) AS BIGINT) AS n_docs
FROM cum JOIN n ON n.lang = cum.lang
GROUP BY cum.lang
ORDER BY cum.lang
"""


def q_value_quantiles(sf_dir: str):
    """Quantiles of the continuous events.value column via the
    mergeable KLL-style sketch (bento_ray/sketches.py). Gate k = 1e6
    ≥ n, so no compactor fires and the distributed machinery — block
    partials, level-wise Arrow serialization, the bounded merge tree,
    CDF inversion — must reproduce the exact order statistics the SQL
    cumulative-window oracle computes (smallest value with cumulative
    count ≥ ceil(q·n), the length_quantiles rank rule). Approximation
    error at sketch-sized k is pinned in tests/test_sketches.py.
    Values are selected (not computed) doubles, so the float hash
    compare is exact."""
    from bento_ray.sketches import kll_quantiles

    ds = _t(sf_dir, "events", ["value"])
    return kll_quantiles(ds, "value", qs=(0.5, 0.9, 0.99), k=1_000_000)


SQL_VALUE_QUANTILES = """
WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
n AS (SELECT COUNT(*) AS n FROM v),
cum AS (
  SELECT value, SUM(COUNT(*)) OVER (ORDER BY value) AS c
  FROM v GROUP BY value
)
SELECT t.q,
       (SELECT MIN(value) FROM cum, n
         WHERE c >= CAST(CEIL(t.q * n.n) AS BIGINT)) AS value,
       (SELECT CAST(n AS BIGINT) FROM n) AS n
FROM (VALUES (0.5), (0.9), (0.99)) AS t(q)
ORDER BY t.q
"""


def q_heavy_hitters(sf_dir: str):
    """Top-20 terms via the Misra-Gries mergeable summary
    (bento_ray/sketches.py) — the capacity-bounded alternative to
    q_term_frequency's vocabulary-sized shuffle. Gate capacity 1e6 ≥
    distinct(terms), so no MG subtraction fires and the block
    summaries + merge tree must reproduce exact counts — shares
    SQL_TERM_FREQ. Lower-bound behavior at sketch-sized capacity is
    pinned in tests/test_sketches.py."""
    from bento_ray.sketches import mg_top_terms

    ds = _t(sf_dir, "documents", ["text"])
    return mg_top_terms(ds, k=20, capacity=1_000_000)


def q_distinct_users_hll(sf_dir: str):
    """Global distinct user_ids via HyperLogLog with the exact sparse
    gate (sparse_limit 1e6 ≥ distinct): every block summary stays the
    unique-hash set, merges are set unions, and the reported count
    must equal COUNT(DISTINCT user_id). Dense-register accuracy
    (≈1.04/√2^p) is pinned in tests/test_sketches.py."""
    from bento_ray.sketches import hll_distinct

    ds = _t(sf_dir, "events", ["user_id"])
    return hll_distinct(ds, "user_id", sparse_limit=1_000_000)


SQL_DISTINCT_HLL = """
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events
"""


def q_embedding_dim_stats(sf_dir: str):
    """Per-dimension mean/std over the embeddings table via the
    moment combiner (sum/sumsq/n partials per block). Both sides round
    half-away-from-zero to 4 decimals; float64 accumulation over ≤1e5
    unit-range float32 values keeps the association error ~1e-12,
    far inside the rounding grain."""
    from bento_ray.textops.similarity import embedding_dim_stats

    ds = _t(sf_dir, "embeddings", ["embedding"])
    return embedding_dim_stats(ds)


SQL_EMBEDDING_DIM_STATS = """
WITH d AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
)
SELECT CAST(dim AS BIGINT) AS dim,
       ROUND(AVG(v), 4) AS mean,
       ROUND(SQRT(GREATEST(AVG(v * v) - AVG(v) * AVG(v), 0)), 4) AS std,
       COUNT(*) AS n
FROM d GROUP BY dim ORDER BY dim
"""


def q_token_counts(sf_dir: str):
    """BPE-ish pre-tokenizer token counts per doc plus the whitespace
    word count — both sides of the oracle run the SAME RE2 pattern
    (Arrow's count_substring_regex here, DuckDB's regexp_extract_all
    there), so parity is by construction."""
    from bento_ray.textops.quality import token_counts

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return token_counts(ds).map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": t.column("n_tokens"),
            "n_words": pc.count_substring_regex(
                t.column("text"), r"\S+").cast(pa.int64()).fill_null(0),
        }), batch_format="pyarrow")


def _token_counts_sql() -> str:
    from bento_ray.textops.quality import BPE_TOKEN_PATTERN

    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    return rf"""
SELECT doc_id,
       LEN(regexp_extract_all(COALESCE(text, ''), '{pat}')) AS n_tokens,
       LEN(regexp_extract_all(COALESCE(text, ''), '\S+')) AS n_words
FROM documents
ORDER BY doc_id
"""


def q_lang_id(sf_dir: str):
    """Stopword-ratio language ID — the heuristic is pure counting, so
    the DuckDB oracle replicates it exactly: per-language score =
    stopword hits / word count, argmax with alphabetical tie-break,
    'und' when every score is zero."""
    from bento_ray.textops import lang_id_stage

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return lang_id_stage(ds).select_columns(["doc_id", "pred_lang", "lang_conf"])


def _lang_id_sql() -> str:
    from bento_ray.textops.quality import _STOPWORDS

    langs = sorted(lg for lg in _STOPWORDS if _STOPWORDS[lg])
    cols = []
    for lg in langs:
        lits = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lg]))
        cols.append(
            f"SUM(CASE WHEN w IN ({lits}) THEN 1 ELSE 0 END)"
            f" / CAST(COUNT(*) AS DOUBLE) AS {lg}")
    lang_vals = ", ".join(f"('{lg}')" for lg in langs)
    case = " ".join(f"WHEN '{lg}' THEN sc.{lg}" for lg in langs)
    return rf"""
WITH w AS (
  SELECT doc_id, lower(unnest(regexp_extract_all(text, '[^\W\d_]+'))) AS w
  FROM documents
), sc AS (
  SELECT doc_id, {", ".join(cols)} FROM w GROUP BY doc_id
), scores AS (
  SELECT sc.doc_id, l.lang, CASE l.lang {case} END AS score
  FROM sc, (VALUES {lang_vals}) l(lang)
), best AS (
  SELECT doc_id,
         CASE WHEN score > 0 THEN lang ELSE 'und' END AS pred_lang,
         ROUND(score, 6) AS lang_conf
  FROM scores
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, lang ASC) = 1
)
SELECT d.doc_id,
       COALESCE(b.pred_lang, 'und') AS pred_lang,
       COALESCE(b.lang_conf, 0.0) AS lang_conf
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
"""


SQL_LANG_ID = _lang_id_sql()


def q_doc_fingerprints(sf_dir: str):
    """Winnowing-style doc fingerprints (min + count of distinct
    8-word rolling window hashes); oracle SQL_FINGERPRINTS replicates
    the polynomial INCLUDING numpy's uint64 wraparound (the engine's
    `out * BASE + h` wraps mod 2^64 before the mod-Mersenne fold, so
    the SQL fold applies both mods)."""
    from bento_ray.textops import fingerprint_stage

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return fingerprint_stage(ds).select_columns(
        ["doc_id", "fingerprint", "n_windows"])


SQL_FINGERPRINTS = rf"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS words FROM documents
),
wh AS (
  SELECT doc_id, unnest(generate_series(1, len(words))) AS i,
         {_fnv_sql('unnest(words)')} AS h
  FROM d WHERE len(words) >= 1
),
hl AS (SELECT doc_id, list(h ORDER BY i) AS hs FROM wh GROUP BY doc_id),
win AS (
  SELECT doc_id,
    list_transform(generate_series(1, len(hs) - LEAST(8, len(hs)) + 1),
      i -> CAST(list_reduce(
             list_prepend(CAST(0 AS HUGEINT),
               list_transform(hs[i : i + LEAST(8, len(hs)) - 1],
                              x -> CAST(x AS HUGEINT))),
             (acc, x) -> ((acc * 1000003 + x) % 18446744073709551616)
                         % 2305843009213693951) AS BIGINT)) AS outs
  FROM hl
)
SELECT d2.doc_id AS doc_id,
  CAST(COALESCE(list_aggregate(list_distinct(w.outs), 'min'), 0) AS BIGINT)
    AS fingerprint,
  CAST(COALESCE(list_unique(w.outs), 0) AS BIGINT) AS n_windows
FROM documents d2 LEFT JOIN win w ON w.doc_id = d2.doc_id
"""


def q_quality_scores(sf_dir: str):
    from bento_ray.textops import quality_stage

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return quality_stage(ds).select_columns(
        ["doc_id", "stop_ratio", "mean_word_len", "digit_ratio",
         "quality_score"])


# Mirrors QualityScorer exactly (textops/quality.py): words are \S+
# runs; metrics stay 0 for word-less docs (the Python loop `continue`s
# before computing ANY of them, digit_ratio included); the composite
# score is computed from the UNROUNDED metrics, then everything rounds
# at 6 digits (duckdb_round on the Ray side ≡ DuckDB ROUND).
SQL_QUALITY_SCORES = r"""
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(text, '\S+') AS words,
         length(regexp_replace(text, '\s', '', 'g')) AS wchars,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS ndig,
         length(text) AS nchars
  FROM documents
), m AS (
  SELECT doc_id,
    CASE WHEN len(words) = 0 THEN 0.0 ELSE
      len(list_filter(words, x -> lower(x) IN
          ('the','and','of','a','to','in','is','it','that','for')))
      / CAST(len(words) AS DOUBLE) END AS stop_ratio,
    CASE WHEN len(words) = 0 THEN 0.0
         ELSE wchars / CAST(len(words) AS DOUBLE) END AS mean_word_len,
    CASE WHEN len(words) = 0 THEN 0.0
         ELSE ndig / CAST(GREATEST(1, nchars) AS DOUBLE) END AS digit_ratio
  FROM w
)
SELECT doc_id,
  ROUND(stop_ratio, 6)    AS stop_ratio,
  ROUND(mean_word_len, 6) AS mean_word_len,
  ROUND(digit_ratio, 6)   AS digit_ratio,
  ROUND(LEAST(GREATEST(stop_ratio * 5, 0), 1) * 0.4
      + LEAST(GREATEST(1 - abs(mean_word_len - 5.0) / 5.0, 0), 1) * 0.4
      + LEAST(GREATEST(1 - digit_ratio * 10, 0), 1) * 0.2, 6)
    AS quality_score
FROM m
"""


def q_config_yaml_orders(sf_dir: str):
    """The declarative config surface end-to-end: a Bento-shaped YAML
    (parquet input → Bloblang ``mapping`` with a computed column and a
    ``deleted()`` filter → ``dedupe``) compiled by ``Pipeline.from_yaml``
    and executed distributed. First non-urgent order per customer."""
    from bento_ray.pipelines.builder import Pipeline

    yaml_text = f"""
input:
  parquet:
    path: {sf_dir}/orders.parquet
    columns: [o_orderkey, o_custkey, o_totalprice, o_orderpriority]
pipeline:
  processors:
    - mapping: |
        root = this
        root.charge = this.o_totalprice * 1.1
        root = if this.o_orderpriority == "1-URGENT" {{ deleted() }}
    - dedupe:
        key_cols: [o_custkey]
        keep: first
        order_cols: [o_orderkey]
"""
    return Pipeline.from_yaml(yaml_text).dataset()


SQL_CONFIG_YAML = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
       o_totalprice * 1.1 AS charge
FROM (SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderkey) AS rn
      FROM orders WHERE o_orderpriority <> '1-URGENT')
WHERE rn = 1
"""


def q_archive_roundtrip(sf_dir: str):
    """archive → unarchive identity (processor_archive.go /
    processor_unarchive.go semantics): each batch packs into ONE
    json_array document and explodes back; the oracle is the identity
    projection, so any serde loss hash-mismatches."""
    from bento_ray.stages.core import archive, unarchive

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    def _rt(t: pa.Table) -> pa.Table:
        return unarchive(archive(t, "json_array"), "json_array")

    return ds.map_batches(_rt, batch_format="pyarrow")


SQL_ARCHIVE_ROUNDTRIP = "SELECT doc_id, text, lang FROM documents"


def q_ann_lsh(sf_dir: str):
    """Multi-table multi-probe LSH top-k, gate-parameterized for
    accuracy parity: at 3 planes × 16 tables × 8 probes the candidate
    set provably covers the true top-10 on this corpus, so the output
    must EQUAL brute force — oracled with the same SQL as q_ann_topk
    (the machinery check: bucketing + probe + merge reproduce the
    exact result when coverage is complete). Approximate-parameter
    recall@10 (0.90 at 5 planes / 8 tables / 4 probes) stays pinned in
    tests/test_textops.py::test_lsh_ann_recall."""
    from bento_ray.textops import lsh_cosine_topk

    qm, qids = _query_vectors(sf_dir, 5)
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = lsh_cosine_topk(ds, qm, qids, k=10, num_planes=3,
                          num_tables=16, num_probes=8)
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_cosine_near_dups(sf_dir: str):
    """EXACT embedding-cosine near-duplicate pairs (cos ≥ 0.4 — the
    synthetic embeddings are loosely clustered, max pairwise cosine
    ~0.6, so a classic 0.9 threshold would be a trivially-empty
    oracle; 0.4 yields a real pair set with ≥ 1e-5 margin from the
    threshold at every tested scale). Output is float-free (id pairs
    only) so the hash compare is exact."""
    from bento_ray.textops import cosine_near_dups

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_near_dups(ds, threshold=0.4)


SQL_COSINE_NEAR_DUPS = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


def q_cosine_near_dups_lsh(sf_dir: str):
    """The LSH scale path for embedding near-dups: same semantics as
    q_cosine_near_dups but bucketed (one groupby shuffle, no broadcast
    matrix). Emitted pairs are exact-verified (precision 1.0), and at
    the gate parameterization (3 planes × 24 tables: per-table
    collision ≈ 0.25 at the θ ≈ 66° demonstration threshold, 24-table
    OR-recall ≈ 1 − 0.75²⁴ ≈ 0.999) the pair set equals the exact
    self-join, so this shares q_cosine_near_dups' oracle. Recall at
    scale parameters against planted cos ≥ 0.9 duplicates stays
    pinned in tests/test_textops.py."""
    from bento_ray.textops import cosine_near_dups_lsh

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_near_dups_lsh(ds, threshold=0.4, num_planes=3,
                                num_tables=24, dim=64)


def q_semdedup(sf_dir: str):
    """SemDeDup semantic dedup (Abbas et al. 2023): spherical-kmeans
    clustering + within-cluster cosine pruning, keep-min-id rule. At
    the 1-cell gate every doc sees every other, so the kept set must
    EQUAL the SQL ``NOT EXISTS`` lower-id self-join — the assigner,
    the cluster groupby, the priority ordering and the chunked
    triangular prune are all on the hash-checked path. Multi-cell
    behavior (bounded per-cluster candidate sets, the ``"far"``
    centroid-priority rule) is pinned in tests/test_textops.py.
    Threshold 0.4 matches q_cosine_near_dups (real pair set with
    ≥ 1e-5 margin on this corpus)."""
    from bento_ray.textops import semdedup

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semdedup(ds, threshold=0.4, num_cells=1, keep="min_id")


SQL_SEMDEDUP = """
SELECT e.vec_id
FROM embeddings e
WHERE NOT EXISTS (
  SELECT 1 FROM embeddings e2
  WHERE e2.vec_id < e.vec_id
    AND list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                               CAST(e2.embedding AS DOUBLE[])) >= 0.4)
"""


def q_ann_ivf(sf_dir: str):
    """IVF top-k with the 16-cell spherical-kmeans quantizer, probing
    ALL cells at the gate (exhaustive coverage ⇒ the cell-partitioned
    scan must reproduce brute force EXACTLY — oracled with the same
    SQL as q_ann_topk; the k-means assignment, per-cell scan, and
    candidate merge are all on the hash-checked path). Approximate
    recall at nprobe < cells (0.71 at nprobe=8 on these loosely
    clustered embeddings; ≥ 0.9 on tight clusters at nprobe=2) stays
    pinned in tests/test_textops.py."""
    from bento_ray.textops import ivf_cosine_topk

    qm, qids = _query_vectors(sf_dir, 5)
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ivf_cosine_topk(ds, qm, qids, k=10, num_cells=16, nprobe=16)
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_url_dedup(sf_dir: str):
    """URL canonicalization + canonical-key dedup — the first step of
    every web-crawl pipeline (the same page arrives as
    ``HTTP://WWW.X.COM:80/a/?utm_source=y&b=1#top`` and
    ``http://x.com/a?b=1``). The raw documents carry no URLs, so both
    sides lace a deterministic doc_id-derived messy URL (mixed-case
    scheme/host, www. prefixes, default ports, unordered + utm_ query
    params, fragments, trailing slashes) and then run their OWN
    canonicalization chain (vectorized Arrow/pandas here, DuckDB
    regexp/list kernels there) — the hash compares the canonical keys
    and collapse counts, verifying the canonicalizer itself.

    Scale shape: per-batch (canonical → count, min-id) Arrow partials
    bound the shuffle to one row per distinct canonical per block."""
    from bento_ray.textops.urlops import url_dedup

    ds = _t(sf_dir, "documents", ["doc_id"])

    def _lace(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        d = pd.Series(ids)
        s, p = d % 40, d % 7
        proto = pd.Series(np.where(s % 2 == 0, "http", "https"))
        scheme = proto.str.upper().where(d % 3 == 0, proto)
        www = pd.Series(np.where(d % 2 == 0, "www.", ""))
        site = "Site" + s.astype(str) + ".Example.COM"
        host = site.where(d % 5 == 0, "site" + s.astype(str) + ".example.com")
        port = pd.Series(np.where(s % 2 == 0, ":80", ":443")).where(
            d % 3 == 1, "")
        path = "/page/p" + p.astype(str) + pd.Series(
            np.where(d % 2 == 1, "/", ""))
        query = pd.Series(
            np.where(d % 2 == 0,
                     "?b=2&a=1&utm_source=x" + (d % 3).astype(str),
                     "?a=1&b=2"))
        frag = ("#sec" + (d % 6).astype(str)).where(d % 7 == 0, "")
        url = scheme + "://" + www + host + port + path + query + frag
        return pa.table({"doc_id": t.column("doc_id"),
                         "url": pa.array(url, pa.string())})

    laced = ds.map_batches(_lace, batch_format="pyarrow")
    return url_dedup(laced, col="url").sort("canonical_url")


SQL_URL_DEDUP = r"""
WITH laced AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN upper(proto) ELSE proto END || '://'
    || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END
    || CASE WHEN doc_id % 5 = 0
         THEN 'Site' || s || '.Example.COM'
         ELSE 'site' || s || '.example.com' END
    || CASE WHEN doc_id % 3 = 1
         THEN CASE WHEN proto = 'http' THEN ':80' ELSE ':443' END
         ELSE '' END
    || '/page/p' || (doc_id % 7)
    || CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END
    || CASE WHEN doc_id % 2 = 0
         THEN '?b=2&a=1&utm_source=x' || (doc_id % 3)
         ELSE '?a=1&b=2' END
    || CASE WHEN doc_id % 7 = 0 THEN '#sec' || (doc_id % 6) ELSE '' END
    AS url
  FROM (SELECT doc_id, doc_id % 40 AS s,
               CASE WHEN (doc_id % 40) % 2 = 0
                    THEN 'http' ELSE 'https' END AS proto
        FROM documents)
),
parsed AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host0,
    regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
    regexp_extract(url, '^[^?#]*\?([^#]*)', 1) AS query0
  FROM laced
),
norm AS (
  SELECT doc_id, scheme,
    regexp_replace(
      CASE WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
           WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
           ELSE host0 END,
      '^www\.', '') AS host,
    CASE WHEN path0 = '' THEN '/'
         WHEN path0 <> '/' THEN regexp_replace(path0, '/$', '')
         ELSE path0 END AS path,
    array_to_string(list_sort(list_filter(string_split(query0, '&'),
      x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') AS q
  FROM parsed
)
SELECT canonical_url, COUNT(*) AS n_pages, MIN(doc_id) AS keeper_doc_id
FROM (SELECT doc_id,
             scheme || '://' || host || path
             || CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url
      FROM norm)
GROUP BY canonical_url ORDER BY canonical_url
"""


def q_incremental_dedup(sf_dir: str):
    """Incremental-crawl dedup: drop new-snapshot docs whose content
    already exists in the prior snapshot. The raw documents have no
    duplicate texts, so both sides lace deterministic boilerplate
    (docs with doc_id%3==0 get one of 101 shared 'boilerplate page
    vN' bodies, N = (13·doc_id+7) mod 101 — affine so the variant is
    DECORRELATED from the doc_id%5 snapshot split); the prior
    snapshot is doc_id%5==0. Its boilerplate covers 34 of the 101
    variants, so some new boilerplate docs drop and some survive —
    both branches of the membership test are exercised (27 dropped /
    106 kept at the 500-doc table).

    Scale shape: snapshot reduces to per-block-unique 61-bit FNV
    content keys (one int column over the wire), broadcast once; the
    increment filters with one vectorized searchsorted per batch."""
    from bento_ray.textops import incremental_dedup

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    def _lace(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        txt = t.column("text").to_pandas()
        bp = "boilerplate page v" + pd.Series((13 * ids + 7) % 101).astype(str)
        content = bp.where(ids % 3 == 0, txt)
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(content, pa.string()),
                         "lang": t.column("lang")})

    laced = ds.map_batches(_lace, batch_format="pyarrow")

    def _split(in_snap: bool):
        def _f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            m = pa.array(ids % 5 == 0)
            return t.filter(m if in_snap else pc.invert(m))
        return _f

    snapshot = laced.map_batches(_split(True), batch_format="pyarrow")
    new_docs = laced.map_batches(_split(False), batch_format="pyarrow")
    kept = incremental_dedup(new_docs, snapshot)
    return kept.select_columns(["doc_id", "lang"]).sort("doc_id")


SQL_INCREMENTAL_DEDUP = rf"""
WITH laced AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 3 = 0
              THEN 'boilerplate page v' || ((13 * doc_id + 7) % 101)
              ELSE text END AS content
  FROM documents
),
k AS (SELECT doc_id, lang, {_fnv_sql('content')} AS h FROM laced),
snap AS (SELECT DISTINCT h FROM k WHERE doc_id % 5 = 0)
SELECT doc_id, lang FROM k
WHERE doc_id % 5 <> 0 AND h NOT IN (SELECT h FROM snap)
ORDER BY doc_id
"""


def q_kmeans_assign(sf_dir: str):
    """Clustering-apply over embeddings: assign every vector to its
    max-cosine centroid from a FIXED deterministic centroid set (the
    8 smallest vec_ids' embeddings) — fixed centroids make the
    assignment SQL-expressible (cross join + argmax via row_number),
    so the broadcast-matmul assignment path is hash-checked; the
    iterative distributed ``kmeans_fit`` (per-cell moment combiner,
    k-row exchange per iteration) is pinned separately in pytest
    against a local Lloyd reference."""
    from bento_ray.textops import kmeans_assign

    cm, _ = _query_vectors(sf_dir, 8)
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = kmeans_assign(ds, cm)
    return out.select_columns(["vec_id", "cluster", "sim"]).sort("vec_id")


SQL_KMEANS_ASSIGN = """
WITH c AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, embedding
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
),
s AS (
  SELECT e.vec_id, c.cidx,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])) AS raw
  FROM embeddings e CROSS JOIN c
)
SELECT vec_id, cidx AS cluster, ROUND(raw, 4) AS sim
FROM s
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY raw DESC, cidx) = 1
ORDER BY vec_id
"""


def _splitmix_sql_key(expr: str, seed: int) -> str:
    """The engine's seeded-shuffle key (splitmix64 of ``expr XOR
    mix(seed)``, folded to 61 bits) as DuckDB SQL. 64-bit wraparound
    is emulated in HUGEINT; the two 64×64-bit multiplies are split
    into 32-bit halves so no intermediate exceeds 2^96 (HUGEINT
    overflows at 2^127 on a direct 64×64 product)."""
    import numpy as np

    from bento_ray.textops.dedup import _mix64

    const = int(_mix64(np.array([seed], np.uint64))[0])
    m = 18446744073709551616

    def mulmod(a: str, b: int) -> str:
        bh, bl = b >> 32, b & 0xFFFFFFFF
        return (f"((({a}) * {bl} + (((({a}) * {bh}) % 4294967296)"
                f" * 4294967296)) % {m})")

    z0 = (f"((xor(CAST({expr} AS HUGEINT), CAST({const} AS HUGEINT))"
          f" + 11400714819323198485) % {m})")
    z1 = mulmod(f"xor({z0}, {z0} // 1073741824)", 13787848793156543929)
    z2 = mulmod(f"xor({z1}, {z1} // 134217728)", 10723151780598845931)
    return f"(xor({z2}, {z2} // 2147483648) % 2305843009213693951)"


def q_seeded_shuffle(sf_dir: str):
    """Deterministic epoch shuffle: order documents by a seeded
    splitmix64 key (the training-data ordering step — reproducible
    across engines and cluster sizes, unlike random_shuffle). The
    distributed sort is the range-partitioned exchange; the oracle
    replicates the hash bit-for-bit in HUGEINT SQL and checks the
    first 200 rows of the global order, rank included."""
    from bento_ray.textops import seeded_shuffle

    ds = _t(sf_dir, "documents", ["doc_id"])
    head = seeded_shuffle(ds, seed=7).limit(200).to_pandas()
    head = head.sort_values(["shuffle_key", "doc_id"], kind="stable") \
        .reset_index(drop=True)
    head["rank"] = np.arange(1, len(head) + 1, dtype=np.int64)
    return head[["rank", "doc_id", "shuffle_key"]]


def _seeded_shuffle_sql() -> str:
    k = _splitmix_sql_key("doc_id", 7)
    return f"""
SELECT row_number() OVER (ORDER BY z, doc_id) AS rank, doc_id,
       CAST(z AS BIGINT) AS shuffle_key
FROM (SELECT doc_id, {k} AS z FROM documents)
ORDER BY z, doc_id LIMIT 200
"""


def q_paragraph_dedup(sf_dir: str):
    """Corpus-wide paragraph dedup (RefinedWeb/CCNet boilerplate
    removal at paragraph granularity): duplicated paragraphs keep
    only the first (doc_id, idx) instance; documents are rebuilt from
    survivors. Paragraphs = consecutive 10-word chunks. Both sides
    PREPEND a deterministic 10-word boilerplate paragraph (7 variants,
    doc_id%4==0 docs) so cross-doc duplicates exist and align on
    chunk boundaries. The engine moves paragraphs as 61-bit hashes
    with a (count, min-position) combiner and broadcasts only the
    duplicated subset; the oracle groups by paragraph TEXT — a hash
    match therefore also certifies the hash space collision-free at
    this scale."""
    from bento_ray.textops import paragraph_dedup

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _lace(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        txt = t.column("text").to_pandas()
        bp = ("quick brown fox jumps over the lazy dog token v"
              + pd.Series(ids % 7).astype(str) + " ")
        laced = (bp + txt).where(ids % 4 == 0, txt)
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(laced, pa.string())})

    laced = ds.map_batches(_lace, batch_format="pyarrow")
    return paragraph_dedup(laced, words_per_para=10).sort("doc_id")


SQL_PARAGRAPH_DEDUP = r"""
WITH laced AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN 'quick brown fox jumps over the lazy dog token v'
                   || (doc_id % 7) || ' ' || text
              ELSE text END AS text
  FROM documents
),
d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS words FROM laced),
pr AS (
  SELECT doc_id,
         unnest(generate_series(0,
                CAST(ceil(len(words) / 10.0) AS BIGINT) - 1)) AS idx,
         words
  FROM d WHERE len(words) > 0
),
para AS (
  SELECT doc_id, idx,
         array_to_string(words[idx * 10 + 1 : idx * 10 + 10], ' ') AS ptext
  FROM pr
),
mk AS (
  SELECT doc_id, idx, ptext,
         row_number() OVER (PARTITION BY ptext ORDER BY doc_id, idx) AS rn
  FROM para
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_paras,
         COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
         COALESCE(string_agg(ptext, ' ' ORDER BY idx)
                  FILTER (WHERE rn = 1), '') AS clean_text
  FROM mk GROUP BY doc_id
)
SELECT d0.doc_id, COALESCE(a.n_paras, 0) AS n_paras,
       COALESCE(a.n_kept, 0) AS n_kept,
       COALESCE(a.clean_text, '') AS clean_text
FROM documents d0 LEFT JOIN agg a USING (doc_id)
ORDER BY d0.doc_id
"""


def q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail perplexity bucketing per language: the
    self-trained unigram LM scores every doc (integer micro-nat sums,
    bit-exact both engines — q_unigram_logprob's discipline), then
    each lang splits into thirds by the cumulative-threshold rule
    (t1 = smallest score with cum ≥ ⌈n/3⌉ — tie-safe: a pure function
    of the (score, count) histogram, same rule the length-quantiles
    oracle proved)."""
    from bento_ray.textops import ccnet_buckets

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    return ccnet_buckets(ds).sort(["lang", "bucket"])


SQL_CCNET_BUCKETS = r"""
WITH d AS (
  SELECT doc_id, lang, regexp_extract_all(text, '\S+') AS words
  FROM documents
),
tok AS (SELECT doc_id, unnest(words) AS w FROM d),
vocab AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
tot AS (SELECT SUM(c) AS n FROM vocab),
q AS (SELECT w, CAST(ROUND(ln(c / n) * 1000000) AS BIGINT) AS micro
      FROM vocab, tot),
s AS (SELECT doc_id, SUM(micro) AS sm, count(*) AS cnt
      FROM tok JOIN q USING (w) GROUP BY doc_id),
sc AS (SELECT d.doc_id, d.lang,
              COALESCE(ROUND(-s.sm / 1000000.0 / s.cnt, 6), 0.0) AS nl
       FROM d LEFT JOIN s USING (doc_id)),
cum AS (SELECT lang, nl,
               SUM(COUNT(*)) OVER (PARTITION BY lang ORDER BY nl) AS cumn,
               SUM(COUNT(*)) OVER (PARTITION BY lang) AS n
        FROM sc GROUP BY lang, nl),
th AS (SELECT lang,
         MIN(nl) FILTER (WHERE cumn >= CAST(ceil(n / 3.0) AS BIGINT)) AS t1,
         MIN(nl) FILTER (WHERE cumn >= CAST(ceil(2 * n / 3.0) AS BIGINT))
           AS t2
       FROM cum GROUP BY lang)
SELECT sc.lang,
       CASE WHEN nl <= t1 THEN 'head'
            WHEN nl <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs, ROUND(AVG(nl), 4) AS avg_neg_logprob
FROM sc JOIN th USING (lang)
GROUP BY sc.lang, bucket ORDER BY sc.lang, bucket
"""


def q_bpe_pair_counts(sf_dir: str):
    """Corpus byte-pair statistics (BPE merge #1's inner loop as a
    driver-visible operator): top-20 adjacent within-word byte pairs.
    Per batch one bincount(65536) histogram over the zero-copy Arrow
    word buffer; the shuffle carries ≤65536 rows per block. The full
    greedy merge loop (``bpe_train`` — one distributed word-frequency
    pass, vocab-sized driver loop) is pinned in pytest against a
    scalar reference."""
    from bento_ray.textops import bpe_pair_counts

    ds = _t(sf_dir, "documents", ["text"])
    return bpe_pair_counts(ds, k=20)


SQL_BPE_PAIRS = r"""
WITH d AS (SELECT regexp_extract_all(text, '\S+') AS words FROM documents),
tok AS (SELECT unnest(words) AS w FROM d),
p AS (SELECT substr(w, i, 2) AS pair
      FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
            FROM tok WHERE len(w) >= 2))
SELECT pair, COUNT(*) AS cnt FROM p
GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20
"""


def q_weighted_mix(sf_dir: str):
    """Training-mix construction: per-source keep rates (full /
    half / tenth / zero) applied by deterministic Knuth-hash
    thresholding, then a per-source survivor count — both the
    row-level filter and the mix proportions are hash-checked (the
    identical integer arithmetic runs in SQL)."""
    from bento_ray.textops import weighted_mix

    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1,
             "src4": 0.0}
    ds = _t(sf_dir, "documents", ["doc_id", "source"])
    kept = weighted_mix(ds, rates, default_rate=0.75)
    return kept.groupby("source").count() \
        .map_batches(lambda t: t.rename_columns(["source", "n_kept"]),
                     batch_format="pyarrow").sort("source")


SQL_WEIGHTED_MIX = """
WITH thr AS (
  SELECT source,
         CASE source
           WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
           WHEN 'src2' THEN 2500 WHEN 'src3' THEN 1000
           WHEN 'src4' THEN 0 ELSE 7500 END AS t
  FROM (SELECT DISTINCT source FROM documents)
)
SELECT d.source, COUNT(*) AS n_kept
FROM documents d JOIN thr USING (source)
WHERE (d.doc_id * 2654435761) % 4294967296 % 10000 < thr.t
GROUP BY d.source ORDER BY d.source
"""


def q_curation_pipeline(sf_dir: str):
    """The COMPOSED curation chain end-to-end (paragraph dedup →
    integer-exact quality gate → per-lang summary) hash-checked as a
    whole — per-op oracles stop helping at composition seams, so the
    seams themselves are on the checked path. Uses q_paragraph_dedup's
    boilerplate lacing so the dedup stage does real work."""
    from bento_ray.pipelines.curation import curate_documents

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    def _lace(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        txt = t.column("text").to_pandas()
        bp = ("quick brown fox jumps over the lazy dog token v"
              + pd.Series(ids % 7).astype(str) + " ")
        laced = (bp + txt).where(ids % 4 == 0, txt)
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(laced, pa.string()),
                         "lang": t.column("lang")})

    laced = ds.map_batches(_lace, batch_format="pyarrow")
    return curate_documents(laced).sort("lang")


SQL_CURATION = r"""
WITH laced AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 4 = 0
              THEN 'quick brown fox jumps over the lazy dog token v'
                   || (doc_id % 7) || ' ' || text
              ELSE text END AS text
  FROM documents
),
d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS words FROM laced),
pr AS (
  SELECT doc_id,
         unnest(generate_series(0,
                CAST(ceil(len(words) / 10.0) AS BIGINT) - 1)) AS idx,
         words
  FROM d WHERE len(words) > 0
),
para AS (
  SELECT doc_id, idx,
         array_to_string(words[idx * 10 + 1 : idx * 10 + 10], ' ') AS ptext
  FROM pr
),
mk AS (
  SELECT doc_id, idx, ptext,
         row_number() OVER (PARTITION BY ptext ORDER BY doc_id, idx) AS rn
  FROM para
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_paras,
         COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
         COALESCE(string_agg(ptext, ' ' ORDER BY idx)
                  FILTER (WHERE rn = 1), '') AS clean_text
  FROM mk GROUP BY doc_id
),
clean AS (
  SELECT l.doc_id, l.lang, COALESCE(a.n_paras, 0) AS n_paras,
         COALESCE(a.n_kept, 0) AS n_kept,
         regexp_extract_all(COALESCE(a.clean_text, ''), '\S+') AS cw
  FROM laced l LEFT JOIN agg a USING (doc_id)
),
gated AS (
  SELECT lang, len(cw) AS n_words,
         ROUND(CAST(n_kept AS DOUBLE) / GREATEST(n_paras, 1), 6)
           AS kept_frac
  FROM clean
  WHERE len(cw) >= 20
    AND 10 * len(list_distinct(cw)) >= 3 * len(cw)
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       ROUND(AVG(kept_frac), 4) AS avg_kept_frac
FROM gated GROUP BY lang ORDER BY lang
"""


def q_pagerank(sf_dir: str):
    """Distributed PageRank over a deterministic synthetic outlink
    graph (3 modular out-edges per doc — both engines construct the
    identical edge set from doc_id arithmetic; doc_ids are verified
    dense 0..N-1 first). Three power iterations from the uniform
    vector, each ONE shuffle join (ranks ⋈ edges on src) + ONE grouped
    sum — the Pregel superstep as Dataset ops, with the rank vector
    never leaving the cluster. The oracle unrolls the same three
    iterations in SQL; ranks compare at 8 decimals (float association
    noise is ~1e-16 relative)."""
    from bento_ray.textops.graph import pagerank
    from bento_ray.util import duckdb_round

    ds = _t(sf_dir, "documents", ["doc_id"]).materialize()
    n = ds.count()
    mn, mx = ds.min("doc_id"), ds.max("doc_id")
    assert (mn, mx) == (0, n - 1), "gate graph assumes dense doc_ids"

    def _edges(t: pa.Table) -> pa.Table:
        src = t.column("doc_id").to_numpy()
        s = np.repeat(src, 3)
        j = np.tile(np.arange(3), len(src))
        dst = (s * 31 + 17 * j + 7) % n
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    edges = ds.map_batches(_edges, batch_format="pyarrow")
    nodes = ds.map_batches(
        lambda t: pa.table({"node": t.column("doc_id")}),
        batch_format="pyarrow")
    out = pagerank(edges, nodes, iters=3)

    def _final(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("node"),
            "pagerank": pa.array(duckdb_round(
                t.column("rank").to_numpy(), 8), pa.float64()),
        })

    return out.map_batches(_final, batch_format="pyarrow").sort("doc_id")


def _pagerank_sql(iters: int = 3) -> str:
    head = """
WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
nodes AS (SELECT doc_id FROM documents),
e AS (SELECT doc_id AS src,
             (doc_id * 31 + 17 * unnest([0, 1, 2]) + 7)
               % (SELECT cnt FROM n) AS dst
      FROM nodes),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
r0 AS (SELECT doc_id AS node, 1.0 / (SELECT cnt FROM n) AS r FROM nodes)"""
    body = []
    prev = "r0"
    for k in range(1, iters + 1):
        body.append(f""",
c{k} AS (SELECT e.dst, SUM({prev}.r / deg.d) AS s
        FROM e JOIN {prev} ON {prev}.node = e.src
        JOIN deg ON deg.src = e.src GROUP BY e.dst),
r{k} AS (SELECT nodes.doc_id AS node,
               0.15 / (SELECT cnt FROM n) + 0.85 * COALESCE(c{k}.s, 0) AS r
        FROM nodes LEFT JOIN c{k} ON c{k}.dst = nodes.doc_id)""")
        prev = f"r{k}"
    tail = f"""
SELECT node AS doc_id, ROUND(r, 8) AS pagerank FROM {prev} ORDER BY doc_id
"""
    return head + "".join(body) + tail


def q_logreg_quality(sf_dir: str):
    """DISTRIBUTED MODEL TRAINING, hash-checked end-to-end: a
    logistic-regression quality/spam classifier over hashed
    bag-of-words features, trained with full-batch gradient descent
    (two iterations) where each iteration is one bounded per-bucket
    gradient combiner + a driver-side B-row update. Weights live on
    an integer NANO grid and per-doc residuals re-quantize to nanos
    before the gradient sum (the unigram-LM discipline applied to
    training), so the learned weights are BIT-IDENTICAL to the
    oracle's unrolled-SQL training run. Labels/spam vocabulary are
    laced deterministically (doc_id%3==0 docs get spam tokens)."""
    from bento_ray.textops.classify import logreg_fit_hashed

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _lace(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        txt = t.column("text").to_pandas()
        spam = ids % 3 == 0
        laced = (txt + " win free prize click now offer").where(spam, txt)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "text": pa.array(laced, pa.string()),
            "y": pa.array((spam).astype(np.float64)),
        })

    laced = ds.map_batches(_lace, batch_format="pyarrow")
    wn = logreg_fit_hashed(laced, label_col="y", n_buckets=64, iters=2)
    return pd.DataFrame({
        "bucket": np.arange(len(wn), dtype=np.int64),
        "weight_nano": wn.astype(np.int64),
    })


def _logreg_sql(iters: int = 2, n_buckets: int = 64) -> str:
    head = rf"""
WITH laced AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' win free prize click now offer'
              ELSE text END AS text,
         CASE WHEN doc_id % 3 = 0 THEN 1.0 ELSE 0.0 END AS y
  FROM documents
),
d AS (SELECT doc_id, y, regexp_extract_all(text, '\S+') AS words
      FROM laced),
tok AS (SELECT doc_id, ({_fnv_sql('w')} % {n_buckets}) + 1 AS bucket
        FROM (SELECT doc_id, unnest(words) AS w FROM d)),
feat AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok GROUP BY doc_id, bucket
  UNION ALL SELECT doc_id, 0 AS bucket, CAST(1 AS BIGINT) FROM d
),
n AS (SELECT COUNT(*) AS N FROM d),
buckets AS (SELECT unnest(generate_series(0, {n_buckets})) AS bucket),
w0 AS (SELECT bucket, CAST(0 AS BIGINT) AS wn FROM buckets)"""
    body = []
    prev = "w0"
    for k in range(1, iters + 1):
        body.append(f""",
z{k} AS (SELECT f.doc_id, SUM({prev}.wn * f.cnt) AS dot
        FROM feat f JOIN {prev} USING (bucket) GROUP BY f.doc_id),
gq{k} AS (SELECT d.doc_id,
               CAST(ROUND((1.0 / (1.0 + exp(-(z{k}.dot / 1e9))) - d.y)
                          * 1e9) AS BIGINT) AS gq
         FROM d JOIN z{k} USING (doc_id)),
g{k} AS (SELECT f.bucket, SUM(gq{k}.gq * f.cnt) AS g
        FROM feat f JOIN gq{k} USING (doc_id) GROUP BY f.bucket),
w{k} AS (SELECT b.bucket,
               {prev}.wn - CAST(ROUND(COALESCE(CAST(g{k}.g AS DOUBLE), 0)
                                      / (SELECT N FROM n)) AS BIGINT) AS wn
        FROM buckets b JOIN {prev} ON {prev}.bucket = b.bucket
        LEFT JOIN g{k} ON g{k}.bucket = b.bucket)""")
        prev = f"w{k}"
    tail = f"""
SELECT bucket, wn AS weight_nano FROM {prev} ORDER BY bucket
"""
    return head + "".join(body) + tail


def q_extract_links(sf_dir: str):
    """Outlink extraction parity: both sides lace deterministic anchor
    tags into the doc text (one link for even doc_ids, a second for
    doc_id%6==0 — multiplicity matters, the compare is multiset), then
    extract with their own engine (Arrow split+RE2 here, DuckDB
    regexp_extract_all there)."""
    from bento_ray.textops import extract_links

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _lace(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        txt = t.column("text").to_pandas()
        d = pd.Series(ids)
        a1 = (' <a href="http://site' + (d % 20).astype(str)
              + '.example.com/p' + (d % 5).astype(str) + '">x</a>')
        a2 = (' <a href="https://ref' + (d % 3).astype(str)
              + '.example.org/">y</a>')
        laced = txt + a1.where(d % 2 == 0, "") + a2.where(d % 6 == 0, "")
        return pa.table({"doc_id": t.column("doc_id"),
                         "html": pa.array(laced, pa.string())})

    laced = ds.map_batches(_lace, batch_format="pyarrow")
    out = extract_links(laced, html_col="html", src_col="doc_id")
    return out.map_batches(
        lambda t: t.rename_columns(["doc_id", "link"]),
        batch_format="pyarrow").sort(["doc_id", "link"])


SQL_EXTRACT_LINKS = r"""
WITH laced AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 2 = 0
              THEN ' <a href="http://site' || (doc_id % 20)
                   || '.example.com/p' || (doc_id % 5) || '">x</a>'
              ELSE '' END
         || CASE WHEN doc_id % 6 = 0
              THEN ' <a href="https://ref' || (doc_id % 3)
                   || '.example.org/">y</a>'
              ELSE '' END AS html
  FROM documents
)
SELECT doc_id, unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS link
FROM laced ORDER BY doc_id, link
"""


def q_cep_sequence(sf_dir: str):
    """CEP pattern matching (the north rule's missing letter): all
    CONSECUTIVE click→purchase sequences per user completed within 6
    hours — MATCH_RECOGNIZE strict contiguity, as one hash exchange +
    P vectorized partition scans. The oracle is the LAG window form of
    the same semantics."""
    from bento_ray.stages.cep import match_event_sequence

    ds = _t(sf_dir, "events",
            ["event_id", "ts", "user_id", "event_type"])
    out = match_event_sequence(ds, ["click", "purchase"],
                               within_us=21_600_000_000)
    return out.sort(["user_id", "first_event_id"])


SQL_CEP_SEQUENCE = """
WITH s AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER w AS pt,
         lag(ts) OVER w AS pts,
         lag(event_id) OVER w AS pid
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, pid AS first_event_id, event_id AS last_event_id,
       epoch_us(ts) - epoch_us(pts) AS span_us
FROM s
WHERE pt = 'click' AND event_type = 'purchase'
  AND epoch_us(ts) - epoch_us(pts) <= 21600000000
ORDER BY user_id, first_event_id
"""


def q_fix_mojibake(sf_dir: str):
    """Encoding repair (ftfy's core move) hash-checked: both sides
    lace deterministic mojibake ('cafÃ©' / 'donâ€™t') into the ASCII
    corpus; the engine repairs via the general
    cp1252-encode → utf-8-decode roundtrip on marker-flagged rows,
    the oracle via the equivalent replace chain over the known laced
    sequences — so the hash verifies the roundtrip repairs exactly
    the laced corruption and touches nothing else."""
    from bento_ray.textops import fix_mojibake

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _lace(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        txt = t.column("text").to_pandas()
        d = pd.Series(ids)
        laced = (txt
                 + pd.Series(" cafÃ© menu").repeat(len(d))
                   .reset_index(drop=True).where(d % 4 == 1, "")
                 + pd.Series(" donâ€™t stop").repeat(len(d))
                   .reset_index(drop=True).where(d % 8 == 3, ""))
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(laced, pa.string())})

    laced = ds.map_batches(_lace, batch_format="pyarrow")
    return fix_mojibake(laced).select_columns(
        ["doc_id", "fixed_text", "was_mojibake"]).sort("doc_id")


SQL_FIX_MOJIBAKE = """
WITH laced AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 4 = 1 THEN ' cafÃ© menu' ELSE '' END
         || CASE WHEN doc_id % 8 = 3 THEN ' donâ€™t stop' ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       replace(replace(t, 'cafÃ©', 'café'), 'donâ€™t', 'don’t')
         AS fixed_text,
       (doc_id % 4 = 1 OR doc_id % 8 = 3) AS was_mojibake
FROM laced ORDER BY doc_id
"""


_SIMHASH_BASE = ("alpha bravo charlie delta echo foxtrot golf hotel india "
                 "juliet kilo lima mike november oscar papa quebec romeo "
                 "sierra tango uniform victor whiskey xray yankee zulu "
                 "one two three four")


def q_simhash_near_dups(sf_dir: str):
    """SimHash near-duplicate pairs (4×16-bit band LSH + exact Hamming
    verify — EXACT at hamming ≤ 3 by pigeonhole). Both sides lace
    near-dup docs (doc_id%10 ∈ {8,9} share a 31-word base per
    doc_id//10 group, the 9-variant appends one extra word) so true
    small-Hamming pairs exist; the oracle replicates the SimHash bit
    votes, the banding, and the popcount in SQL."""
    from bento_ray.textops import simhash_near_dups

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _lace(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        txt = t.column("text").to_pandas()
        base = (_SIMHASH_BASE + " topic"
                + pd.Series(ids // 10).astype(str))
        laced = txt.where(ids % 10 <= 7,
                          base.where(ids % 10 == 8, base + " extraword"))
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(laced, pa.string())})

    laced = ds.map_batches(_lace, batch_format="pyarrow")
    return simhash_near_dups(laced, max_hamming=3) \
        .sort(["doc_a", "doc_b"])


def _simhash_near_dups_sql() -> str:
    return rf"""
WITH laced AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 <= 7 THEN text
              WHEN doc_id % 10 = 8
                THEN '{_SIMHASH_BASE}' || ' topic' || (doc_id // 10)
              ELSE '{_SIMHASH_BASE}' || ' topic' || (doc_id // 10)
                   || ' extraword' END AS text
  FROM documents
),
d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS words FROM laced),
wh AS (
  SELECT doc_id, {_fnv_sql('unnest(words)')} AS h
  FROM d WHERE len(words) >= 1
),
hc AS (SELECT doc_id, h, COUNT(*) AS c FROM wh GROUP BY doc_id, h),
bits AS (
  SELECT doc_id, bb.b AS b,
         SUM(CASE WHEN (h >> bb.b) & 1 = 1 THEN c ELSE -c END) AS acc
  FROM hc, (SELECT unnest(generate_series(0, 60)) AS b) bb
  GROUP BY doc_id, bb.b
),
s AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << b)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, simhash, k,
         (simhash >> (16 * k)) & 65535 AS band
  FROM (SELECT doc_id, simhash, unnest([0, 1, 2, 3]) AS k FROM s)
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.simhash AS ha, y.simhash AS hb
  FROM bands x JOIN bands y
    ON x.k = y.k AND x.band = y.band AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 3
ORDER BY doc_a, doc_b
"""


# The flagship correctness corpus: deterministic synthetic pages
# (testgen.pages), generated driver-side (n < 50k needs no Ray) and
# cached — both the Ray query and the DuckDB oracle read the same
# files. The oracle uses the corpus' GOLDEN ``text`` column, so a
# hash match additionally re-verifies the byte-identical strip_html
# invariant end-to-end.
_FLAGSHIP_GATE = dict(n_rows=2000, seed=42, files=4)
_FLAGSHIP_GATE_DIR = "/tmp/bento_ray_pages/n2000_s42_f4"
_FLAGSHIP_WINDOW_US = 10_000_000


def _flagship_gate_corpus() -> str:
    from bento_ray.testgen import ensure_pages_dataset

    d = ensure_pages_dataset(_FLAGSHIP_GATE["n_rows"],
                             seed=_FLAGSHIP_GATE["seed"],
                             files=_FLAGSHIP_GATE["files"])
    assert d == _FLAGSHIP_GATE_DIR, d  # SQL_FLAGSHIP embeds this path
    return d


def q_flagship_stream(sf_dir: str):
    """The streaming flagship (strip_html → first-per-url dedupe →
    tumbling windows → per-lang aggregate → versioned enrichment →
    exactly-once sink) on the deterministic gate corpus, checked
    against a full DuckDB oracle (SQL_FLAGSHIP) over the same files."""
    import shutil

    from bento_ray.pipelines.flagship import flagship_streaming
    from bento_ray.streaming import ExactlyOnceParquetSink

    pages = _flagship_gate_corpus()
    out_dir = "/tmp/bento_ray_gate_flagship"
    shutil.rmtree(out_dir, ignore_errors=True)
    flagship_streaming(pages, out_dir, partitions=4, files_per_epoch=2,
                       window_size_us=_FLAGSHIP_WINDOW_US)
    df = ExactlyOnceParquetSink(out_dir).read().to_pandas()
    return df.sort_values(["window_end", "lang"]).reset_index(drop=True)


def _flagship_dim_values() -> str:
    """The versioned lang dimension as SQL VALUES rows — derived from
    the same schema constants the engine's dim_versions_table uses."""
    from bento_ray.schema import LANG_NAMES, LANG_SCRIPTS, LANGS
    from bento_ray.testgen.pages import BASE_TS_US

    rows = [f"('{lg}', '{LANG_NAMES[lg]}', '{LANG_SCRIPTS[lg]}', "
            f"1, {-(1 << 62)})" for lg in LANGS]
    upd = {"en": "English (v2)", "zh": "Mandarin Chinese",
           "de": "German (v2)"}
    uts = BASE_TS_US + 30_000_000
    rows += [f"('{lg}', '{upd[lg]}', '{LANG_SCRIPTS[lg]}', 2, {uts})"
             for lg in upd]
    return ",\n      ".join(rows)


# Oracle semantics notes: (1) dedupe = min event time per url — the
# engine keeps the first arrival, and on this corpus arrival order
# and event order agree for every duplicate pair (event-time
# inversions across an epoch boundary would diverge; none exist at
# this seed, and the corpus is deterministic so the equality is
# stable). (2) No late drops occur (epochs span ≫ lateness), so the
# late-drop rule needs no SQL clause. (3) window_end_timestamp is
# RFC3339Nano; window ends are whole seconds here so %S-precision
# strftime is exact.
SQL_FLAGSHIP = f"""
WITH kept AS (
  SELECT url, warc_ts, text, lang,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts) AS rn
  FROM read_parquet('{_FLAGSHIP_GATE_DIR}/*.parquet')
),
agg AS (
  SELECT ((epoch_us(warc_ts) + {_FLAGSHIP_WINDOW_US - 1})
            // {_FLAGSHIP_WINDOW_US}) * {_FLAGSHIP_WINDOW_US} AS we_us,
         lang, COUNT(*) AS pages,
         CAST(SUM(octet_length(encode(text))) AS BIGINT) AS nbytes
  FROM kept WHERE rn = 1
  GROUP BY 1, 2
),
dim AS (
  SELECT * FROM (VALUES
      {_flagship_dim_values()}
  ) v(lang, lang_name, script, version, update_ts)
),
enriched AS (
  SELECT a.we_us, a.lang, a.pages, a.nbytes,
         d.lang_name, d.script, d.version,
         row_number() OVER (PARTITION BY a.we_us, a.lang
                            ORDER BY d.update_ts DESC) AS rk
  FROM agg a JOIN dim d ON d.lang = a.lang AND d.update_ts <= a.we_us
)
SELECT make_timestamp(we_us) AS window_end, lang, pages, nbytes,
       lang_name, script, CAST(version AS BIGINT) AS version,
       strftime(make_timestamp(we_us), '%Y-%m-%dT%H:%M:%SZ')
         AS window_end_timestamp
FROM enriched WHERE rk = 1
ORDER BY 1, 2
"""


# Pinned as a named constant so tests can assert the vectorizing
# compiler (blobl/vectorize.py) accepts EXACTLY this mapping — if a
# compiler change silently demotes it to the per-row interpreter, the
# bench query gets ~3x slower with no functional signal.
BLOBLANG_REVENUE_MAPPING = '''
root.flag = this.l_returnflag
root.revenue = this.l_extendedprice * (1.0 - this.l_discount)
root.size_class = if this.l_quantity > 30.0 { "big" } else { "small" }
'''


def q_bloblang_revenue(sf_dir: str):
    """Revenue per (returnflag, size-class) where the per-row compute
    runs through a COMPILED Bloblang mapping string — the reference's
    user surface (`root.x = this.y...`, executor.go:115-207) executing
    distributed inside map_batches. The aggregate stays vectorized."""
    from bento_ray.blobl.stage import mapping_stage

    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"])
    mapped = mapping_stage(ds, BLOBLANG_REVENUE_MAPPING, concurrency=(1, 8))
    out = mapped.groupby(["flag", "size_class"]).aggregate(
        Sum("revenue", alias_name="revenue"),
        Count(alias_name="n"),
    )
    return _round_cols(out, ["revenue"])


SQL_BLOBLANG_REVENUE = """
SELECT l_returnflag AS flag,
       CASE WHEN l_quantity > 30 THEN 'big' ELSE 'small' END AS size_class,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       COUNT(*) AS n
FROM lineitem
GROUP BY 1, 2
"""


def q_pii_redact(sf_dir: str):
    """PII redaction parity check. The raw documents are synthetic
    word-salad with no PII, so BOTH sides (this pipeline and the DuckDB
    oracle) first lace the text with deterministic doc_id-derived
    emails / SSNs / phone numbers / IPv4s, then redact with their own
    regex engine (Arrow RE2 here, DuckDB RE2 there) — the value-hash
    compares the redacted text and sequential per-category counts, so
    it verifies the redaction chain itself, not a trivial identity."""
    import pandas as pd

    from bento_ray.textops.redact import redact_batch

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _lace(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        s = pd.Series(ids).astype(str)
        txt = t.column("text").to_pandas()
        z = lambda v, w: pd.Series(v).astype(str).str.zfill(w)  # noqa: E731
        email = (" contact u" + s + "@ex" + z(ids % 7, 1) + ".com") \
            .where(ids % 3 == 0, "")
        ssn = (" ssn " + z(ids % 1000, 3) + "-" + z(ids % 100, 2)
               + "-" + z((ids * 13) % 10000, 4)).where(ids % 7 == 0, "")
        phone = (" call 555-" + z(ids % 1000, 3) + "-"
                 + z((ids * 7) % 10000, 4)).where(ids % 4 == 0, "")
        ip = (" host 10." + z(ids % 256, 1) + "." + z((ids * 3) % 256, 1)
              + "." + z((ids * 9) % 256, 1)).where(ids % 5 == 0, "")
        raw = txt + email + ssn + phone + ip
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(raw, pa.string())})

    def _redact(t: pa.Table) -> pa.Table:
        red, counts = redact_batch(t.column("text"))
        out = {"doc_id": t.column("doc_id"), "redacted": red}
        out.update({f"n_{tag.lower()}": arr for tag, arr in counts.items()})
        return pa.table(out)

    return ds.map_batches(_lace, batch_format="pyarrow") \
        .map_batches(_redact, batch_format="pyarrow")


def _pii_sql() -> str:
    from bento_ray.textops.redact import pii_sql_counts, pii_sql_replace

    laced = """
SELECT doc_id,
  text
  || CASE WHEN doc_id % 3 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR)
       || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END
  || CASE WHEN doc_id % 7 = 0 THEN ' ssn '
       || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
       || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
       || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0') ELSE '' END
  || CASE WHEN doc_id % 4 = 0 THEN ' call 555-'
       || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
       || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') ELSE '' END
  || CASE WHEN doc_id % 5 = 0 THEN ' host 10.'
       || CAST(doc_id % 256 AS VARCHAR) || '.'
       || CAST((doc_id * 3) % 256 AS VARCHAR) || '.'
       || CAST((doc_id * 9) % 256 AS VARCHAR) ELSE '' END AS text
FROM documents
"""
    counts = ",\n       ".join(f"{expr} AS {name}"
                               for name, expr in pii_sql_counts("text").items())
    return (f"SELECT doc_id, {pii_sql_replace('text')} AS redacted,\n"
            f"       {counts}\nFROM ({laced})")


SQL_PII_REDACT = _pii_sql()


def q_repetition_metrics(sf_dir: str):
    """Gopher-style repetition signals per document (top-word fraction,
    distinct-word fraction, duplicate-word character fraction) —
    position-free definitions shared with the DuckDB oracle."""
    from bento_ray.textops import repetition_metrics

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return repetition_metrics(ds).select_columns(
        ["doc_id", "top_word_frac", "distinct_word_frac",
         "dup_word_char_frac"])


# Mirrors repetition_metrics exactly: ' '-split, empties dropped,
# word-less docs report 0.0 for all three metrics.
SQL_REPETITION = r"""
WITH words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w FROM documents
  ) WHERE w <> ''
), wc AS (
  SELECT doc_id, w, COUNT(*) AS c, length(w) AS wlen
  FROM words GROUP BY doc_id, w
), m AS (
  SELECT doc_id,
    ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_word_frac,
    ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS distinct_word_frac,
    ROUND(SUM(CASE WHEN c > 1 THEN c * wlen ELSE 0 END)
          / CAST(SUM(c * wlen) AS DOUBLE), 6) AS dup_word_char_frac
  FROM wc GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(m.top_word_frac, 0.0) AS top_word_frac,
       COALESCE(m.distinct_word_frac, 0.0) AS distinct_word_frac,
       COALESCE(m.dup_word_char_frac, 0.0) AS dup_word_char_frac
FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
"""


def q_normalize_text(sf_dir: str):
    """Unicode normalization parity: both sides lace the ASCII corpus
    with the same doc_id-selected mixed-script repertoire string (plus
    tab/extra-space noise), then normalize with their own engine —
    Python unicodedata + Arrow RE2 here, DuckDB utf8proc there. The
    hash compares the normalized text itself."""
    import numpy as np

    from bento_ray.textops.normalize import REPERTOIRE, normalize_series

    rep = np.array(REPERTOIRE, dtype=object)
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        laced = (t.column("text").to_pandas()
                 + "\t " + rep[ids % len(rep)] + "  END")
        norm = normalize_series(pa.array(laced, pa.string()))
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": t.column("doc_id"),
            "norm_text": norm,
            "n_chars_norm": pc.utf8_length(norm).cast(pa.int64()),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


def _normalize_sql() -> str:
    from bento_ray.textops.normalize import REPERTOIRE, normalize_sql_expr

    lits = ", ".join("'" + s.replace("'", "''") + "'" for s in REPERTOIRE)
    laced = (f"text || chr(9) || ' ' || ([{lits}])"
             f"[CAST(doc_id % {len(REPERTOIRE)} AS INT) + 1] || '  END'")
    expr = normalize_sql_expr(f"({laced})")
    return (f"SELECT doc_id, {expr} AS norm_text,\n"
            f"       length({expr}) AS n_chars_norm\nFROM documents")


SQL_NORMALIZE_TEXT = _normalize_sql()


def q_term_frequency(sf_dir: str):
    """Corpus-wide term frequency, top 20 — combiner pattern: each
    batch pre-aggregates its words with one Arrow hash-aggregate, so
    the groupby shuffle moves ≤ |vocab| rows per block, never the raw
    token stream."""
    from bento_ray.textops import top_terms

    ds = _t(sf_dir, "documents", ["text"])
    return top_terms(ds, k=20)


SQL_TERM_FREQ = r"""
SELECT w AS word, COUNT(*) AS cnt FROM (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents
) WHERE w <> ''
GROUP BY w ORDER BY cnt DESC, word LIMIT 20
"""


def q_top_bigrams(sf_dir: str):
    """Adjacent-word-pair frequency, top 15 — boilerplate-phrase
    detection shape; bigrams built vectorized from the batch's flat
    word array with doc boundaries masked."""
    from bento_ray.textops import top_bigrams

    ds = _t(sf_dir, "documents", ["text"])
    return top_bigrams(ds, k=15)


SQL_TOP_BIGRAMS = r"""
WITH t AS (
  SELECT doc_id, list_filter(regexp_extract_all(text, '\S+'), w -> w <> '') AS ws
  FROM documents
), p AS (
  SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws)+1)) AS pos FROM t
)
SELECT a.w || ' ' || b.w AS bigram, COUNT(*) AS cnt
FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 15
"""


def q_tfidf_top_terms(sf_dir: str):
    """Per-document TF-IDF keyword extraction (top 3): per-doc term
    counts need no shuffle (docs are block-atomic), the DF table is
    vocab-sized and broadcast once via ray.put, ties broken by
    integer keys (tf desc, df asc, term asc) so the order matches the
    SQL oracle bit-for-bit."""
    from bento_ray.textops import tfidf_top_terms

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_top_terms(ds, k=3)


SQL_TFIDF = r"""
WITH words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w FROM documents
  ) WHERE w <> ''
), tc AS (
  SELECT doc_id, w AS term, COUNT(*) AS tf FROM words GROUP BY doc_id, w
), df AS (
  SELECT term, COUNT(*) AS df FROM tc GROUP BY term
), n AS (SELECT COUNT(*) AS nd FROM documents),
scored AS (
  SELECT tc.doc_id, tc.term, tc.tf,
         ROUND(tc.tf * ln(n.nd / CAST(df.df AS DOUBLE)), 6) AS tfidf,
         row_number() OVER (PARTITION BY tc.doc_id
                            ORDER BY ROUND(tc.tf * ln(n.nd /
                                     CAST(df.df AS DOUBLE)), 6) DESC,
                                     tc.tf DESC, df.df ASC,
                                     tc.term ASC)
           AS rnk
  FROM tc JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, tfidf
FROM scored WHERE rnk <= 3
"""


def q_dup_ngram_stats(sf_dir: str):
    """Cross-document duplicate 5-gram contamination per doc — an
    n-gram instance is duplicated iff its 5-gram occurs in ≥2 distinct
    docs corpus-wide. Only 61-bit n-gram hashes enter the shuffles;
    the SQL oracle classifies by the n-gram string itself (identical
    up to a ~|ngrams|²/2⁶¹ collision probability)."""
    from bento_ray.textops import dup_ngram_stats

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return dup_ngram_stats(ds, n=5)


SQL_DUP_NGRAMS = r"""
WITH t AS (
  SELECT doc_id, list_filter(regexp_extract_all(text, '\S+'), w -> w <> '') AS ws
  FROM documents
), g AS (
  SELECT doc_id,
         unnest([array_to_string(ws[i:i+4], ' ')
                 for i in range(1, greatest(len(ws)-3, 1))]) AS ng
  FROM t WHERE len(ws) >= 5
), inst AS (
  SELECT doc_id, ng, COUNT(*) AS inst FROM g GROUP BY doc_id, ng
), df AS (
  SELECT ng, COUNT(*) AS df FROM inst GROUP BY ng
), tot AS (
  SELECT doc_id, CAST(SUM(inst) AS BIGINT) AS n_ngrams
  FROM inst GROUP BY doc_id
), dup AS (
  SELECT i.doc_id, CAST(SUM(i.inst) AS BIGINT) AS n_dup
  FROM inst i JOIN df USING (ng) WHERE df.df >= 2 GROUP BY i.doc_id
)
SELECT d.doc_id,
       COALESCE(tot.n_ngrams, 0) AS n_ngrams,
       COALESCE(dup.n_dup, 0) AS n_dup_ngrams,
       ROUND(COALESCE(dup.n_dup, 0)
             / CAST(GREATEST(COALESCE(tot.n_ngrams, 0), 1) AS DOUBLE), 6)
         AS dup_ngram_frac
FROM documents d
LEFT JOIN tot ON d.doc_id = tot.doc_id
LEFT JOIN dup ON d.doc_id = dup.doc_id
"""


def q_hash_sample(sf_dir: str):
    """Deterministic 1/10 subsample by Knuth multiplicative hash of
    doc_id — reproducible across runs/engines/cluster sizes, no RNG
    state; the identical arithmetic runs in the SQL oracle."""
    from bento_ray.textops import hash_sample

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    return hash_sample(ds, denom=10, residue=3)


SQL_HASH_SAMPLE = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE (doc_id * 2654435761) % 4294967296 % 10 = 3
"""


def q_stratified_sample(sf_dir: str):
    """Per-language quota sampling (30 docs/lang, the training-mix
    step): the 30 smallest Knuth-hashes per language, ties by doc_id —
    the same arithmetic runs in the SQL oracle's window function.
    Combiner-shaped: each batch pre-prunes to a local per-lang top-30
    so the groupby shuffle input is bounded per block."""
    from bento_ray.textops import stratified_sample

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    return stratified_sample(ds, "lang", 30)


SQL_STRATIFIED = """
SELECT doc_id, lang, source, n_chars FROM documents
QUALIFY row_number() OVER (
  PARTITION BY lang
  ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) <= 30
"""


def q_interval_join(sf_dir: str):
    """Stream-stream interval join (Flink interval join): every
    (click, purchase) pair by the same user with the purchase 1 us to
    2 h after the click. One hash exchange + merge-rank partition
    scans (stages/join.py interval_join) — the oracle is the direct
    range-predicate self-join."""
    from bento_ray.stages.join import interval_join

    ev = _t(sf_dir, "events", ["event_id", "ts", "user_id",
                               "event_type"])
    clicks = ev.filter(expr="event_type == 'click'")
    buys = ev.filter(expr="event_type == 'purchase'")
    out = interval_join(
        clicks, buys, key_col="user_id", left_ts="ts", right_ts="ts",
        left_id_col="event_id", right_id_col="event_id",
        left_out="click_id", right_out="purchase_id",
        lower_us=1, upper_us=7_200_000_000)
    return out.sort(["user_id", "click_id", "purchase_id"])


SQL_INTERVAL_JOIN = """
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM events c
JOIN events p ON p.user_id = c.user_id
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
  AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 1 AND 7200000000
ORDER BY c.user_id, click_id, purchase_id
"""


def q_cep_followed_by(sf_dir: str):
    """Relaxed-contiguity CEP (Flink `followedBy`): for every signup,
    the earliest later click by the same user, then the earliest
    purchase after that click, completed within 48 h. The oracle
    replicates earliest-completion semantics with nested
    next-occurrence window minima over the same (ts, event_id)
    order."""
    from bento_ray.stages.cep import match_followed_by

    ds = _t(sf_dir, "events",
            ["event_id", "ts", "user_id", "event_type"])
    out = match_followed_by(ds, ["signup", "click", "purchase"],
                            within_us=172_800_000_000)
    return out.sort(["user_id", "first_event_id"])


SQL_CEP_FOLLOWED_BY = """
WITH e0 AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS pos
  FROM events
),
e AS (
  SELECT *,
         MIN(CASE WHEN event_type = 'click' THEN pos END) OVER w2
           AS nxt_click,
         MIN(CASE WHEN event_type = 'purchase' THEN pos END) OVER w2
           AS nxt_buy
  FROM e0 WINDOW w2 AS (PARTITION BY user_id ORDER BY pos
                        ROWS BETWEEN 1 FOLLOWING
                        AND UNBOUNDED FOLLOWING)
)
SELECT a.user_id, a.event_id AS first_event_id,
       c.event_id AS last_event_id,
       epoch_us(c.ts) - epoch_us(a.ts) AS span_us
FROM e a
JOIN e b ON b.user_id = a.user_id AND b.pos = a.nxt_click
JOIN e c ON c.user_id = b.user_id AND c.pos = b.nxt_buy
WHERE a.event_type = 'signup'
  AND epoch_us(c.ts) - epoch_us(a.ts) <= 172800000000
ORDER BY a.user_id, first_event_id
"""


def q_window_distinct(sf_dir: str):
    """Exact distinct users per (1h tumbling window, event_type) —
    the streaming cardinality metric, two-phase: every block first
    dedupes its own (window, type, user) triples (combiner — the
    shuffle moves ≤ one row per distinct triple per block), then one
    exchange groups (window, type) and counts the surviving uniques.
    (The HLL sketch variant is q_distinct_users_hll; this is the
    exact windowed form.)"""
    ds = _t(sf_dir, "events", ["ts", "event_type", "user_id"])

    def _local_unique(t: pa.Table) -> pa.Table:
        t = _tumble_naive(t, "ts", HOUR_US)
        return t.select(["window_end", "event_type", "user_id"]) \
            .group_by(["window_end", "event_type", "user_id"]) \
            .aggregate([])

    uniq = ds.map_batches(_local_unique, batch_format="pyarrow")

    def _count(g: pa.Table) -> pa.Table:
        users = g.column("user_id").to_numpy()
        return pa.table({
            "window_end": g.column("window_end")[:1],
            "event_type": g.column("event_type")[:1],
            "n_users": pa.array([len(np.unique(users))], pa.int64()),
        })

    out = uniq.groupby(["window_end", "event_type"]).map_groups(
        _count, batch_format="pyarrow")
    return out.sort(["window_end", "event_type"])


SQL_WINDOW_DISTINCT = f"""
SELECT make_timestamp(((epoch_us(ts) + {HOUR_US - 1}) // {HOUR_US})
                      * {HOUR_US}) AS window_end,
       event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
ORDER BY window_end, event_type
"""


def q_window_cumulate(sf_dir: str):
    """Flink CUMULATE windows (early-firing cumulative aggregates):
    windows share a 2 h cycle and grow in 30 min steps, so each event
    lands in every step-aligned window from its first end through the
    cycle end — the fourth window kind next to tumbling / sliding /
    session. Vectorized expansion (repeat + arange offsets) feeds the
    same two-phase aggregate; the oracle expands with
    generate_series under the identical ceil-alignment."""
    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])
    TWO_H = 2 * HOUR_US

    def _assign(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        e0 = ((ts + HALF_HOUR_US - 1) // HALF_HOUR_US) * HALF_HOUR_US
        ce = ((ts + TWO_H - 1) // TWO_H) * TWO_H
        counts = ((ce - e0) // HALF_HOUR_US + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ts)), counts)
        starts = np.cumsum(counts) - counts
        step_i = np.arange(counts.sum()) - np.repeat(starts, counts)
        ends = np.repeat(e0, counts) + step_i * HALF_HOUR_US
        out = t.take(pa.array(idx))
        return out.append_column(
            "window_end", pa.array(ends, pa.timestamp("us")))

    ds = ds.map_batches(_assign, batch_format="pyarrow")
    out = ds.groupby(["window_end", "event_type"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"))
    return _round_cols(out, ["sum_value"])


SQL_WINDOW_CUMULATE = f"""
SELECT make_timestamp(we) AS window_end, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM (
  SELECT event_type, value,
         unnest(generate_series(
           ((epoch_us(ts) + {HALF_HOUR_US - 1}) // {HALF_HOUR_US})
             * {HALF_HOUR_US},
           ((epoch_us(ts) + {2 * HOUR_US - 1}) // {2 * HOUR_US})
             * {2 * HOUR_US},
           {HALF_HOUR_US})) AS we
  FROM events
)
GROUP BY 1, 2
"""


def q_pq_encode(sf_dir: str):
    """Product-quantization encode (Jégou et al. — the 10^12-vector
    ANN scale path): every 64-dim embedding compresses to 4 per-
    subspace nearest-codeword ids under a FIXED deterministic
    codebook (the 8 smallest vec_ids' subvectors) — fixed codebooks
    make the assignment SQL-expressible per subspace, exactly like
    q_kmeans_assign. The distributed trainer (pq_fit moment combiner)
    and the ADC search (pq_topk) are pinned separately in pytest."""
    from bento_ray.textops import pq_encode

    V, _ = _query_vectors(sf_dir, 8)
    m, dsub = 4, V.shape[1] // 4
    C = np.stack([V[:, s * dsub:(s + 1) * dsub] for s in range(m)])
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = pq_encode(ds, C)
    return out.select_columns(
        ["vec_id", "code_0", "code_1", "code_2", "code_3"]).sort("vec_id")


SQL_PQ_ENCODE = """
WITH c AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, embedding
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
),
subs AS (SELECT unnest(range(4)) AS s),
d AS (
  SELECT e.vec_id, subs.s, c.cidx,
         list_distance(
           CAST(list_slice(e.embedding, 1 + subs.s * 16,
                           (subs.s + 1) * 16) AS DOUBLE[]),
           CAST(list_slice(c.embedding, 1 + subs.s * 16,
                           (subs.s + 1) * 16) AS DOUBLE[])) AS raw
  FROM embeddings e CROSS JOIN subs CROSS JOIN c
),
best AS (
  SELECT vec_id, s, cidx FROM d
  QUALIFY row_number() OVER (PARTITION BY vec_id, s
                             ORDER BY raw ASC, cidx) = 1
)
SELECT vec_id,
       CAST(MAX(CASE WHEN s = 0 THEN cidx END) AS BIGINT) AS code_0,
       CAST(MAX(CASE WHEN s = 1 THEN cidx END) AS BIGINT) AS code_1,
       CAST(MAX(CASE WHEN s = 2 THEN cidx END) AS BIGINT) AS code_2,
       CAST(MAX(CASE WHEN s = 3 THEN cidx END) AS BIGINT) AS code_3
FROM best GROUP BY vec_id ORDER BY vec_id
"""


def q_asof_join(sf_dir: str):
    """Distributed LARGE-LARGE as-of join (attribution: every
    purchase joins the latest click at-or-before it by the same
    user; purchases with no prior click keep nulls). Shuffle
    merge-rank partition scans — no broadcast side; the oracle is the
    explicit latest-row window rule with the same (ts, id) tie
    resolution."""
    from bento_ray.stages.join import asof_join

    ev = _t(sf_dir, "events", ["event_id", "ts", "user_id",
                               "event_type"])
    buys = ev.filter(expr="event_type == 'purchase'")
    clicks = ev.filter(expr="event_type == 'click'")
    out = asof_join(buys, clicks, key_col="user_id",
                    left_ts="ts", right_ts="ts",
                    left_id_col="event_id", right_id_col="event_id",
                    left_out="purchase_id", right_out="click_id")
    return out.sort(["user_id", "purchase_id"])


SQL_ASOF_JOIN = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click')
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
       epoch_us(c.ts) AS right_ts_us,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
QUALIFY row_number() OVER (
  PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) = 1
ORDER BY p.user_id, purchase_id
"""


# fixed merge list for the tokenization oracle (training is pinned
# separately in pytest; a literal list lets BOTH engines apply the
# identical merges)
_BPE_MERGES = [("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"),
               ("a", "n"), ("r", "e"), ("o", "n"), ("an", "d"),
               ("o", "r"), ("e", "n"), ("a", "t"), ("i", "t")]


def q_bpe_tokenize(sf_dir: str):
    """Distributed BPE tokenization (the apply step after training):
    per-doc token counts under a fixed merge list, computed by the
    broadcast-merge actor stage (distinct-word dedup + per-actor
    cache). The oracle simulates the same left-to-right merge passes
    in SQL over separator-wrapped characters."""
    from bento_ray.textops import bpe_tokenize

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = bpe_tokenize(ds, _BPE_MERGES).select_columns(
        ["doc_id", "n_bpe_tokens"])
    return out.sort("doc_id")


def _bpe_tokenize_sql() -> str:
    """Each token is rendered ``RS tok US`` (ASCII 30/31 — absent from
    the printable-ASCII corpus), so a merge (a, b) is EXACTLY the
    non-overlapping left-to-right replace of ``RS a US RS b US`` with
    ``RS ab US`` — the same single pass per merge as bpe_encode_word
    (false prefix/suffix boundaries can't match through the
    wrappers). Token count = RS count."""
    rs, us = "\x1e", "\x1f"
    expr = f"regexp_replace(w, '(.)', '{rs}\\1{us}', 'g')"
    for a, b in _BPE_MERGES:
        expr = (f"replace({expr}, '{rs}{a}{us}{rs}{b}{us}', "
                f"'{rs}{a}{b}{us}')")
    return f"""
WITH words AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w
        FROM documents)
  WHERE w <> ''
),
toks AS (
  SELECT doc_id,
         length({expr}) - length(replace({expr}, '{rs}', '')) AS n
  FROM words
)
SELECT d.doc_id,
       CAST(COALESCE(SUM(t.n), 0) AS BIGINT) AS n_bpe_tokens
FROM documents d LEFT JOIN toks t ON t.doc_id = d.doc_id
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


def q_cep_absence(sf_dir: str):
    """CEP negation / timeout (Flink `notFollowedBy` within a bound):
    signups with NO purchase by the same user in the following 6 h.
    One suffix-min pass per partition; the oracle is the equivalent
    NOT EXISTS anti-join with the same (ts, event_id) tie rule."""
    from bento_ray.stages.cep import match_absence

    ds = _t(sf_dir, "events",
            ["event_id", "ts", "user_id", "event_type"])
    out = match_absence(ds, "signup", "purchase",
                        within_us=21_600_000_000)
    return out.sort(["user_id", "first_event_id"])


SQL_CEP_ABSENCE = """
SELECT s.user_id, s.event_id AS first_event_id
FROM events s
WHERE s.event_type = 'signup' AND NOT EXISTS (
  SELECT 1 FROM events p
  WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
    AND (p.ts > s.ts OR (p.ts = s.ts AND p.event_id > s.event_id))
    AND epoch_us(p.ts) - epoch_us(s.ts) <= 21600000000
)
ORDER BY s.user_id, first_event_id
"""


def q_topk_per_group(sf_dir: str):
    """Top-3 orders by totalprice per priority, combiner-pruned: each
    block keeps ≤3 rows per priority before the shuffle, so the
    exchange moves k × groups × blocks rows regardless of input
    size."""
    from bento_ray.stages.rank import topk_per_group

    ds = _t(sf_dir, "orders",
            ["o_orderkey", "o_orderpriority", "o_totalprice"])
    out = topk_per_group(ds, ["o_orderpriority"], "o_totalprice",
                         "o_orderkey", 3, descending=True)
    return out.sort(["o_orderpriority", "o_orderkey"])


SQL_TOPK_PER_GROUP = """
SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_orderpriority
  ORDER BY o_totalprice DESC, o_orderkey) <= 3
ORDER BY o_orderpriority, o_orderkey
"""


def q_rolling_avg(sf_dir: str):
    """Per-user rolling 5-event average of `value` in event order
    (Flink OVER ROWS window): one hash exchange + shifted-cumsum
    partition scans. Sums ride an integer micro-unit grid
    (half-away-from-zero like SQL ROUND) so Ray and DuckDB agree
    bit-for-bit; the average divides the same two IEEE doubles on
    both engines."""
    from bento_ray.stages.rank import rolling_aggregate

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = rolling_aggregate(ds, key_col="user_id", ts_col="ts",
                            val_col="value", id_col="event_id",
                            window=5)
    return out.sort(["user_id", "event_id"])


def q_window_topk(sf_dir: str):
    """Streaming top-k: top-2 events by value per (1h tumbling
    window, event_type) — window assignment composed with the
    combiner-pruned per-group top-k, so the exchange moves ≤ 2 rows
    per (window, type) per block. The oracle runs the same window
    arithmetic + row_number rule."""
    from bento_ray.stages.rank import topk_per_group

    ds = _t(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    ds = ds.map_batches(lambda t: _tumble_naive(t, "ts", HOUR_US),
                        batch_format="pyarrow")
    out = topk_per_group(ds, ["window_end", "event_type"], "value",
                         "event_id", 2, descending=True)
    return (out.select_columns(["window_end", "event_type", "event_id",
                                "value"])
            .sort(["window_end", "event_type", "event_id"]))


SQL_WINDOW_TOPK = f"""
WITH w AS (
  SELECT make_timestamp(((epoch_us(ts) + {HOUR_US - 1}) // {HOUR_US})
                        * {HOUR_US}) AS window_end,
         event_type, event_id, value
  FROM events
)
SELECT window_end, event_type, event_id, value FROM w
QUALIFY row_number() OVER (
  PARTITION BY window_end, event_type
  ORDER BY value DESC, event_id) <= 2
ORDER BY window_end, event_type, event_id
"""


SQL_ROLLING_AVG = """
WITH m AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 1e6) AS BIGINT) AS micro
  FROM events
)
SELECT user_id, event_id,
       COUNT(*) OVER w AS roll_cnt,
       CAST(SUM(micro) OVER w AS BIGINT) AS roll_sum_micro,
       (CAST(SUM(micro) OVER w AS BIGINT)
        / COUNT(*) OVER w) / 1e6 AS roll_avg
FROM m
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, SQL_Q1),
    "q_bloblang_revenue": (q_bloblang_revenue, SQL_BLOBLANG_REVENUE),
    "q_revenue_filter_map": (q_revenue_filter_map, SQL_REVENUE),
    "q_topk_orders": (q_topk_orders, SQL_TOPK),
    "q_orders_by_segment": (q_orders_by_segment, SQL_SEGMENT),
    "q_priority_revenue": (q_priority_revenue, SQL_PRIORITY),
    "q_switch_route": (q_switch_route, SQL_SWITCH),
    "q_docs_by_lang": (q_docs_by_lang, SQL_DOCS_LANG),
    "q_branch_enrich": (q_branch_enrich, SQL_BRANCH),
    "q_json_extract": (q_json_extract, SQL_JSON),
    "q_window_tumbling": (q_window_tumbling, SQL_TUMBLING),
    "q_window_sliding": (q_window_sliding, SQL_SLIDING),
    "q_window_session": (q_window_session, SQL_SESSION),
    "q_dedupe_first_event": (q_dedupe_first_event, SQL_DEDUPE_FIRST),
    "q_dedupe_last_event": (q_dedupe_last_event, SQL_DEDUPE_LAST),
    "q_doc_stats": (q_doc_stats, SQL_DOC_STATS),
    "q_warc_curation": (q_warc_curation, SQL_WARC_CURATION),
    "q_token_count_by_lang": (q_token_count_by_lang, SQL_TOKENS),
    "q_dedup_exact_docs": (q_dedup_exact_docs, SQL_DEDUP_DOCS),
    "q_quality_filter": (q_quality_filter, SQL_QUALITY_FILTER),
    "q_ann_topk": (q_ann_topk, SQL_ANN),
    "q_embedding_norms": (q_embedding_norms, SQL_NORMS),
    "q_salted_hot_key_agg": (q_salted_hot_key_agg, SQL_SALTED),
    "q_nation_revenue": (q_nation_revenue, SQL_NATION),
    "q_minmax_events": (q_minmax_events, SQL_MINMAX),
    "q_distinct_users": (q_distinct_users, SQL_DISTINCT),
    "q_union_streams": (q_union_streams, SQL_UNION),
    "q_quality_scores": (q_quality_scores, SQL_QUALITY_SCORES),
    "q_config_yaml_orders": (q_config_yaml_orders, SQL_CONFIG_YAML),
    "q_archive_roundtrip": (q_archive_roundtrip, SQL_ARCHIVE_ROUNDTRIP),
    "q_cosine_near_dups": (q_cosine_near_dups, SQL_COSINE_NEAR_DUPS),
    "q_pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "q_repetition_metrics": (q_repetition_metrics, SQL_REPETITION),
    "q_normalize_text": (q_normalize_text, SQL_NORMALIZE_TEXT),
    "q_term_frequency": (q_term_frequency, SQL_TERM_FREQ),
    "q_top_bigrams": (q_top_bigrams, SQL_TOP_BIGRAMS),
    "q_tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF),
    "q_dup_ngram_stats": (q_dup_ngram_stats, SQL_DUP_NGRAMS),
    "q_hash_sample": (q_hash_sample, SQL_HASH_SAMPLE),
    "q_stratified_sample": (q_stratified_sample, SQL_STRATIFIED),
    "q_lang_id": (q_lang_id, SQL_LANG_ID),
    "q_length_quantiles": (q_length_quantiles, SQL_LENGTH_QUANTILES),
    "q_token_counts": (q_token_counts, _token_counts_sql()),
    "q_embedding_dim_stats": (q_embedding_dim_stats,
                              SQL_EMBEDDING_DIM_STATS),
    "q_decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "q_unigram_logprob": (q_unigram_logprob, SQL_UNIGRAM_LOGPROB),
    "q_dsir_select": (q_dsir_select, SQL_DSIR_SELECT),
    "q_value_quantiles": (q_value_quantiles, SQL_VALUE_QUANTILES),
    "q_heavy_hitters": (q_heavy_hitters, SQL_TERM_FREQ),
    "q_distinct_users_hll": (q_distinct_users_hll, SQL_DISTINCT_HLL),
    "q_dup_window_coverage": (q_dup_window_coverage,
                              SQL_DUP_WINDOW_COVERAGE),
    "q_remove_dup_spans": (q_remove_dup_spans, SQL_REMOVE_DUP_SPANS),
    "q_sequence_packing": (q_sequence_packing, SQL_SEQUENCE_PACKING),
    "q_snowcat_pii": (q_snowcat_pii, SQL_SNOWCAT_PII),
    "q_wasm_uppercase": (q_wasm_uppercase, SQL_WASM_UPPER),
    "q_url_dedup": (q_url_dedup, SQL_URL_DEDUP),
    "q_incremental_dedup": (q_incremental_dedup, SQL_INCREMENTAL_DEDUP),
    "q_kmeans_assign": (q_kmeans_assign, SQL_KMEANS_ASSIGN),
    "q_seeded_shuffle": (q_seeded_shuffle, _seeded_shuffle_sql()),
    "q_paragraph_dedup": (q_paragraph_dedup, SQL_PARAGRAPH_DEDUP),
    "q_ccnet_buckets": (q_ccnet_buckets, SQL_CCNET_BUCKETS),
    "q_bpe_pair_counts": (q_bpe_pair_counts, SQL_BPE_PAIRS),
    "q_weighted_mix": (q_weighted_mix, SQL_WEIGHTED_MIX),
    "q_curation_pipeline": (q_curation_pipeline, SQL_CURATION),
    "q_pagerank": (q_pagerank, _pagerank_sql()),
    "q_logreg_quality": (q_logreg_quality, _logreg_sql()),
    "q_simhash_near_dups": (q_simhash_near_dups, _simhash_near_dups_sql()),
    "q_extract_links": (q_extract_links, SQL_EXTRACT_LINKS),
    "q_cep_sequence": (q_cep_sequence, SQL_CEP_SEQUENCE),
    "q_cep_followed_by": (q_cep_followed_by, SQL_CEP_FOLLOWED_BY),
    "q_cep_absence": (q_cep_absence, SQL_CEP_ABSENCE),
    "q_bpe_tokenize": (q_bpe_tokenize, _bpe_tokenize_sql()),
    "q_asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "q_pq_encode": (q_pq_encode, SQL_PQ_ENCODE),
    "q_window_cumulate": (q_window_cumulate, SQL_WINDOW_CUMULATE),
    "q_window_distinct": (q_window_distinct, SQL_WINDOW_DISTINCT),
    "q_bigram_logprob": (q_bigram_logprob, SQL_BIGRAM_LOGPROB),
    "q_interval_join": (q_interval_join, SQL_INTERVAL_JOIN),
    "q_topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "q_window_topk": (q_window_topk, SQL_WINDOW_TOPK),
    "q_rolling_avg": (q_rolling_avg, SQL_ROLLING_AVG),
    "q_fix_mojibake": (q_fix_mojibake, SQL_FIX_MOJIBAKE),
    # rows-only (non-SQL-expressible)
    "q_minhash_near_dups": (q_minhash_near_dups, SQL_MINHASH),
    "q_dup_groups": (q_dup_groups, SQL_DUP_GROUPS),
    "q_dedup_keep": (q_dedup_keep, SQL_DEDUP_KEEP),
    "q_simhash": (q_simhash, SQL_SIMHASH),
    "q_doc_fingerprints": (q_doc_fingerprints, SQL_FINGERPRINTS),
    "q_ann_lsh": (q_ann_lsh, SQL_ANN),
    "q_ann_ivf": (q_ann_ivf, SQL_ANN),
    "q_cosine_near_dups_lsh": (q_cosine_near_dups_lsh, SQL_COSINE_NEAR_DUPS),
    "q_semdedup": (q_semdedup, SQL_SEMDEDUP),
    "q_flagship_stream": (q_flagship_stream, SQL_FLAGSHIP),
}


def queries():
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql():
    # SQL_FLAGSHIP reads the engine-generated gate corpus; generate it
    # now (cheap, driver-side, cached) so the files exist even if the
    # driver executes the SQL before the Ray query.
    try:
        _flagship_gate_corpus()
    except Exception:
        pass
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
