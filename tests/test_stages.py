"""Golden fixture transcriptions (FIXTURES.md §4.1, §4.2, §4.4, §4.5):
mapping/filter, dedupe FIFO/LIFO/cross-batch, batching policy,
switch/group_by/branch ordering semantics."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from bento_ray.stages.batching import batch_rows, dedupe_stream
from bento_ray.stages.compose import (
    group_by_table,
    group_by_value_table,
    switch_table,
)
from bento_ray.stages.core import archive, select_parts, unarchive
from bento_ray.stages.dedupe import dedupe_pane
from bento_ray.state.store import LocalCache


def _batch(vals):
    return pa.table({"content": pa.array([str(v) for v in vals], pa.string())})


def _contents(t):
    return t.column("content").to_pylist()


# -- 4.2 dedupe ------------------------------------------------------------

def test_dedupe_fifo_cross_batch():
    """config/test/deduplicate.yaml: batches [1,2,3,4,3,3,3] and
    [4,1,1,3,4,4,2,1] with key=content → exactly one output batch
    [1,2,3,4]; the fully-deduplicated second batch is dropped."""
    batches = [_batch([1, 2, 3, 4, 3, 3, 3]), _batch([4, 1, 1, 3, 4, 4, 2, 1])]
    out = list(dedupe_stream(batches, _contents))
    assert len(out) == 1
    assert _contents(out[0]) == ["1", "2", "3", "4"]


def test_dedupe_batch_scoped():
    """deduplicate_by_batch.yaml: key prefixed per batch → dedupe within
    batch only: [1,2,3,4], [4,1,3,2] (first-seen order)."""
    batches = [_batch([1, 2, 3, 4, 3, 3, 3]), _batch([4, 1, 1, 3, 4, 4, 2, 1])]
    out = [dedupe_pane(b, ["content"], "FIFO") for b in batches]
    assert _contents(out[0]) == ["1", "2", "3", "4"]
    assert _contents(out[1]) == ["4", "1", "3", "2"]


def test_dedupe_lifo_keeps_last_in_original_order():
    """deduplicate_lifo.yaml semantics: LIFO keeps the LAST occurrence
    per key; survivors emitted in original positional order
    (processor_dedupe.go:165-201 reverse scan + prepend)."""
    t = pa.table({
        "content": pa.array(["a", "b", "a", "c", "b"], pa.string()),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = dedupe_pane(t, ["content"], "LIFO")
    assert out.column("content").to_pylist() == ["a", "c", "b"]
    assert out.column("v").to_pylist() == [3, 4, 5]


def test_dedupe_stream_lifo_within_batch():
    t = pa.table({"content": pa.array(["a", "b", "a"], pa.string())})
    out = list(dedupe_stream([t], _contents, strategy="LIFO"))
    # reverse scan adds the last "a" first; survivors in original order
    assert _contents(out[0]) == ["b", "a"]


def test_dedupe_stream_ttl():
    import time

    cache = LocalCache(ttl_sec=0.05)
    b1 = list(dedupe_stream([_batch([1])], _contents, cache=cache))
    time.sleep(0.08)
    b2 = list(dedupe_stream([_batch([1])], _contents, cache=cache))
    assert _contents(b1[0]) == ["1"] and _contents(b2[0]) == ["1"]


# -- 4.4 batching policy ---------------------------------------------------

def test_batch_count_trigger():
    """count=3 over 7 docs → batch sizes [3,3,1] (final flush)."""
    out = list(batch_rows([_batch([1, 2, 3, 4, 5, 6, 7])], count=3))
    assert [len(b) for b in out] == [3, 3, 1]
    assert _contents(out[0]) == ["1", "2", "3"]
    assert _contents(out[2]) == ["7"]


def test_batch_check_trigger_inclusive():
    """check fires on the 'end' doc → batch closes INCLUDING it."""
    t = pa.table({"content": pa.array(["a", "end", "b", "c"], pa.string())})
    out = list(batch_rows(
        [t], check=lambda row, i: row.column("content")[i].as_py() == "end"))
    assert [_contents(b) for b in out] == [["a", "end"], ["b", "c"]]


def test_batch_byte_size_trigger():
    t = pa.table({"content": pa.array(["aaaa", "bb", "c", "dddd"], pa.string())})
    out = list(batch_rows([t], byte_size=5, size_col="content"))
    assert [_contents(b) for b in out] == [["aaaa", "bb"], ["c", "dddd"]]


# -- 4.5 switch / group_by / branch ---------------------------------------

def test_switch_routes_and_restores_input_order():
    t = pa.table({
        "k": pa.array(["a", "r", "x", "a", "r"], pa.string()),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })

    def times(n):
        def fn(sub):
            return sub.set_column(1, "v", pc.multiply(sub.column("v"),
                                                      pa.scalar(n)))
        return fn

    out = switch_table(t, [
        (lambda t: pc.equal(t.column("k"), pa.scalar("a")), times(10)),
        (lambda t: pc.equal(t.column("k"), pa.scalar("r")), times(100)),
    ])
    # original row order preserved, per-case transforms applied
    assert out.column("k").to_pylist() == ["a", "r", "x", "a", "r"]
    assert out.column("v").to_pylist() == [10, 200, 3, 40, 500]


def test_switch_fallthrough():
    t = pa.table({"v": pa.array([1, 2], pa.int64())})
    out = switch_table(
        t,
        [
            (None, lambda s: s.set_column(0, "v", pc.add(s.column("v"), pa.scalar(1)))),
            (None, lambda s: s.set_column(0, "v", pc.multiply(s.column("v"), pa.scalar(10)))),
        ],
        fallthrough=[True, False],
    )
    assert out.column("v").to_pylist() == [20, 30]


def test_group_by_declaration_order_then_groupless():
    """processor_group_by.go:130-184: one batch per matching check in
    declaration order, then the groupless batch."""
    t = pa.table({"lang": pa.array(["en", "de", "fr", "en"], pa.string())})
    groups = group_by_table(t, [
        (lambda t: pc.equal(t.column("lang"), pa.scalar("en")), None),
        (lambda t: pc.equal(t.column("lang"), pa.scalar("de")), None),
    ])
    assert [g.column("lang").to_pylist() for g in groups] == \
        [["en", "en"], ["de"], ["fr"]]


def test_group_by_value_insertion_order():
    """processor_group_by_value.go:86: per-key batches ordered by first
    occurrence of each key."""
    t = pa.table({"lang": pa.array(["de", "en", "de", "fr"], pa.string())})
    groups = group_by_value_table(t, "lang")
    assert [k for k, _ in groups] == ["de", "en", "fr"]
    assert [len(g) for _, g in groups] == [2, 1, 1]


# -- archive / unarchive / select_parts ------------------------------------

def test_archive_unarchive_json_roundtrip():
    t = pa.table({"a": pa.array([1, 2], pa.int64()),
                  "b": pa.array(["x", "y"], pa.string())})
    arch = archive(t, "json_array")
    assert len(arch) == 1
    back = unarchive(arch, "json_array")
    assert back.column("a").to_pylist() == [1, 2]
    assert back.column("b").to_pylist() == ["x", "y"]


def test_archive_lines_and_concatenate():
    t = _batch(["x", "y", "z"])
    assert archive(t, "lines").column("content")[0].as_py() == "x\ny\nz"
    assert archive(t, "concatenate").column("content")[0].as_py() == "xyz"
    lines = unarchive(archive(t, "lines"), "lines")
    assert _contents(lines) == ["x", "y", "z"]


def test_select_parts_negative_indexing():
    t = _batch(["a", "b", "c", "d"])
    assert _contents(select_parts(t, [0, -1])) == ["a", "d"]
    assert _contents(select_parts(t, [-2, 99])) == ["c"]


def test_insert_part_positions():
    from bento_ray.stages.core import insert_part

    t = _batch(["a", "b", "c"])
    out = insert_part(t, 1, {"content": "X"})
    assert _contents(out) == ["a", "X", "b", "c"]
    out = insert_part(t, -1, {"content": "X"})
    assert _contents(out) == ["a", "b", "c", "X"]
    out = insert_part(t, 99, {"content": "X"})
    assert _contents(out) == ["a", "b", "c", "X"]
    out = insert_part(t, 0, {"content": "X"})
    assert _contents(out) == ["X", "a", "b", "c"]


def test_dedupe_lru_cache_cross_batch():
    """deduplicate_lru.yaml: same cross-batch golden through an LRU
    cache resource — one output batch [1,2,3,4]."""
    cache = LocalCache(max_items=100)
    batches = [_batch([1, 2, 3, 4, 3, 3, 3]), _batch([4, 1, 1, 3, 4, 4, 2, 1])]
    out = list(dedupe_stream(batches, _contents, cache=cache))
    assert len(out) == 1
    assert _contents(out[0]) == ["1", "2", "3", "4"]


def test_dedupe_lru_eviction_readmits():
    """An LRU-evicted key is admitted again (capacity-bounded dedupe —
    the documented trade of the lru cache resource)."""
    cache = LocalCache(max_items=2)
    out = list(dedupe_stream(
        [_batch(["a", "b", "c"]), _batch(["a"])], _contents, cache=cache))
    # 'a' was evicted when 'c' arrived (cap 2) → re-admitted
    assert [_contents(b) for b in out] == [["a", "b", "c"], ["a"]]


def test_split_batches_unique_ids_across_workers():
    """batch_id must be unique across Ray tasks/workers — a plain
    closure counter restarts at 0 in every re-pickled task (ADVICE r1)."""
    import ray.data as rd

    from bento_ray.stages.core import split_batches

    ds = rd.range(5000).map_batches(
        lambda b: {"x": b["id"]}, batch_format="numpy")
    out = split_batches(ds, 100).materialize()
    df = out.to_pandas()
    per_batch = df.groupby("batch_id").size()
    assert (per_batch <= 100).all()
    # every (batch_id) group is one contiguous re-chunked batch; ids
    # must never collide across blocks → each group ≤ size and total
    # groups ≥ ceil(n/size)
    assert len(per_batch) >= 50


def test_cache_client_routing_is_process_stable():
    """CacheClient shard routing must not depend on PYTHONHASHSEED
    (ADVICE r1 high): the same key routes identically in any process —
    verified against a fixed blake2b-derived expectation."""
    import hashlib

    from bento_ray.state.store import CacheClient

    c = CacheClient.__new__(CacheClient)
    c.shards = 4
    for key in ["alpha", "beta", b"gamma", 123]:
        kb = key if isinstance(key, bytes) else str(key).encode()
        want = int.from_bytes(
            hashlib.blake2b(kb, digest_size=8).digest(), "big") % 4
        assert c._shard(key) == want


def test_cache_client_add_dedupe_contract():
    from bento_ray.state.store import CacheClient

    c = CacheClient(shards=2)
    assert c.madd(["a", "b", "a"]) == [True, True, False]
    assert c.add("a") is False
    assert c.get("a") == b"t"
    c.delete("a")
    assert c.add("a") is True


def test_shuffle_join_fallback_matches_primary():
    """The distributed co-bucketed fallback must produce the same rows
    as Ray's Dataset.join (VERDICT r1: the old fallback materialized
    the right side on the driver and emitted schema-inconsistent left
    joins)."""
    import pandas as pd
    import ray.data as rd

    from bento_ray.stages.join import shuffle_join

    left = rd.from_items([{"k": i % 7, "lv": i} for i in range(100)])
    right = rd.from_items([{"k": i, "rv": i * 10} for i in range(5)])

    def canon(ds):
        df = ds.to_pandas()
        return (df[sorted(df.columns)]
                .sort_values(sorted(df.columns), kind="stable")
                .reset_index(drop=True))

    a = canon(shuffle_join(left, right, on="k", how="inner"))
    b = canon(shuffle_join(left, right, on="k", how="inner",
                           force_fallback=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_shuffle_join_fallback_left_outer_nulls():
    """Left join through the fallback emits right-side columns as
    nulls for unmatched keys (schema-consistent)."""
    import ray.data as rd

    from bento_ray.stages.join import shuffle_join

    left = rd.from_items([{"k": i, "lv": i} for i in range(10)])
    right = rd.from_items([{"k": i, "rv": i * 10} for i in range(3)])
    df = shuffle_join(left, right, on="k", how="left",
                      force_fallback=True).to_pandas()
    assert set(df.columns) == {"k", "lv", "rv"}
    assert len(df) == 10
    assert df[df["k"] >= 3]["rv"].isna().all()
    assert not df[df["k"] < 3]["rv"].isna().any()


def test_workflow_skip_conditions_and_meta_tracking():
    """processor_workflow.go:404-449: `apply` whitelists stages,
    `succeeded`/`skipped` from a previous run skip re-execution; the
    meta column records per-row results."""
    import json

    import pandas as pd
    import ray.data as rd

    from bento_ray.stages.compose import workflow

    def _add(col, val):
        def _f(t):
            import pyarrow as _pa

            if col in t.column_names:
                i = t.schema.get_field_index(col)
                return t.set_column(i, col, _pa.array([val] * len(t)))
            return t.append_column(col, _pa.array([val] * len(t)))
        return _f

    branches = {"a": ((), _add("x", 1)), "b": (("a",), _add("y", 2))}

    ds = rd.from_items([
        {"id": 0, "wf": json.dumps({})},
        {"id": 1, "wf": json.dumps({"apply": ["a"]})},       # skip b
        {"id": 2, "wf": json.dumps({"succeeded": ["a"]})},   # skip a
    ])
    df = workflow(ds, branches, meta_col="wf").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    recs = [json.loads(v) for v in df["wf"]]
    assert recs[0] == {"succeeded": ["a", "b"]}
    assert recs[1] == {"succeeded": ["a"], "skipped": ["b"]}
    assert recs[2] == {"succeeded": ["b"], "skipped": ["a"]}
    # skipped branch left its column null for that row
    assert df.loc[1, "y"] is None or pd.isna(df.loc[1, "y"])
    assert df.loc[0, "y"] == 2


def test_workflow_failed_branch_recorded():
    import json

    import ray.data as rd

    from bento_ray.stages.compose import workflow

    def _boom(t):
        raise RuntimeError("branch exploded")

    ds = rd.from_items([{"id": 0}])
    df = workflow(ds, {"z": ((), _boom)}, meta_col="wf").to_pandas()
    rec = json.loads(df["wf"].iloc[0])
    assert rec["failed"]["z"] == "branch exploded"


def test_file_cache_add_contract(tmp_path):
    from bento_ray.state.store import FileCache

    c = FileCache(str(tmp_path / "fc"))
    assert c.add("k", b"1") is True
    assert c.add("k", b"2") is False     # Add fails if exists (O_EXCL)
    assert c.get("k") == b"1"
    c.set("k", b"3")
    assert c.get("k") == b"3"
    c.delete("k")
    assert c.get("k") is None
    # a second instance over the same dir sees the same state
    c2 = FileCache(str(tmp_path / "fc"))
    c.add("shared", b"x")
    assert c2.add("shared") is False


def test_multilevel_cache_semantics(tmp_path):
    from bento_ray.state.store import FileCache, LocalCache, MultilevelCache

    l1 = LocalCache()
    l2 = FileCache(str(tmp_path / "ml"))
    m = MultilevelCache([l1, l2])
    # add requires absence everywhere; atomic add happens on the LAST
    assert m.add("k", b"v") is True
    assert m.add("k", b"v") is False
    assert l2.get("k") == b"v" and l1.get("k") == b"v"
    # get back-fills upper levels
    l2.set("deep", b"d")
    assert l1.get("deep") is None
    assert m.get("deep") == b"d"
    assert l1.get("deep") == b"d"


def test_archive_unarchive_tar_zip_binary_roundtrip():
    from bento_ray.blobl.interp import Message
    from bento_ray.config.processors import (
        ArchiveProcessor, Runtime, UnarchiveProcessor,
    )

    rt = Runtime()
    batch = [Message.from_content(b"alpha", meta={"m": "1"}),
             Message.from_content(b"beta")]
    for fmt in ("tar", "zip", "binary"):
        arch = ArchiveProcessor(format=fmt, path="part-${! count(\"c\") }")
        packed = arch.process_batch(list(batch), rt)[0][0]
        out = UnarchiveProcessor(format=fmt).process_batch([packed], rt)[0]
        assert [m.content_bytes() for m in out] == [b"alpha", b"beta"], fmt
        if fmt in ("tar", "zip"):
            assert out[0].meta["archive_filename"].startswith("part-")


def test_unarchive_csv_and_json_map():
    from bento_ray.blobl.interp import Message
    from bento_ray.config.processors import Runtime, UnarchiveProcessor

    rt = Runtime()
    out = UnarchiveProcessor(format="csv").process_batch(
        [Message.from_content("a,b\n1,2\n3,4")], rt)[0]
    assert [m.structured() for m in out] == [
        {"a": "1", "b": "2"}, {"a": "3", "b": "4"}]
    out2 = UnarchiveProcessor(format="json_map").process_batch(
        [Message.from_content({"k1": 1, "k2": {"x": 2}})], rt)[0]
    keys = sorted(m.meta["archive_key"] for m in out2)
    assert keys == ["k1", "k2"]


def test_shuffle_join_how_vocabulary():
    """'left'/'left_outer' both work on BOTH join paths (the primary
    Dataset.join wants left_outer; pandas wants left)."""
    import ray.data as rd

    from bento_ray.stages.join import shuffle_join

    left = rd.from_items([{"k": i, "lv": i} for i in range(6)])
    right = rd.from_items([{"k": i, "rv": i * 10} for i in range(3)])
    for how in ("left", "left_outer"):
        for fb in (False, True):
            df = shuffle_join(left, right, on="k", how=how,
                              force_fallback=fb).to_pandas()
            assert len(df) == 6, (how, fb)
            assert df[df["k"] >= 3]["rv"].isna().all()


def test_stream_config_rejects_bad_slide():
    import pytest as _pytest

    from bento_ray.streaming import StreamConfig

    with _pytest.raises(ValueError, match="multiple of slide"):
        StreamConfig(window_size_us=10_000_000, slide_us=3_000_000)


def test_window_arithmetic_normalizes_ns_timestamps():
    """A pandas-default timestamp[ns] column must window identically
    to timestamp[us] (the raw int64 cast was 1000x off)."""
    import pandas as pd
    import pyarrow as pa

    from bento_ray.stages.window import assign_tumbling

    ts = pd.to_datetime(["2020-01-01 00:00:05", "2020-01-01 00:00:15"])
    t_ns = pa.table({"ts": pa.array(ts, pa.timestamp("ns"))})
    t_us = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    e_ns = assign_tumbling(t_ns, "ts", 10_000_000)["window_end"]
    e_us = assign_tumbling(t_us, "ts", 10_000_000)["window_end"]
    assert e_ns.to_pylist() == e_us.to_pylist()


def test_match_event_sequence_strict_contiguity():
    import ray.data as rd

    from bento_ray.stages.cep import match_event_sequence

    US = 1_000_000
    rows = [
        # user 1: click(0s) → purchase(10s): match, span 10s
        {"event_id": 1, "user_id": 1, "ts": 0, "event_type": "click"},
        {"event_id": 2, "user_id": 1, "ts": 10 * US, "event_type": "purchase"},
        # user 1: click(100s) → view → purchase: NOT contiguous
        {"event_id": 3, "user_id": 1, "ts": 100 * US, "event_type": "click"},
        {"event_id": 4, "user_id": 1, "ts": 110 * US, "event_type": "view"},
        {"event_id": 5, "user_id": 1, "ts": 120 * US, "event_type": "purchase"},
        # user 2: click → purchase but too slow (span 900s > 60s bound)
        {"event_id": 6, "user_id": 2, "ts": 0, "event_type": "click"},
        {"event_id": 7, "user_id": 2, "ts": 900 * US, "event_type": "purchase"},
        # user boundary never matches across users (3→8 adjacent in sort)
        {"event_id": 8, "user_id": 3, "ts": 101 * US, "event_type": "purchase"},
    ]
    import pyarrow as pa

    ds = rd.from_items(rows).map_batches(
        lambda t: t.set_column(
            t.column_names.index("ts"), "ts",
            t.column("ts").cast(pa.timestamp("us"))),
        batch_format="pyarrow")
    out = match_event_sequence(ds, ["click", "purchase"],
                               within_us=60 * US).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["user_id"], r["first_event_id"], r["last_event_id"],
            r["span_us"]) == (1, 1, 2, 10 * US)


def test_match_event_sequence_three_step_overlaps():
    import pyarrow as pa

    import ray.data as rd

    from bento_ray.stages.cep import match_event_sequence

    US = 1_000_000
    # a b a b a — pattern [a, b, a] matches at positions 0 and 2
    types = ["a", "b", "a", "b", "a"]
    rows = [{"event_id": i, "user_id": 7, "ts": i * US, "event_type": t}
            for i, t in enumerate(types)]
    ds = rd.from_items(rows).map_batches(
        lambda t: t.set_column(
            t.column_names.index("ts"), "ts",
            t.column("ts").cast(pa.timestamp("us"))),
        batch_format="pyarrow")
    out = match_event_sequence(ds, ["a", "b", "a"], within_us=10 * US) \
        .to_pandas().sort_values("first_event_id")
    assert list(out["first_event_id"]) == [0, 2]
    assert list(out["last_event_id"]) == [2, 4]


def test_group_by_value_table_null_keys():
    """Rows with a null key must come back in their own group — the
    old pc.equal(col, null-scalar) mask silently dropped them from
    every group (total output rows < input rows)."""
    t = pa.table({"k": ["a", None, "a", None], "x": [1, 2, 3, 4]})
    groups = group_by_value_table(t, "k")
    assert [k for k, _ in groups] == ["a", None]
    by_key = {k: sub for k, sub in groups}
    assert by_key["a"].column("x").to_pylist() == [1, 3]
    assert by_key[None].column("x").to_pylist() == [2, 4]
    assert sum(len(sub) for _, sub in groups) == len(t)


def test_session_windows_group_ns_timestamps():
    """session_windows_group must normalize pandas' default
    datetime64[ns] to MICROSECONDS before comparing against gap_us —
    a raw int64 view made a 60s gap read as 60µs."""
    import pandas as pd

    from bento_ray.stages.window import session_windows_group

    base = pd.Timestamp("2024-01-01", tz="UTC")
    g = pd.DataFrame({
        "ts": [base, base + pd.Timedelta(seconds=10),
               base + pd.Timedelta(seconds=200)],
        "v": [1, 2, 3],
    })
    out = session_windows_group(g, "ts", gap_us=60_000_000)
    # rows 1-2 share a session (10s < 60s); row 3 starts a new one
    ends = out["window_end"].tolist()
    assert ends[0] == ends[1] != ends[2]
    assert ends[0] == base + pd.Timedelta(seconds=70)
    assert ends[2] == base + pd.Timedelta(seconds=260)
