"""Streaming engine: watermark windows, dedupe, enrichment join,
exactly-once sink, resume-from-checkpoint (FIXTURES.md §4.3, §4.6, §4.7)."""

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bento_ray.pipelines import dim_versions_table, flagship_batch, flagship_streaming
from bento_ray.streaming import ExactlyOnceParquetSink, StreamConfig, run_stream
from bento_ray.testgen.pages import BASE_TS_US

OUT_COLS = ["window_end", "lang", "pages", "nbytes", "lang_name", "script",
            "version", "window_end_timestamp"]


def _read_sink(out_dir) -> pd.DataFrame:
    df = ExactlyOnceParquetSink(out_dir).read().to_pandas()
    df["window_end"] = pd.to_datetime(df["window_end"], utc=True).astype(
        "datetime64[ns, UTC]")
    return (df[OUT_COLS].sort_values(["window_end", "lang"])
            .reset_index(drop=True))


def _oracle(pages_dir, window_us=10_000_000) -> pd.DataFrame:
    """Independent pandas implementation of the flagship semantics:
    dedupe first-crawl per url → tumbling left-open windows → per-lang
    aggregate → last-write-wins enrichment."""
    import glob

    from bento_ray.html import strip_html
    from bento_ray.util import rfc3339nano

    t = pa.concat_tables([pq.read_table(f) for f in
                          sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))])
    df = t.to_pandas()
    df["nbytes"] = [len(strip_html(h).encode()) for h in df["html"]]
    df["ts_us"] = df["warc_ts"].astype("datetime64[us, UTC]").astype("int64")
    df = df.sort_values(["ts_us", "url"], kind="stable").drop_duplicates(
        subset=["url"], keep="first")
    df["we_us"] = ((df["ts_us"] + window_us - 1) // window_us) * window_us
    agg = (df.groupby(["we_us", "lang"], sort=True)
             .agg(pages=("url", "size"), nbytes=("nbytes", "sum")).reset_index())
    dim = dim_versions_table().to_pandas().sort_values("update_ts", kind="stable")
    agg = pd.merge_asof(agg.sort_values("we_us"), dim, left_on="we_us",
                        right_on="update_ts", by="lang", direction="backward")
    agg["window_end_timestamp"] = [rfc3339nano(v) for v in agg["we_us"]]
    agg["window_end"] = pd.to_datetime(agg["we_us"], unit="us", utc=True).astype(
        "datetime64[ns, UTC]")
    return (agg[OUT_COLS].sort_values(["window_end", "lang"])
            .reset_index(drop=True))


@pytest.fixture(scope="module")
def stream_out(pages_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_out"))
    shutil.rmtree(out, ignore_errors=True)
    metrics = flagship_streaming(pages_small, out, partitions=4,
                                 files_per_epoch=2)
    return out, metrics


def test_stream_matches_independent_oracle(pages_small, stream_out):
    out, metrics = stream_out
    got = _read_sink(out)
    want = _oracle(pages_small)
    pd.testing.assert_frame_equal(got, want)


def test_stream_matches_batch_mode(pages_small, stream_out):
    out, _ = stream_out
    got = _read_sink(out)
    bdf = flagship_batch(pages_small).to_pandas()
    bdf["window_end"] = pd.to_datetime(bdf["window_end"], utc=True).astype(
        "datetime64[ns, UTC]")
    bdf = bdf[OUT_COLS].sort_values(["window_end", "lang"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, bdf)


def test_enrichment_versions_flip_at_update(stream_out):
    out, _ = stream_out
    got = _read_sink(out)
    upd_ts = pd.Timestamp(BASE_TS_US + 30_000_000, unit="us", tz="UTC")
    en = got[got["lang"] == "en"]
    before = en[en["window_end"] < upd_ts]
    after = en[en["window_end"] >= upd_ts]
    assert (before["lang_name"] == "English").all()
    assert (before["version"] == 1).all()
    assert (after["lang_name"] == "English (v2)").all()
    assert (after["version"] == 2).all()


def test_dedupe_drops_recrawls(stream_out):
    _, metrics = stream_out
    wm = metrics["worker_metrics"]
    assert wm["dedupe_dropped"] > 0  # generator re-emits ~10% urls
    assert wm["rows_in"] == 3000


def test_deterministic_rerun(pages_small, stream_out, tmp_path):
    out1, _ = stream_out
    out2 = str(tmp_path / "rerun")
    flagship_streaming(pages_small, out2, partitions=4, files_per_epoch=2)
    pd.testing.assert_frame_equal(_read_sink(out1), _read_sink(out2))


def test_partition_count_invariance(pages_small, stream_out, tmp_path):
    """Results are independent of the parallelism level (the scaling
    criterion's correctness half)."""
    out2 = str(tmp_path / "p2")
    flagship_streaming(pages_small, out2, partitions=2, files_per_epoch=3)
    out1, _ = stream_out
    pd.testing.assert_frame_equal(_read_sink(out1), _read_sink(out2))


def test_resume_replays_only_unacked_partitions(pages_small, stream_out, tmp_path):
    """FIXTURES.md §4.7: crash after some partitions of an epoch
    committed → resume skips exactly those, final output identical."""
    out1, _ = stream_out
    clean = _read_sink(out1)

    out = str(tmp_path / "crash")
    cfg = dict(partitions=4, files_per_epoch=2)
    with pytest.raises(RuntimeError, match="injected crash"):
        from bento_ray.pipelines.flagship import dim_versions_table as dvt
        cfg_obj = StreamConfig(window_size_us=10_000_000,
                               allowed_lateness_us=2_000_000,
                               partitions=4, out_partitions=4,
                               files_per_epoch=2,
                               extra={"crash_after": (1, 2)})
        run_stream(pages_small, cfg_obj, out, dim_versions=dvt())

    sink = ExactlyOnceParquetSink(out)
    assert sink.last_done_epoch() == 0          # epoch 1 not finished
    assert sink.committed(1, 0) and sink.committed(1, 2)
    assert not sink.committed(1, 3)

    metrics = flagship_streaming(pages_small, out, partitions=4,
                                 files_per_epoch=2, resume=True)
    assert metrics["start_epoch"] == 1          # epoch 0 skipped entirely
    assert metrics["partitions_skipped"] == 3   # parts 0..2 of epoch 1
    pd.testing.assert_frame_equal(_read_sink(out), clean)


def test_lineage_records(stream_out):
    out, metrics = stream_out
    recs = ExactlyOnceParquetSink(out).lineage()
    assert len(recs) == metrics["epochs"] * 4
    for r in recs:
        assert set(r) >= {"epoch", "partition", "rows", "data_file", "lineage"}
        assert r["lineage"]["input_files"]
        assert "watermark" in r["lineage"]


def test_ttl_bounded_dedupe_matches_unbounded(pages_small, stream_out,
                                              tmp_path):
    """A TTL'd seen-set (bounded memory at CC scale) must produce
    byte-identical output to the unbounded run when no duplicate
    recurs beyond the TTL — here TTL exceeds the whole event-time
    span, so every recrawl is still within it while the GC/horizon
    code paths all run each flush."""
    out = str(tmp_path / "ttl_run")
    flagship_streaming(pages_small, out, partitions=4, files_per_epoch=2)
    unbounded = _read_sink(stream_out[0])

    out_ttl = str(tmp_path / "ttl_run2")
    cfg = StreamConfig(window_size_us=10_000_000, partitions=4,
                       out_partitions=4, files_per_epoch=2,
                       dedupe_ttl_us=10**15)
    m = run_stream(pages_small, cfg, out_ttl,
                   dim_versions=dim_versions_table())
    assert m["worker_metrics"]["dedupe_dropped"] > 0
    pd.testing.assert_frame_equal(_read_sink(out_ttl), unbounded)


def test_default_dedupe_ttl_is_bounded():
    """No unbounded-state default: StreamConfig derives a finite TTL
    from the window arithmetic unless the caller explicitly opts in
    with None."""
    from bento_ray.streaming.engine import DEDUPE_TTL_FACTOR

    cfg = StreamConfig()
    assert cfg.dedupe_ttl_us == DEDUPE_TTL_FACTOR * (10_000_000 + 2_000_000)
    cfg = StreamConfig(window_size_us=60_000_000, allowed_lateness_us=0)
    assert cfg.dedupe_ttl_us == DEDUPE_TTL_FACTOR * 60_000_000
    # explicit opt-ins still respected
    assert StreamConfig(dedupe_ttl_us=None).dedupe_ttl_us is None
    assert StreamConfig(dedupe_ttl_us=5).dedupe_ttl_us == 5


def test_ttl_eviction_readmits_recrawl(tmp_path):
    """A url recurring BEYOND the TTL is re-admitted (counted again):
    the seen-set is a horizon, not a forever-set."""
    from bento_ray.testgen.pages import generate_pages_table

    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    base = generate_pages_table(4, seed=7, dup_frac=0.0)
    # file 0: rows 0..3 at ~t0; file 1: row 0 recrawled 100s later
    pq.write_table(base, os.path.join(pages_dir, "part-00000.parquet"))
    recrawl = base.slice(0, 1).set_column(
        1, "warc_ts",
        pa.array([base.column("warc_ts")[0].value + 100_000_000],
                 pa.timestamp("us", tz="UTC")))
    pq.write_table(recrawl, os.path.join(pages_dir, "part-00001.parquet"))

    def run(ttl, name):
        out = str(tmp_path / name)
        cfg = StreamConfig(window_size_us=10_000_000, partitions=2,
                           out_partitions=2, files_per_epoch=1,
                           allowed_lateness_us=0, dedupe_ttl_us=ttl)
        m = run_stream(pages_dir, cfg, out,
                       dim_versions=dim_versions_table())
        return m, _read_sink(out)

    m_un, df_un = run(None, "unbounded")
    assert m_un["worker_metrics"]["dedupe_dropped"] == 1
    assert int(df_un["pages"].sum()) == 4

    m_ttl, df_ttl = run(30_000_000, "ttl30s")  # 30s TTL < 100s gap
    assert m_ttl["worker_metrics"]["dedupe_dropped"] == 0
    assert int(df_ttl["pages"].sum()) == 5  # recrawl re-admitted


def test_seen_set_semantics():
    """_SeenSet vs a dict reference: contains/add/gc/rebuild across
    merges of the unsorted tail into the sorted main run."""
    from bento_ray.streaming.actors import _SeenSet

    rng = np.random.RandomState(7)
    s = _SeenSet()
    ref: dict[int, int] = {}
    for step in range(30):
        q = rng.randint(0, 500, size=200).astype(np.uint64)
        ts = (rng.randint(0, 1000, size=200) + step * 100).astype(np.int64)
        # first occurrence within the batch wins, like the worker loop
        _, fi = np.unique(q, return_index=True)
        q, ts = q[fi], ts[fi]
        known = s.contains(q)
        assert list(known) == [int(h) in ref for h in q]
        s.add(q[~known], ts[~known])
        for h, t in zip(q[~known], ts[~known]):
            ref[int(h)] = int(t)
        if step % 7 == 3:
            horizon = int(step * 35)
            s.gc(horizon)
            ref = {h: t for h, t in ref.items() if t >= horizon}
        assert len(s) == len(ref)
    # rebuild keeps the LAST occurrence per hash (restore semantics)
    s2 = _SeenSet()
    h = np.array([5, 9, 5, 7], np.uint64)
    t = np.array([10, 20, 30, 40], np.int64)
    s2.rebuild(h, t)
    assert len(s2) == 3
    assert list(s2.contains(np.array([5, 7, 9, 8], np.uint64))) == \
        [True, True, True, False]
    assert s2.t[s2.h == 5][0] == 30


def test_late_rows_dropped():
    """Reference late rule (buffer_system_window.go:333-336): rows at or
    before the flushed frontier are dropped, not emitted."""
    import ray

    d = "/tmp/bento_late_test"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    base = BASE_TS_US

    def mk(path, rows):
        t = pa.table({
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([base + r[1] for r in rows],
                                pa.timestamp("us", tz="UTC")),
            "html": pa.array([b"<p>x</p>" for _ in rows], pa.binary()),
            "lang": pa.array(["en" for _ in rows]),
        })
        pq.write_table(t, path)

    # epoch 0: ts up to 100s → watermark 98s → windows ≤ 90s flushed
    mk(os.path.join(d, "a.parquet"),
       [(f"u{i}", i * 10_000_000 + 1) for i in range(10)])
    # epoch 1: one very late row at 5s (window (0,10] already flushed)
    # and one fresh row
    mk(os.path.join(d, "b.parquet"), [("late", 5_000_000), ("u99", 101_000_000)])

    cfg = StreamConfig(partitions=2, out_partitions=2, files_per_epoch=1,
                       allowed_lateness_us=2_000_000)
    m = run_stream(d, cfg, os.path.join(d, "out"), dim_versions=None)
    assert m["worker_metrics"]["late_dropped"] == 1
    df = ExactlyOnceParquetSink(os.path.join(d, "out")).read().to_pandas()
    assert int(df["pages"].sum()) == 11  # late row excluded


def test_resume_reseeds_watermark_nonmonotone(tmp_path):
    """ADVICE r1 (medium): with NON-monotone event times across epoch
    files, a crash-resume must re-seed the watermark from restored
    worker state — otherwise the replayed epoch's watermark regresses
    and partition content diverges from the clean run."""
    import pyarrow.parquet as pq

    from bento_ray.testgen.pages import BASE_TS_US

    d = str(tmp_path / "nonmono")
    os.makedirs(d)

    def mk(path, rows):
        t = pa.table({
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([BASE_TS_US + r[1] for r in rows],
                                pa.timestamp("us", tz="UTC")),
            "html": pa.array([b"<p>x</p>"] * len(rows), pa.binary()),
            "lang": pa.array(["en"] * len(rows)),
        })
        pq.write_table(t, path)

    s = 1_000_000
    # epoch 0 (file a): ts up to 300s — the GLOBAL max.  epoch 1 (file
    # b, FINAL): ts 207..270s, below epoch 0's max (non-monotone).
    # Without the reseed, the resumed final watermark derives only from
    # file b (270+60+100=430 < clean 460) — still above every pane end
    # here, so ALSO place epoch-0 events near 300s whose pane end (360)
    # exceeds the regressed watermark... 430 > 360. Make epoch 0 reach
    # 400s: pane end 420 < 430 still flushed. So push epoch 0 max to
    # 600s: clean final watermark 760, regressed 430 → panes (420, 600]
    # from epoch 0 never flush without the reseed (lost rows).
    mk(os.path.join(d, "a.parquet"),
       [(f"u{i}", 20 * s * i) for i in range(1, 31)])      # 20..600s
    mk(os.path.join(d, "b.parquet"),
       [(f"v{i}", 200 * s + 7 * s * i) for i in range(1, 11)])  # 207..270s

    def cfg(crash=None):
        return StreamConfig(window_size_us=60_000_000,
                            allowed_lateness_us=100_000_000,
                            partitions=2, out_partitions=2,
                            files_per_epoch=1,
                            extra={"crash_after": crash} if crash else {})

    def read(out_dir):
        df = ExactlyOnceParquetSink(out_dir).read().to_pandas()
        df["window_end"] = pd.to_datetime(df["window_end"], utc=True)
        return (df.sort_values(["window_end", "lang"])
                .reset_index(drop=True)[["window_end", "lang", "pages"]])

    clean_out = str(tmp_path / "clean")
    run_stream(d, cfg(), clean_out, dim_versions=None)
    clean = read(clean_out)

    crash_out = str(tmp_path / "crashed")
    with pytest.raises(RuntimeError, match="injected crash"):
        run_stream(d, cfg(crash=(1, 0)), crash_out, dim_versions=None)
    run_stream(d, cfg(), crash_out, dim_versions=None, resume=True)
    pd.testing.assert_frame_equal(read(crash_out), clean)


def test_pause_append_resume_matches_continuous(pages_small, stream_out,
                                                tmp_path):
    """drain=False = pause, not end-of-stream: run the first 4 files,
    pause (open panes stay pending, frontier at the normal watermark),
    append the last 2 files and re-run — the resumed stream's output is
    byte-identical to the continuous run over all 6 files."""
    import glob

    files = sorted(glob.glob(os.path.join(pages_small, "*.parquet")))
    grow = str(tmp_path / "grow")
    os.makedirs(grow)
    for f in files[:4]:
        shutil.copy(f, grow)
    out = str(tmp_path / "paused")
    cfg = StreamConfig(window_size_us=10_000_000,
                       allowed_lateness_us=2_000_000,
                       partitions=4, out_partitions=4,
                       files_per_epoch=2, drain=False)
    m1 = run_stream(grow, cfg, out, dim_versions=dim_versions_table())
    for f in files[4:]:
        shutil.copy(f, grow)
    m2 = flagship_streaming(grow, out, partitions=4, files_per_epoch=2,
                            resume=True)
    assert m2["start_epoch"] == m1["epochs"]     # only the new epoch ran
    out1, _ = stream_out                         # continuous run, same cfg
    pd.testing.assert_frame_equal(_read_sink(out), _read_sink(out1))


def test_pause_append_resume_misaligned_chunking(pages_small, tmp_path):
    """Regression (ADVICE r4, medium): pause with a file count NOT a
    multiple of files_per_epoch (3 files, fpe=2 → epochs [f0,f1],[f2]),
    append the remaining 3 and resume. Naive re-chunking of the grown
    6-file listing would assign f3 into the already-committed epoch 1
    and silently never feed it (data loss); the lineage-based re-chunk
    feeds [f3,f4],[f5] and the result matches the batch oracle."""
    import glob

    files = sorted(glob.glob(os.path.join(pages_small, "*.parquet")))
    assert len(files) >= 6
    grow = str(tmp_path / "grow")
    os.makedirs(grow)
    for f in files[:3]:
        shutil.copy(f, grow)
    out = str(tmp_path / "paused")
    cfg = StreamConfig(window_size_us=10_000_000,
                       allowed_lateness_us=2_000_000,
                       partitions=4, out_partitions=4,
                       files_per_epoch=2, drain=False)
    m1 = run_stream(grow, cfg, out, dim_versions=dim_versions_table())
    assert m1["epochs"] == 2
    for f in files[3:6]:
        shutil.copy(f, grow)
    m2 = flagship_streaming(grow, out, partitions=4, files_per_epoch=2,
                            resume=True)
    assert m2["start_epoch"] == 2 and m2["epochs"] == 4
    pd.testing.assert_frame_equal(_read_sink(out), _oracle(grow))


def test_resume_chunks_unit():
    """_resume_chunks reconstructs committed epochs from lineage,
    chunks only unconsumed files after them, and fails fast when a
    lineage file vanished from the listing."""
    from bento_ray.streaming.engine import _resume_chunks

    class FakeSink:
        def __init__(self, lineages):
            self._l = lineages

        def epoch_lineage(self, e):
            return self._l[e] if e < len(self._l) else {}

    sink = FakeSink([{"input_files": ["f0", "f1"]},
                     {"input_files": ["f2"]}])
    files = [f"f{i}" for i in range(6)]
    assert _resume_chunks(files, 2, sink, 1) == [
        ["f0", "f1"], ["f2"], ["f3", "f4"], ["f5"]]
    with pytest.raises(ValueError, match="absent from the current"):
        _resume_chunks(["f0", "f3"], 2, sink, 1)


def test_resume_chunks_partial_crash_epoch():
    """A crash MID-epoch leaves epoch last_done+1 with partition
    commits but no done-marker. Its composition is pinned by those
    commits, so resume must rebuild it from lineage too — otherwise
    an appended file that sorts into the crash epoch silently changes
    its file set under the already-committed partitions."""
    from bento_ray.streaming.engine import _resume_chunks

    class FakeSink:
        def __init__(self, lineages):
            self._l = lineages

        def epoch_lineage(self, e):
            return self._l[e] if e < len(self._l) else {}

    # crash mid-epoch 1 ([f2, f3]); user appends f2a which sorts
    # between f2 and f3
    sink = FakeSink([{"input_files": ["f0", "f1"]},
                     {"input_files": ["f2", "f3"]}])
    files = ["f0", "f1", "f2", "f2a", "f3"]
    assert _resume_chunks(files, 2, sink, 0) == [
        ["f0", "f1"], ["f2", "f3"], ["f2a"]]
    # two-stream alignment: a side with ZERO files in the crash epoch
    # still gets its (empty) epoch slot when the other side committed
    sink_r = FakeSink([{"left_files": ["l0"], "right_files": ["r0"]},
                       {"left_files": ["l1"], "right_files": []}])
    assert _resume_chunks(["r0", "r1"], 2, sink_r, 0,
                          key="right_files") == [["r0"], [], ["r1"]]


def test_spill_seen_set_gc_before_first_spill():
    """gc() must filter the unsorted tail even when nothing has
    spilled to disk yet — the tail-merge was skipped in the no-runs
    branch, so TTL-expired tail entries kept suppressing
    re-occurrences (diverging from the in-RAM _SeenSet)."""
    import tempfile

    from bento_ray.streaming.actors import _SeenSet, _SpillSeenSet

    q = np.array([11, 22, 33], np.uint64)
    ts = np.array([5, 6, 7], np.int64)
    ram = _SeenSet()
    ram.add(q, ts)
    ram.gc(100)
    with tempfile.TemporaryDirectory() as d:
        s = _SpillSeenSet(d, mem_entries=1 << 20)  # no spill happens
        s.add(q, ts)
        assert len(s.th) and not s._runs  # entries sit in the tail
        s.gc(100)  # horizon past every entry
        assert (s.contains(q) == ram.contains(q)).all()
        assert not s.contains(q).any() and len(s) == 0


def test_distributed_finalize_byte_identical(pages_small, stream_out,
                                             tmp_path):
    """cfg.distributed_finalize fans the epoch combine out to one
    reducer per output partition (hash-bucketed groupby exchange).
    The committed sink must be BYTE-identical to the single-task
    path, file by file: bucketing is a function of the group key, so
    it commutes with the aggregate and preserves per-partition row
    order."""
    out_ref, _ = stream_out
    out2 = str(tmp_path / "dist")
    flagship_streaming(pages_small, out2, partitions=4,
                       files_per_epoch=2, distributed_finalize=True)

    ref_files = sorted(glob.glob(os.path.join(out_ref, "data", "**",
                                              "*.parquet"), recursive=True))
    got_files = sorted(glob.glob(os.path.join(out2, "data", "**",
                                              "*.parquet"), recursive=True))
    assert [os.path.relpath(f, out_ref) for f in ref_files] == \
           [os.path.relpath(f, out2) for f in got_files]
    assert ref_files
    for a, b in zip(ref_files, got_files):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), (a, b)


def test_spillable_seen_set_byte_identical(pages_small, tmp_path):
    """dedupe_spill_entries: whole-run dedupe (dedupe_ttl_us=None)
    with the seen-set's main run forced onto disk (tiny RAM bound →
    spills + compactions every flush) must commit byte-identical
    files to the all-in-RAM run, and leave spill runs on disk."""
    outs = []
    for spill in (None, 64):
        out = str(tmp_path / f"spill_{spill}")
        cfg = StreamConfig(window_size_us=10_000_000, partitions=4,
                           out_partitions=4, files_per_epoch=2,
                           dedupe_ttl_us=None,
                           dedupe_spill_entries=spill)
        m = run_stream(pages_small, cfg, out,
                       dim_versions=dim_versions_table())
        assert m["worker_metrics"]["dedupe_dropped"] > 0
        outs.append(out)

    ref_files = sorted(glob.glob(os.path.join(outs[0], "data", "**",
                                              "*.parquet"), recursive=True))
    got_files = sorted(glob.glob(os.path.join(outs[1], "data", "**",
                                              "*.parquet"), recursive=True))
    assert ref_files and len(ref_files) == len(got_files)
    for a, b in zip(ref_files, got_files):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), (a, b)
    runs = glob.glob(os.path.join(outs[1], "_state", "seen_spill",
                                  "part=*", "run*"))
    assert runs, "spill bound of 64 entries must force on-disk runs"


def test_spill_seen_set_semantics():
    """Unit drill of _SpillSeenSet across spill + compaction + gc +
    rebuild: membership must always equal a plain dict-of-firsts."""
    import tempfile

    from bento_ray.streaming.actors import _SpillSeenSet

    rng = np.random.RandomState(7)
    with tempfile.TemporaryDirectory() as d:
        s = _SpillSeenSet(d, mem_entries=128)
        truth: dict[int, int] = {}
        for step in range(30):
            q = rng.randint(0, 2000, size=200).astype(np.uint64)
            ts = np.full(len(q), step, np.int64)
            got = s.contains(q)
            want = np.array([int(x) in truth for x in q])
            assert (got == want).all(), step
            # add the absent ones (first occurrence of each in batch)
            absent = ~got
            firsts = pd.Series(np.arange(len(q))).groupby(
                q).min().to_numpy()
            mask = np.zeros(len(q), bool)
            mask[firsts] = True
            mask &= absent
            s.add(q[mask], ts[mask])
            for x in q[mask]:
                truth[int(x)] = step
        # TTL gc drops old entries even through disk runs
        s.gc(15)
        truth = {k: v for k, v in truth.items() if v >= 15}
        q = np.arange(0, 2000, dtype=np.uint64)
        got = s.contains(q)
        want = np.array([int(x) in truth for x in q])
        assert (got == want).all()
        assert len(s) == len(truth)


def test_sink_lineage_numeric_epoch_order(tmp_path):
    """lineage()/committed_files() must order epochs and partitions
    numerically — a lexicographic listdir sort interleaves epoch=10
    between epoch=1 and epoch=2 past ten epochs."""
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
    t = pa.table({"x": [1]})
    for e in range(12):
        for p in (0, 1, 10):
            sink.write_partition(e, p, t, lineage={"epoch": e})
        sink.finish_epoch(e)
    recs = sink.lineage()
    assert [r["lineage"]["epoch"] for r in recs] == \
        [e for e in range(12) for _ in range(3)]
    assert [r["partition"] for r in recs][:3] == [0, 1, 10]


def test_spill_resume_preserves_spill_backing(pages_small, tmp_path):
    """A crash+resume of a spill-configured run (dedupe_ttl_us=None +
    dedupe_spill_entries) must rebuild the DISK-BACKED seen-set, not
    silently fall back to the unbounded in-RAM set: the resumed run's
    output stays byte-identical to an uncrashed spill run and fresh
    spill runs exist on disk after the resume."""
    def _cfg(extra=None):
        return StreamConfig(window_size_us=10_000_000,
                            allowed_lateness_us=2_000_000,
                            partitions=4, out_partitions=4,
                            files_per_epoch=2, dedupe_ttl_us=None,
                            dedupe_spill_entries=64,
                            extra=extra or {})

    clean_out = str(tmp_path / "clean")
    run_stream(pages_small, _cfg(), clean_out,
               dim_versions=dim_versions_table())

    out = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected crash"):
        run_stream(pages_small, _cfg({"crash_after": (1, 2)}), out,
                   dim_versions=dim_versions_table())
    # stale run files from the crashed attempt exist at this point
    assert glob.glob(os.path.join(out, "_state", "seen_spill",
                                  "part=*", "run*"))
    m = run_stream(pages_small, _cfg(), out,
                   dim_versions=dim_versions_table(), resume=True)
    assert m["start_epoch"] == 1
    pd.testing.assert_frame_equal(_read_sink(out), _read_sink(clean_out))
    # the resumed workers re-spilled: the escape hatch survived resume
    assert glob.glob(os.path.join(out, "_state", "seen_spill",
                                  "part=*", "run*"))


def test_crash_after_accepts_list_form(pages_small, tmp_path):
    """cfg.extra['crash_after'] deserialized from JSON arrives as a
    list — the injected crash must still fire."""
    cfg = StreamConfig(window_size_us=10_000_000,
                       allowed_lateness_us=2_000_000,
                       partitions=4, out_partitions=4,
                       files_per_epoch=2,
                       extra={"crash_after": [1, 2]})
    with pytest.raises(RuntimeError, match="injected crash"):
        run_stream(pages_small, cfg, str(tmp_path / "o"),
                   dim_versions=dim_versions_table())


def test_spill_gc_filters_runs_independently(tmp_path):
    """TTL gc over a spilled set must touch each disk run on its own
    (bounded peak RAM) — runs whose entries all survive keep their
    original memmaps instead of being concatenated and rewritten."""
    from bento_ray.streaming.actors import _SpillSeenSet

    s = _SpillSeenSet(str(tmp_path / "sp"), mem_entries=4)
    # three spills with disjoint keys at increasing timestamps
    s.add(np.arange(0, 8, dtype=np.uint64), np.full(8, 10, np.int64))
    s.add(np.arange(100, 108, dtype=np.uint64), np.full(8, 20, np.int64))
    s.add(np.arange(200, 208, dtype=np.uint64), np.full(8, 30, np.int64))
    assert len(s._runs) >= 2
    survivors = [r for r in s._runs
                 if np.asarray(r[1]).min() >= 15]
    before_ids = {id(r[0]) for r in survivors}
    s.gc(15)                       # expires only the ts=10 run
    after_ids = {id(r[0]) for r in s._runs}
    assert before_ids <= after_ids  # untouched runs kept their memmaps
    q = np.arange(0, 300, dtype=np.uint64)
    got = s.contains(q)
    want = np.isin(q, np.concatenate([np.arange(100, 108),
                                      np.arange(200, 208)]))
    assert (got == want).all()
    assert len(s) == 16


def test_empty_epoch_schema_matches_data_epochs():
    """An epoch that closes zero panes must write the SAME parquet
    schema as data-bearing epochs for every dim column type."""
    from bento_ray.streaming.engine import _combine_and_enrich

    dim = pa.table({
        "lang": pa.array(["en"]),
        "update_ts": pa.array([0], pa.int64()),
        "version": pa.array([1], pa.int64()),
        "score": pa.array([7], pa.int64()),
        "label": pa.array(["x"]),
    })
    empty = _combine_and_enrich([], dim, 10_000_000)
    partial = pa.table({
        "window_end": pa.array([10_000_000], pa.int64()),
        "lang": pa.array(["en"]),
        "pages": pa.array([1], pa.int64()),
        "nbytes": pa.array([3], pa.int64()),
    })
    full = _combine_and_enrich([partial], dim, 10_000_000)
    se = pa.Table.from_pandas(empty, preserve_index=False).schema
    sf = pa.Table.from_pandas(full, preserve_index=False).schema
    for name in se.names:
        assert se.field(name).type == sf.field(name).type, name


def test_ingest_epoch_fence_defers_early_chunks():
    """A chunk tagged with epoch e+1 that reaches the worker BEFORE
    epoch e's flush (possible: feeds and flush come from different
    callers) must not enter epoch e's panes — it applies after that
    flush, exactly as if it had arrived in order."""
    import ray as _ray

    from bento_ray.streaming.actors import PartitionWorker

    w = PartitionWorker.remote(0, 10_000_000, None, 0, None)
    ts0 = np.array([1_000_000], np.int64)
    ts1 = np.array([22_000_000], np.int64)  # next window
    mk = lambda: (np.array([0], np.int16), ["en"],
                  np.array([10], np.int64))
    c0, v0, n0 = mk()
    _ray.get(w.ingest.remote(ts0, np.array([1], np.uint64), c0, v0,
                             n0, 0))
    # epoch-1 chunk arrives early, before flush(epoch 0) runs
    c1, v1, n1 = mk()
    _ray.get(w.ingest.remote(ts1, np.array([2], np.uint64), c1, v1,
                             n1, 1))
    out0 = _ray.get(w.flush.remote(20_000_001))
    assert out0.column("pages").to_pylist() == [1]   # deferred row absent
    out1 = _ray.get(w.flush.remote(40_000_001))
    assert out1.column("pages").to_pylist() == [1]   # now it lands
    _ray.kill(w)


def test_switch_table_fallthrough_length_mismatch():
    from bento_ray.stages.compose import switch_table

    t = pa.table({"x": [1, 2, 3]})
    with pytest.raises(ValueError, match="fallthrough"):
        switch_table(t, cases=[(None, None), (None, None)],
                     fallthrough=[True])
