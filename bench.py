"""Benchmark harness.

Headline: the flagship streaming pipeline (strip_html extraction →
hash-partitioned dedupe → tumbling event-time windows → per-lang
aggregate → versioned enrichment join → exactly-once parquet sink) over
a deterministic synthetic Common-Crawl-style pages corpus sized to the
scale factor. Also times a representative set of queries() over
$GRAFT_SF_DIR.

Sampling protocol (VERDICT r3 item 1): this box shows 1.4-4×
adjacent-run swings from host-level co-tenant interference
(BASELINE.md), so every measurement is an ISOLATED best-of-k —
sequential repeats with the warm-read protocol, best reported as the
capability number and the full sample list alongside so the spread is
visible in the recorded artifact. Repeats stop when the
$BENTO_BENCH_BUDGET_SEC budget (default 900s) runs out; the first
sample of each measurement always runs. The headline additionally
extends past REPEATS (up to 2×) while consecutive samples still
improve >10% — interference decays over tens of seconds, and a
best-of-k that is still falling hasn't reached the capability band.

Prints ONE JSON line:
  {"metric": ..., "value": <best headline sec>, "unit": "sec",
   "samples": [...], "queries": {name: best sec},
   "query_samples": {name: [...]}, "sf": ..., "num_cpus": N,
   "pages": N, "pages_per_sec": <best>}

--scaling: runs the headline twice in fresh processes (num_cpus=8 then
32) on the same input and reports both throughputs + efficiency.

--scaling-stream: the same two-parallelism protocol applied to a LIVE
stateful stream driver (run_interval_join_stream — two-input min
watermark, span-bounded per-key state, exactly-once sink) over a
deterministic synthetic two-sided event corpus
(testgen/events.ensure_event_streams). BENTO_BENCH_MODE=stream runs
that measurement standalone in one process.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("BENTO_BENCH_PAGES", "8000000"))
BUDGET_SEC = float(os.environ.get("BENTO_BENCH_BUDGET_SEC", "900"))
REPEATS = int(os.environ.get("BENTO_BENCH_REPEATS", "3"))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q_window_tumbling",
    "q_window_session",
    "q_dedupe_first_event",
    "q_priority_revenue",
    "q_doc_stats",
    "q_minhash_near_dups",
    "q_dup_ngram_stats",
    "q_tfidf_top_terms",
    "q_ann_topk",
    "q_salted_hot_key_agg",
    "q_nation_revenue",
    "q_bloblang_revenue",
    "q_json_extract",
    # round-4 session-3 operators
    "q_interval_join",
    "q_asof_join",
    "q_cep_followed_by",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


class _Budget:
    """Global wall-clock budget for repeat samples: the FIRST sample
    of every measurement always runs (coverage beats precision); a
    repeat runs only if its predicted cost (the measurement's last
    sample) still fits."""

    def __init__(self, total_sec: float):
        self.t0 = time.perf_counter()
        self.total = total_sec

    def allows_repeat(self, predicted_sec: float) -> bool:
        used = time.perf_counter() - self.t0
        return used + predicted_sec <= self.total


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from bento_ray.pipelines.flagship import flagship_streaming
    from bento_ray.testgen import ensure_pages_dataset

    budget = _Budget(BUDGET_SEC)

    # corpus generation is cached and untimed; one untimed read warms
    # the page cache so the timed run measures compute + shuffle
    # file grain ≈ 4k pages (~0.35s of extraction work per feed task —
    # small enough that the straggler tail at each epoch barrier is
    # cheap); epoch = files/4 so every epoch exposes ≫ CPUs of task
    # parallelism and barrier costs amortize over few epochs
    n_files = max(8, min(1024, N_PAGES // 4000))
    pages = ensure_pages_dataset(N_PAGES, seed=42, files=n_files)
    import glob as _glob

    def _warm_read():
        # Warm the OS page cache by READING THE BYTES: a parquet
        # count() only touches footers, and each fresh Ray session's
        # object-store allocation evicts the corpus from the page
        # cache — a timed run against cold files is disk-bound
        # (measured: three consecutive 32-CPU runs pinned at ~178k
        # pages/sec ≈ 16 GB / 45 s of disk, vs 342-421k warm).
        for f in sorted(_glob.glob(os.path.join(pages, "*.parquet"))):
            with open(f, "rb") as fh:
                while fh.read(1 << 24):
                    pass

    _warm_read()

    # small untimed warm-up run: spins up the task worker pool
    # (imports) and OS caches so the timed runs measure the engine at
    # steady state, matching the north metric (a long-running
    # streaming job, not process cold-start)
    # the warm-up must expose MORE concurrent tasks than the feed
    # wave window (cluster_cpus - 3) or the first timed epoch still
    # pays ~215 ms/process spin-up for the unwarmed pool slots —
    # measured +1.1 s on epoch 0 at width 32, i.e. a fixed cost that
    # lands on the short (wide) side and biases the scaling pair down
    warm_files = max(64, 4 * NUM_CPUS)
    warm_pages = ensure_pages_dataset(100_000, seed=42, files=warm_files)
    warm_out = f"/tmp/bento_bench_warm_{NUM_CPUS}"
    shutil.rmtree(warm_out, ignore_errors=True)
    flagship_streaming(warm_pages, warm_out,
                       partitions=max(2, NUM_CPUS // 4),
                       files_per_epoch=warm_files,
                       window_size_us=60_000_000)

    actual_files = len(_glob.glob(os.path.join(pages, "*.parquet")))

    def _one_flagship() -> tuple[float, dict]:
        out_dir = f"/tmp/bento_bench_out_{NUM_CPUS}"
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        # 60s windows at bench scale: panes stay aggregate-sized (the
        # 10s fixture windows hold ~100 rows; at 2M pages they'd make
        # the pane partials bigger than the useful compute).
        # partitions ∝ CPUs (the cluster-analog policy: 4× the nodes
        # run 4× the state partitions); CPU/4 keeps the actor pool
        # lean so feed tasks own the cores
        m = flagship_streaming(
            pages, out_dir,
            partitions=max(2, NUM_CPUS // 4),
            files_per_epoch=max(8, -(-actual_files // 4)),  # 4 epochs
            window_size_us=60_000_000,
        )
        return time.perf_counter() - t0, m

    # Adaptive repeats for the headline: co-tenant interference decays
    # over tens of seconds, so when consecutive samples are still
    # improving >10% the measurement hasn't reached the capability
    # band yet — keep sampling (budget-bounded, hard cap 2×REPEATS)
    # instead of recording a known-degraded best-of-k.
    samples: list[float] = []
    rows_fed = 0
    i = 0
    while i < 2 * REPEATS:
        if i > 0 and not budget.allows_repeat(samples[-1]):
            break
        if i >= REPEATS and len(samples) >= 2 and \
                min(samples[:-1]) * 0.9 < samples[-1]:
            break  # converged: last sample no longer 10% under prior best
        if i > 0:
            _warm_read()  # the repeat must not pay another run's evictions
        sec, metrics = _one_flagship()
        samples.append(round(sec, 3))
        rows_fed = metrics["rows_fed"]
        i += 1
    headline = min(samples)
    pages_per_sec = rows_fed / headline

    qtimes: dict[str, float] = {}
    qsamples: dict[str, list[float]] = {}
    if not os.environ.get("BENTO_BENCH_SKIP_QUERIES"):
        from bento_ray.pipelines.queries import QUERIES

        for name in BENCH_QUERIES:
            fn, _ = QUERIES[name]
            runs: list[float] = []
            for i in range(REPEATS):
                if i > 0 and not budget.allows_repeat(runs[-1]):
                    break
                t0 = time.perf_counter()
                res = fn(SF_DIR)
                # consume the result (small outputs — aggregates/top-k)
                if hasattr(res, "to_pandas"):
                    res.to_pandas()
                runs.append(round(time.perf_counter() - t0, 3))
            qsamples[name] = runs
            qtimes[name] = min(runs)

    # LIVE stream-twin timing (VERDICT r4 item 1): one best-of-2 of
    # the url-keyed streaming interval join so the driver's BENCH
    # artifact carries the stateful stream driver's wall time, not
    # just the flagship's
    stream_info: dict = {}
    if not os.environ.get("BENTO_BENCH_SKIP_QUERIES"):
        from bento_ray.streaming.engine import run_interval_join_stream
        from bento_ray.testgen.events import ensure_url_event_streams

        n_ev = N_EVENTS // 2
        sfiles = max(16, min(256, n_ev // 15_000))
        sl, sr = ensure_url_event_streams(n_ev, seed=42, files=sfiles)
        sruns: list[float] = []
        spairs = srows = 0
        for i in range(2):
            if i > 0 and not budget.allows_repeat(sruns[-1]):
                break
            sout = f"/tmp/bento_bench_ij_{NUM_CPUS}"
            shutil.rmtree(sout, ignore_errors=True)
            t0 = time.perf_counter()
            sm = run_interval_join_stream(
                sl, sr, sout, key_col="url", url_key=True,
                lower_us=0, upper_us=60_000_000,
                partitions=STREAM_PARTITIONS,
                files_per_epoch=max(4, -(-sfiles // 4)))
            sruns.append(round(time.perf_counter() - t0, 3))
            srows = sm["rows_fed"]
            spairs = sm["worker_metrics"]["pairs_emitted"]
        stream_info = {
            "stream_interval_join_sec": min(sruns),
            "stream_interval_join_samples": sruns,
            "stream_events": srows, "stream_pairs": spairs,
            "stream_events_per_sec": round(srows / min(sruns), 1),
        }

    ray.shutdown()
    return {
        "metric": "flagship streaming pipeline (windowed group_by+dedupe+join, "
                  "exactly-once sink) wall time",
        **stream_info,
        "value": headline,
        "unit": "sec",
        "samples": samples,
        "queries": qtimes,
        "query_samples": qsamples,
        "sf": _sf_from_dir(SF_DIR),
        "num_cpus": NUM_CPUS,
        "pages": N_PAGES,
        "pages_per_sec": round(pages_per_sec, 1),
    }


N_EVENTS = int(os.environ.get("BENTO_BENCH_EVENTS", "8000000"))

# partitions are a JOB parameter (the Kafka-partition analogue), held
# FIXED across cluster widths — scaling them with CPUs compared two
# different jobs and let the low width skip most of the per-partition
# work
STREAM_PARTITIONS = int(os.environ.get("BENTO_BENCH_STREAM_PARTS", "16"))


def run_stream_bench() -> dict:
    """Best-of-k wall time for the LIVE streaming interval join — the
    click→conversion-by-landing-page attribution job: two event
    streams keyed by MESSY urls that each feed task canonicalizes
    (textops.urlops) before hash-partitioning, joined within a 60s
    span by the stateful IntervalJoinWorker pool under a two-input
    watermark, committed through the exactly-once sink. Isolated
    best-of-k with warm reads, same protocol as the flagship
    headline. Partitions are FIXED across widths (a job parameter)."""
    import glob as _glob

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from bento_ray.streaming.engine import run_interval_join_stream
    from bento_ray.testgen.events import ensure_url_event_streams

    budget = _Budget(BUDGET_SEC)
    n_files = max(16, min(256, N_EVENTS // 15_000))
    left, right = ensure_url_event_streams(N_EVENTS, seed=42,
                                           files=n_files)

    def _warm_read():
        for d in (left, right):
            for f in sorted(_glob.glob(os.path.join(d, "*.parquet"))):
                with open(f, "rb") as fh:
                    while fh.read(1 << 24):
                        pass

    _warm_read()
    # untimed warm-up: worker-pool imports + actor spin-up. Must
    # expose more concurrent tasks than the feed wave window
    # (cluster_cpus - 3), else the first timed epoch pays the
    # remaining worker-process spin-ups (~215 ms each; measured
    # +1.1 s on epoch 0 at width 32 with an 8-task warm-up) — a
    # fixed cost that biases the scaling pair against the wide side
    warm_files = max(64, 4 * NUM_CPUS)
    wl, wr = ensure_url_event_streams(100_000, seed=42,
                                      files=warm_files)
    warm_out = f"/tmp/bento_bench_stream_warm_{NUM_CPUS}"
    shutil.rmtree(warm_out, ignore_errors=True)
    run_interval_join_stream(wl, wr, warm_out, key_col="url",
                             url_key=True,
                             lower_us=0, upper_us=60_000_000,
                             partitions=STREAM_PARTITIONS,
                             files_per_epoch=warm_files)

    def _one() -> tuple[float, dict]:
        out = f"/tmp/bento_bench_stream_out_{NUM_CPUS}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        m = run_interval_join_stream(
            left, right, out, key_col="url", url_key=True,
            lower_us=0, upper_us=60_000_000,
            partitions=STREAM_PARTITIONS,
            files_per_epoch=max(4, -(-n_files // 4)))   # 4 epochs
        return time.perf_counter() - t0, m

    samples: list[float] = []
    rows = pairs = 0
    i = 0
    while i < 2 * REPEATS:
        if i > 0 and not budget.allows_repeat(samples[-1]):
            break
        if i >= REPEATS and len(samples) >= 2 and \
                min(samples[:-1]) * 0.9 < samples[-1]:
            break
        if i > 0:
            _warm_read()
        sec, m = _one()
        samples.append(round(sec, 3))
        rows = m["rows_fed"]
        pairs = m["worker_metrics"]["pairs_emitted"]
        i += 1
    best = min(samples)
    ray.shutdown()
    return {
        "metric": "streaming interval join, click→conversion by "
                  "canonical landing page (url canonicalization in "
                  "feed, two-input watermark, exactly-once sink) "
                  "wall time",
        "value": best, "unit": "sec", "samples": samples,
        "events": rows, "pairs": pairs,
        "events_per_sec": round(rows / best, 1),
        "num_cpus": NUM_CPUS,
    }


def run_scaling() -> dict:
    # BENTO_SCALING_CPUS="4,16" overrides the widths — used for the
    # width-contention control experiment (BASELINE.md): the same 4×
    # ratio placed below a co-tenant-capped top width
    lo_cpu, hi_cpu = (int(x) for x in os.environ.get(
        "BENTO_SCALING_CPUS", "8,32").split(","))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   BENTO_BENCH_SKIP_QUERIES="1",
                   BENTO_BENCH_BUDGET_SEC=os.environ.get(
                       "BENTO_BENCH_BUDGET_SEC", "300"))
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        result = json.loads(out.strip().splitlines()[-1])
        time.sleep(8)  # let the previous Ray instance's teardown settle
        return result

    lo, hi = run(lo_cpu), run(hi_cpu)
    tput_lo = lo["pages_per_sec"]
    tput_hi = hi["pages_per_sec"]
    eff = (tput_hi / tput_lo) / (hi_cpu / lo_cpu)
    return {
        "pages": lo["pages"],
        "cpus_lo": lo_cpu, "sec_lo": lo["value"],
        "pages_per_sec_lo": tput_lo,
        "cpus_hi": hi_cpu, "sec_hi": hi["value"],
        "pages_per_sec_hi": tput_hi,
        "samples_lo": lo.get("samples"), "samples_hi": hi.get("samples"),
        "scaling_efficiency": round(eff, 3),
    }


def run_scaling_stream() -> dict:
    lo_cpu, hi_cpu = (int(x) for x in os.environ.get(
        "BENTO_SCALING_CPUS", "8,32").split(","))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   BENTO_BENCH_MODE="stream",
                   BENTO_BENCH_BUDGET_SEC=os.environ.get(
                       "BENTO_BENCH_BUDGET_SEC", "300"))
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        result = json.loads(out.strip().splitlines()[-1])
        time.sleep(8)
        return result

    lo, hi = run(lo_cpu), run(hi_cpu)
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (hi_cpu / lo_cpu)
    return {
        "stream": "interval_join",
        "events": lo["events"],
        "cpus_lo": lo_cpu, "sec_lo": lo["value"],
        "events_per_sec_lo": lo["events_per_sec"],
        "cpus_hi": hi_cpu, "sec_hi": hi["value"],
        "events_per_sec_hi": hi["events_per_sec"],
        "samples_lo": lo.get("samples"), "samples_hi": hi.get("samples"),
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling-stream" in sys.argv:
        print(json.dumps(run_scaling_stream()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif os.environ.get("BENTO_BENCH_MODE") == "stream":
        print(json.dumps(run_stream_bench()))
    else:
        print(json.dumps(run_bench()))
