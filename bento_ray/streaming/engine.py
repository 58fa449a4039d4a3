"""Micro-batch streaming runner: epochs, watermarks, exactly-once commit.

Topology (SURVEY.md §7.0, Ray-Data-first):

    read_parquet(epoch files, pruned columns)
      → map_batches(Feeder)            # stateless tasks: strip_html
                                       # extraction + hash partition on
                                       # url, push compact columns to
                                       # the P PartitionWorker actors
      → tiny per-batch summaries       # the Dataset output is metadata
    flush(watermark) on each worker    # panes close deterministically
      → driver combines P small pane-partial tables (two-phase agg)
      → last-write-wins versioned join against the lang enrichment table
      → ExactlyOnceParquetSink.write_partition per output partition

The wall clock never drives emission: the watermark is
``max(warc_ts seen) − allowed_lateness``, so identical input + epoch
boundaries ⇒ identical output (the reference-parity requirement,
replacing buffer_system_window.go's system-clock flush).

Scale notes: the heavy ``html`` bytes live only inside feeder tasks —
state actors receive (ts, url-hash, lang, nbytes) ≈ 30 bytes/row. Pane
partials are per-partition pre-aggregates, so hot languages (Zipfian
skew) never serialize on one actor; the final combine handles
``P × panes × langs`` tiny rows. Input files are the unit of epoching
and of resume.
"""

from __future__ import annotations

import glob
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from bento_ray.html import strip_html_batch
from bento_ray.streaming.actors import PartitionWorker
from bento_ray.streaming.checkpoint import ExactlyOnceParquetSink
from bento_ray.util import rfc3339nano, stable_hash


@dataclass
class StreamConfig:
    window_size_us: int = 10_000_000
    slide_us: int | None = None
    offset_us: int = 0
    allowed_lateness_us: int = 2_000_000
    partitions: int = 8
    out_partitions: int = 8
    files_per_epoch: int = 2
    dedupe_ttl_us: int | None = None        # None = dedupe for the whole run
    feeder_batch_size: int = 8192
    extra: dict = field(default_factory=dict)


class Feeder:
    """Stateless extraction + partition + push stage. Per-batch output
    is a one-row summary (rows, max_ts) used by the driver for the
    watermark."""

    def __init__(self, workers: list, partitions: int):
        self.workers = workers
        self.partitions = partitions

    def __call__(self, t: pa.Table) -> pa.Table:
        # html → text extraction (byte-identical invariant stage)
        texts = strip_html_batch(t.column("html").to_pylist())
        nbytes = np.array([len(x.encode("utf-8")) if x is not None else 0
                           for x in texts], np.int64)
        ts = t.column("warc_ts").cast(pa.int64()).to_numpy()
        urlh = stable_hash(t.column("url")).astype(np.uint64)
        lang = np.asarray(t.column("lang").to_pylist(), dtype=object)
        part = (urlh % np.uint64(self.partitions)).astype(np.int64)

        refs = []
        for p in range(self.partitions):
            m = part == p
            if m.any():
                refs.append(self.workers[p].ingest.remote(
                    ts[m], urlh[m], lang[m], nbytes[m]))
        ray.get(refs)  # backpressure: batch is done when state accepted
        mx = int(ts.max()) if len(ts) else -(1 << 62)
        return pa.table({"rows": pa.array([len(t)], pa.int64()),
                         "max_ts": pa.array([mx], pa.int64())})


@ray.remote
def _feed_file(path: str, workers: list, partitions: int,
               batch_rows: int) -> tuple[int, int]:
    """One raw task per input file: read (pruned columns) → extract →
    partition → push to the state actors. Raw tasks instead of a
    per-epoch Dataset job: the micro-batch epoch barrier made each
    epoch pay ~2s of streaming-executor startup, which dominated wall
    time; a task per file keeps the same parallelism (files ∝ input
    size) with ~none of the fixed cost. Returns (rows, max_ts)."""
    import pyarrow.parquet as pq

    feeder = Feeder(workers, partitions)
    rows, max_ts = 0, -(1 << 62)
    pf = pq.ParquetFile(path)
    for rb in pf.iter_batches(batch_size=batch_rows,
                              columns=["url", "warc_ts", "html", "lang"]):
        s = feeder(pa.Table.from_batches([rb]))
        rows += s.column("rows")[0].as_py()
        max_ts = max(max_ts, s.column("max_ts")[0].as_py())
    return rows, max_ts


def _combine_and_enrich(partials: list[pa.Table], dim_versions: pa.Table | None,
                        window_size_us: int) -> pd.DataFrame:
    """Final phase of the two-phase aggregate + stream-table join."""
    dfs = [p.to_pandas() for p in partials if p.num_rows]
    if not dfs:
        empty = pd.DataFrame({
            "window_end": np.array([], np.int64),
            "lang": pd.Series([], dtype="string"),
            "pages": np.array([], np.int64),
            "nbytes": np.array([], np.int64),
        })
        if dim_versions is not None:
            for c in dim_versions.column_names:
                if c not in ("lang", "update_ts"):
                    empty[c] = pd.Series(
                        [], dtype="int64" if c == "version" else "string")
        empty["window_end_timestamp"] = pd.Series([], dtype="string")
        return empty
    df = pd.concat(dfs, ignore_index=True)
    out = (df.groupby(["window_end", "lang"], sort=True)
             .agg(pages=("pages", "sum"), nbytes=("nbytes", "sum"))
             .reset_index())
    if dim_versions is not None:
        dim = dim_versions.to_pandas()
        # last-write-wins: newest version with update_ts ≤ window_end
        dim = dim.sort_values("update_ts", kind="stable")
        out = out.sort_values("window_end", kind="stable")
        out = pd.merge_asof(out, dim, left_on="window_end", right_on="update_ts",
                            by="lang", direction="backward")
        out = out.drop(columns=[c for c in ("update_ts",) if c in out])
        out = out.sort_values(["window_end", "lang"], kind="stable")
    out["window_end_timestamp"] = [rfc3339nano(e) for e in out["window_end"]]
    return out.reset_index(drop=True)


def run_stream(input_path: str, cfg: StreamConfig, out_dir: str,
               dim_versions: pa.Table | None = None,
               resume: bool = True) -> dict:
    """Run the streaming pipeline over a directory of parquet files
    (files, in sorted order, are the epoch units). Returns run metrics;
    the committed output is at ``{out_dir}/data`` via the sink manifest.
    """
    files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    epochs = [files[i:i + cfg.files_per_epoch]
              for i in range(0, len(files), cfg.files_per_epoch)]

    sink = ExactlyOnceParquetSink(out_dir)
    state_dir = os.path.join(out_dir, "_state")
    os.makedirs(state_dir, exist_ok=True)

    workers = [
        PartitionWorker.options(num_cpus=0.25).remote(
            p, cfg.window_size_us, cfg.slide_us, cfg.offset_us,
            cfg.dedupe_ttl_us)
        for p in range(cfg.partitions)
    ]

    start_epoch = 0
    replayed_partitions = 0
    skipped_partitions = 0
    if resume:
        last_done = sink.last_done_epoch()
        if last_done >= 0:
            snap_dir = os.path.join(state_dir, f"epoch={last_done}")
            blobs = []
            for p in range(cfg.partitions):
                with open(os.path.join(snap_dir, f"part={p}.pkl"), "rb") as fh:
                    blobs.append(fh.read())
            ray.get([w.restore.remote(b) for w, b in zip(workers, blobs)])
            start_epoch = last_done + 1

    t0 = time.perf_counter()
    rows_total = 0
    global_max_ts = -(1 << 62)

    for e in range(start_epoch, len(epochs)):
        summary = ray.get([
            _feed_file.remote(f, workers, cfg.partitions,
                              cfg.feeder_batch_size)
            for f in epochs[e]
        ])
        rows_total += sum(r for r, _ in summary)
        if summary:
            global_max_ts = max(global_max_ts,
                                max(mt for _, mt in summary))

        final = e == len(epochs) - 1
        if final:
            # bounded input: close every pane
            watermark = global_max_ts + cfg.window_size_us + cfg.allowed_lateness_us
        else:
            watermark = global_max_ts - cfg.allowed_lateness_us

        partials = ray.get([w.flush.remote(watermark) for w in workers])
        out = _combine_and_enrich(partials, dim_versions, cfg.window_size_us)

        # per-output-partition exactly-once commit (partition by pane key
        # hash so every epoch writes the same partition layout)
        if len(out):
            h = pd.util.hash_pandas_object(
                out[["window_end", "lang"]], index=False).to_numpy()
            op = (h % np.uint64(cfg.out_partitions)).astype(np.int64)
        else:
            op = np.zeros(0, np.int64)
        lineage = {"input_files": epochs[e], "watermark": int(watermark),
                   "epoch": e}
        for p in range(cfg.out_partitions):
            sub = out[op == p]
            tbl = pa.Table.from_pandas(sub, preserve_index=False)
            tbl = _finalize_schema(tbl)
            wrote = sink.write_partition(e, p, tbl, lineage=lineage)
            if wrote:
                replayed_partitions += 1
            else:
                skipped_partitions += 1
            # test hook: simulated crash mid-epoch, after some partitions
            # committed but before the epoch's snapshot + _EPOCH_DONE
            if cfg.extra.get("crash_after") == (e, p):
                raise RuntimeError(f"injected crash after epoch={e} part={p}")

        # snapshot state AFTER commits so resume replays an epoch whose
        # outputs may be partially committed (idempotent skips)
        snap_dir = os.path.join(state_dir, f"epoch={e}")
        os.makedirs(snap_dir, exist_ok=True)
        blobs = ray.get([w.snapshot.remote() for w in workers])
        for p, b in enumerate(blobs):
            tmp = os.path.join(snap_dir, f"part={p}.pkl.tmp")
            with open(tmp, "wb") as fh:
                fh.write(b)
            os.replace(tmp, os.path.join(snap_dir, f"part={p}.pkl"))
        sink.finish_epoch(e, {"watermark": int(watermark),
                              "max_ts": int(global_max_ts)})

    elapsed = time.perf_counter() - t0
    metrics = ray.get([w.get_metrics.remote() for w in workers])
    agg = {k: sum(m[k] for m in metrics) for k in metrics[0]} if metrics else {}
    # release actor resources — state is checkpointed on disk; a later
    # resume builds fresh workers from the snapshots
    for w in workers:
        ray.kill(w)
    return {
        "epochs": len(epochs),
        "start_epoch": start_epoch,
        "rows_fed": rows_total,
        "elapsed_sec": elapsed,
        "partitions_written": replayed_partitions,
        "partitions_skipped": skipped_partitions,
        "worker_metrics": agg,
        "out_dir": out_dir,
    }


def _finalize_schema(t: pa.Table) -> pa.Table:
    """Stable output schema: window_end as UTC timestamp."""
    if "window_end" in t.column_names and pa.types.is_integer(
            t.schema.field("window_end").type):
        i = t.column_names.index("window_end")
        t = t.set_column(i, "window_end",
                         t.column("window_end").cast(pa.timestamp("us", tz="UTC")))
    return t
