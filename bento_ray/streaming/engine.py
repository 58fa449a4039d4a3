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
import pyarrow as pa

import ray

from bento_ray.html import strip_html_batch
from bento_ray.streaming.actors import PartitionWorker
from bento_ray.streaming.actors import _atomic_write as _atomic_write_bytes
from bento_ray.streaming.checkpoint import ExactlyOnceParquetSink
from bento_ray.util import rfc3339nano, stable_hash


# Sentinel: derive a bounded dedupe TTL from the window arithmetic.
DEDUPE_TTL_AUTO = -1

# Auto TTL = this factor × (window + lateness). At the default 10s
# window + 2s lateness that is ~3.4h of event time — far beyond any
# re-crawl horizon a windowed aggregate cares about, while bounding
# per-partition seen-set memory to arrival-rate × TTL × 16 B instead
# of the full distinct-key set (~16 TB fleet-wide at 10^12 urls).
DEDUPE_TTL_FACTOR = 1024


@dataclass
class StreamConfig:
    window_size_us: int = 10_000_000
    slide_us: int | None = None
    offset_us: int = 0
    allowed_lateness_us: int = 2_000_000
    partitions: int = 8
    out_partitions: int = 8
    files_per_epoch: int = 2
    # Dedupe state horizon. Default AUTO = bounded
    # (DEDUPE_TTL_FACTOR × (window + lateness)); pass an explicit
    # microsecond TTL to tune, or an explicit None to opt IN to
    # whole-run dedupe (unbounded state — at CC scale budget
    # ~16 B × distinct urls per partition fleet-wide).
    dedupe_ttl_us: int | None = DEDUPE_TTL_AUTO
    feeder_batch_size: int = 8192
    # True = bounded input, final epoch closes every pane (end of
    # stream). False = PAUSE: the final flush keeps the normal
    # watermark, so appending files and re-running (snapshot resume)
    # is byte-identical to one continuous run.
    drain: bool = True
    # Distributed final combine: fan the epoch finalize out to one
    # reducer task per OUTPUT partition (each combines only its
    # (window_end, lang) hash bucket — a hash-partitioned groupby
    # exchange), instead of one task combining all pane partials.
    # Byte-identical output (the bucket hash is a function of the
    # group key, so bucketing commutes with the aggregate); turn on
    # when windows × langs × state-partitions makes the single
    # combine task the epoch's long pole (second-level windows at CC
    # scale). Off by default: at minute-level windows the partials
    # are metadata-scale and the reducer fan-out costs more than it
    # saves.
    distributed_finalize: bool = False
    # Spillable dedupe state: per-partition RAM bound (entries) on the
    # seen-set's main run — beyond it the sorted run spills to an
    # immutable memmap file under the run's state dir and membership
    # probes binary-search it from disk. The escape hatch for
    # ``dedupe_ttl_us=None`` whole-run dedupe, whose distinct-key set
    # is otherwise unbounded RAM (~16 B/key/partition). None = all in
    # RAM. Dedupe decisions (and committed bytes) are identical either
    # way — pytest-pinned.
    dedupe_spill_entries: int | None = None
    extra: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.slide_us and self.window_size_us % self.slide_us:
            raise ValueError(
                "sliding window size must be a multiple of slide "
                f"({self.window_size_us} % {self.slide_us} != 0)")
        if self.dedupe_ttl_us == DEDUPE_TTL_AUTO:
            self.dedupe_ttl_us = DEDUPE_TTL_FACTOR * (
                self.window_size_us + self.allowed_lateness_us)


class Feeder:
    """Stateless extraction + partition + push stage.

    Cost discipline for the actor handoff (each ingest call costs
    serialization + a serial slot on a near-zero-CPU actor):
    - accumulate per-partition chunks across the whole file and push
      ONCE per (file, partition), not per read batch;
    - dictionary-encode ``lang`` (int8 codes + tiny vocab) so no Python
      object arrays cross the wire;
    - pushes are fire-and-forget (the driver barriers on the workers'
      chunk counters, not on these refs);
    - every ingest is tagged with its epoch so a chunk that outruns
      the previous epoch's in-flight flush message (feeds and flush
      come from different callers — Ray orders actor calls per
      caller only) is deferred inside the worker, keeping each
      epoch's pane contents deterministic."""

    def __init__(self, workers: list, partitions: int, epoch: int = -1):
        self.workers = workers
        self.partitions = partitions
        self.epoch = epoch
        self._acc: list[list] = [[] for _ in range(partitions)]

    def __call__(self, t: pa.Table) -> pa.Table:
        # html → text extraction (byte-identical invariant stage)
        texts = strip_html_batch(t.column("html").to_pylist())
        # utf-8 byte length from Arrow string offsets — re-encoding
        # every text (`len(x.encode())`) copied the whole corpus again
        arr = pa.array(texts, pa.string())
        offs = arr.buffers()[1]
        nbytes = np.diff(np.frombuffer(offs, np.int32,
                                       count=len(arr) + 1)).astype(np.int64)
        ts_col = t.column("warc_ts")
        if pa.types.is_timestamp(ts_col.type) and ts_col.type.unit != "us":
            ts_col = ts_col.cast(pa.timestamp("us", tz=ts_col.type.tz))
        ts = ts_col.cast(pa.int64()).to_numpy()
        urlh = stable_hash(t.column("url")).astype(np.uint64)
        lang_dict = t.column("lang").combine_chunks().dictionary_encode()
        # int16: Common-Crawl-scale corpora exceed 127 distinct
        # language codes; int8 would wrap silently (negative codes
        # fancy-index from the END of the vocab — wrong language)
        codes = np.asarray(lang_dict.indices.to_numpy(
            zero_copy_only=False), np.int16)
        vocab = lang_dict.dictionary.to_pylist()
        part = (urlh % np.uint64(self.partitions)).astype(np.int64)

        for p in range(self.partitions):
            m = part == p
            if m.any():
                self._acc[p].append((ts[m], urlh[m], codes[m], vocab,
                                     nbytes[m]))
        mx = int(ts.max()) if len(ts) else -(1 << 62)
        return pa.table({"rows": pa.array([len(t)], pa.int64()),
                         "max_ts": pa.array([mx], pa.int64())})

    def push(self) -> list[int]:
        """One ingest call per partition for everything accumulated.
        Returns chunks pushed per partition (the barrier accounting)."""
        pushed = [0] * self.partitions
        for p, chunks in enumerate(self._acc):
            if not chunks:
                continue
            pushed[p] = 1
            ts = np.concatenate([c[0] for c in chunks])
            urlh = np.concatenate([c[1] for c in chunks])
            nbytes = np.concatenate([c[4] for c in chunks])
            # merge per-chunk vocabs into one
            vocab: list[str] = []
            vidx: dict[str, int] = {}
            code_parts = []
            for c_ts, _, codes, cvocab, _ in chunks:
                remap = np.empty(len(cvocab), np.int16)
                for i, v in enumerate(cvocab):
                    if v not in vidx:
                        vidx[v] = len(vocab)
                        vocab.append(v)
                    remap[i] = vidx[v]
                code_parts.append(remap[codes])
            codes = np.concatenate(code_parts)
            self.workers[p].ingest.remote(
                ts, urlh, codes, vocab, nbytes, self.epoch)
        self._acc = [[] for _ in range(self.partitions)]
        return pushed


def _await_chunk_counters(workers, expected, base, timeout_sec: float = 120.0):
    """Epoch barrier: poll each worker until it has accepted all chunks
    pushed this epoch (feed tasks push fire-and-forget and free their
    CPU slot as soon as extraction finishes)."""
    deadline = time.monotonic() + timeout_sec
    while True:
        got = ray.get([w.get_chunks_received.remote() for w in workers])
        if all(g >= base[p] + expected[p] for p, g in enumerate(got)):
            return
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"epoch barrier: chunks received {got} < expected "
                f"{[b + x for b, x in zip(base, expected)]}")
        time.sleep(0.01)



def _ts_us_int64(col: "pa.ChunkedArray") -> np.ndarray:
    """Event-time column → int64 MICROSECONDS regardless of the
    parquet timestamp unit (s/ms/us/ns all appear in the wild; a raw
    int64 cast of a ns column would silently scale every watermark,
    window and join bound by 1000)."""
    if pa.types.is_timestamp(col.type) and col.type.unit != "us":
        col = col.cast(pa.timestamp("us", tz=col.type.tz))
    return col.cast(pa.int64()).to_numpy()


def _resume_chunks(files: list[str], files_per_epoch: int, sink,
                   last_done: int, key: str = "input_files") -> list[list[str]]:
    """Epoch chunking for an append-resume run.

    Re-chunking the GROWN file listing from scratch misassigns
    appended files into already-committed epoch indices whenever the
    paused run's file count was not a multiple of files_per_epoch —
    start_epoch = last_done + 1 would then silently never feed them
    (data loss). Instead, reconstruct epochs 0..last_done from the
    sink's recorded lineage (authoritative: those files ARE consumed)
    and chunk only the not-yet-consumed files into the epochs after
    last_done. Fails fast if a lineage-recorded file is missing from
    the current listing (the input directory was mutated, not just
    appended to — silent refeeding would duplicate data)."""
    committed: list[list[str]] = []
    seen: set[str] = set()
    for e in range(last_done + 1):
        lin = sink.epoch_lineage(e).get(key, [])
        committed.append(list(lin))
        seen.update(lin)
    # a crash MID-epoch leaves epoch last_done+1 with partition
    # commits but no done-marker; its composition is already pinned
    # by those commits (write_partition will skip them on the
    # re-feed), so it too must be reconstructed from lineage — naive
    # re-chunking would pair the skipped partitions' old aggregates
    # with a different file set if an appended file sorts into it
    partial = sink.epoch_lineage(last_done + 1)
    if partial:  # keyed on the commit record, not the file list, so
        # the two sides of a two-stream resume stay epoch-aligned
        # even when one side had zero files in the crash epoch
        committed.append(list(partial.get(key, [])))
        seen.update(partial.get(key, []))
    missing = seen - set(files)
    if missing:
        raise ValueError(
            f"resume: {len(missing)} file(s) recorded in committed epoch "
            f"lineage are absent from the current input listing (e.g. "
            f"{sorted(missing)[:3]}); refusing to re-chunk — the input "
            f"directory must only be appended to between runs")
    remaining = [f for f in files if f not in seen]
    return committed + [remaining[i:i + files_per_epoch]
                        for i in range(0, len(remaining), files_per_epoch)]


def _submit_in_waves(submit, items, max_inflight: int | None = None) -> list:
    """Submit remote tasks with a bounded in-flight window. Submitting a
    whole epoch at once makes the raylet pre-start one worker process
    per backlogged task; the resulting import storm (dozens of fresh
    Python processes) saturates every core before any real work runs.
    A window ≈ CPU count keeps a small warm pool that gets reused."""
    if max_inflight is None:
        from bento_ray.util import cluster_cpus

        # leave headroom for the state actors + the (now fully
        # overlapped) epoch-finalize chain so they never queue
        # behind a full feed wave
        max_inflight = max(4, cluster_cpus() - 3)
    pending: list = []
    results: list = []
    for it in items:
        if len(pending) >= max_inflight:
            done, pending = ray.wait(pending, num_returns=1)
            results.extend(ray.get(done))
        pending.append(submit(it))
    results.extend(ray.get(pending))
    return results


@ray.remote
def _feed_file(path: str, workers: list, partitions: int,
               batch_rows: int, epoch: int = -1) -> tuple[int, int]:
    """One raw task per input file: read (pruned columns) → extract →
    partition → push to the state actors. Raw tasks instead of a
    per-epoch Dataset job: the micro-batch epoch barrier made each
    epoch pay ~2s of streaming-executor startup, which dominated wall
    time; a task per file keeps the same parallelism (files ∝ input
    size) with ~none of the fixed cost. Returns (rows, max_ts)."""
    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    feeder = Feeder(workers, partitions, epoch)
    rows, max_ts = 0, -(1 << 62)
    pf = pq.ParquetFile(path)
    for rb in pf.iter_batches(batch_size=batch_rows,
                              columns=["url", "warc_ts", "html", "lang"]):
        s = feeder(pa.Table.from_batches([rb]))
        rows += s.column("rows")[0].as_py()
        max_ts = max(max_ts, s.column("max_ts")[0].as_py())
    # fire-and-forget pushes: the worker slot frees as soon as compute
    # is done; the driver barriers on per-partition chunk counters
    pushed = feeder.push()
    return rows, max_ts, pushed, time.perf_counter() - t0


def _combine_and_enrich(partials: list[pa.Table], dim_versions: pa.Table | None,
                        window_size_us: int) -> "pd.DataFrame":
    """Final phase of the two-phase aggregate + stream-table join."""
    import pandas as pd

    dfs = [p.to_pandas() for p in partials if p.num_rows]
    if not dfs:
        empty = pd.DataFrame({
            "window_end": np.array([], np.int64),
            "lang": pd.Series([], dtype="string"),
            "pages": np.array([], np.int64),
            "nbytes": np.array([], np.int64),
        })
        if dim_versions is not None:
            # type each dim column from its Arrow schema (the same
            # int→Int64 / other→string mapping the non-empty path
            # produces) so zero-pane epochs write partition files with
            # the SAME parquet schema as data-bearing epochs
            for f in dim_versions.schema:
                if f.name not in ("lang", "update_ts"):
                    empty[f.name] = pd.Series(
                        [], dtype="Int64" if pa.types.is_integer(f.type)
                        else "string")
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
        int_dim_cols = [c for c in dim.columns
                        if c not in ("lang", "update_ts")
                        and pd.api.types.is_integer_dtype(dim[c])]
        out = pd.merge_asof(out, dim, left_on="window_end", right_on="update_ts",
                            by="lang", direction="backward")
        out = out.drop(columns=[c for c in ("update_ts",) if c in out])
        # merge_asof degrades unmatched int columns to float64 (NaN);
        # nullable Int64 keeps the parquet schema stable across epochs
        for c in int_dim_cols:
            out[c] = out[c].astype("Int64")
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

    sink = ExactlyOnceParquetSink(out_dir)
    state_dir = os.path.join(out_dir, "_state")
    os.makedirs(state_dir, exist_ok=True)

    last_done = sink.last_done_epoch() if resume else -1
    if last_done >= 0:
        # pause/append-resume: committed epochs come from lineage, the
        # rest re-chunks — see _resume_chunks for why naive re-chunking
        # of a grown listing loses appended files
        epochs = _resume_chunks(files, cfg.files_per_epoch, sink, last_done)
    else:
        epochs = [files[i:i + cfg.files_per_epoch]
                  for i in range(0, len(files), cfg.files_per_epoch)]

    # num_cpus=0.05: ingest/flush work is tiny (appends + one groupby per
    # epoch); reserving real CPU slices for the pool starves the feed
    # tasks that do the actual extraction compute
    workers = [
        PartitionWorker.options(num_cpus=0.05).remote(
            p, cfg.window_size_us, cfg.slide_us, cfg.offset_us,
            cfg.dedupe_ttl_us,
            spill_dir=os.path.join(state_dir, "seen_spill", f"part={p}"),
            spill_entries=cfg.dedupe_spill_entries)
        for p in range(cfg.partitions)
    ]

    start_epoch = 0
    replayed_partitions = 0
    skipped_partitions = 0
    if last_done >= 0:
        # snapshots are incremental — restore the chain 0..last_done
        chains: list[list[bytes]] = [[] for _ in range(cfg.partitions)]
        for e in range(last_done + 1):
            snap_dir = os.path.join(state_dir, f"epoch={e}")
            for p in range(cfg.partitions):
                with open(os.path.join(snap_dir, f"part={p}.pkl"), "rb") as fh:
                    chains[p].append(fh.read())
        ray.get([w.restore.remote(c) for w, c in zip(workers, chains)])
        start_epoch = last_done + 1

    t0 = time.perf_counter()
    rows_total = 0
    global_max_ts = -(1 << 62)
    if resume and start_epoch > 0:
        # Re-seed the watermark from restored worker state: without this
        # a replayed epoch's watermark derives only from replayed files,
        # and for non-monotone event times it can REGRESS below the
        # crashed run's, diverging partition content from already-
        # committed partitions (breaking exactly-once).
        global_max_ts = max(ray.get([w.get_max_ts.remote() for w in workers]))

    debug = bool(os.environ.get("BENTO_DEBUG_TIMING"))

    def _finalize(e: int, flush_refs: list, snap_refs: list,
                  watermark: int, lineage: dict) -> None:
        """Driver-side finalize — used only on the crash-injection test
        path (deterministic sequential commits)."""
        nonlocal replayed_partitions, skipped_partitions
        written, skipped = _finalize_epoch_body(
            e, ray.get(flush_refs), ray.get(snap_refs), watermark, lineage,
            dim_versions, cfg, out_dir, state_dir,
            crash_after=cfg.extra.get("crash_after"))
        replayed_partitions += written
        skipped_partitions += skipped

    # Epoch pipeline: after epoch e's flush+snapshot calls are SUBMITTED
    # (actor method order guarantees they see exactly epochs ≤ e), the
    # next epoch's feed starts immediately; e's finalize runs as ONE
    # off-driver Ray task in the shadow of that feed (running it on a
    # driver thread stalled the feed-submission loop with pandas GIL
    # bursts). Crash windows stay safe: an epoch is only _EPOCH_DONE
    # after its commits, and resume replays any epoch without the marker
    # (idempotent partition skips).
    fin_ref = None
    fin_refs: list = []
    _chunk_base = [0] * cfg.partitions

    for e in range(start_epoch, len(epochs)):
        te = time.perf_counter()
        summary = _submit_in_waves(
            lambda f, _e=e: _feed_file.remote(f, workers, cfg.partitions,
                                              cfg.feeder_batch_size, _e),
            epochs[e])
        # epoch barrier: every pushed chunk must be accepted by its
        # actor before the flush may run
        expected = [0] * cfg.partitions
        for x in summary:
            for p, n in enumerate(x[2]):
                expected[p] += n
        _await_chunk_counters(workers, expected, _chunk_base)
        for p in range(cfg.partitions):
            _chunk_base[p] += expected[p]
        if debug:
            import numpy as _np
            work = _np.array([x[3] for x in summary])
            print(f"[epoch {e}] feed {time.perf_counter() - te:.2f}s "
                  f"(task work p50={_np.median(work):.2f} "
                  f"max={work.max():.2f} sum={work.sum():.1f})",
                  flush=True)
            te = time.perf_counter()
        rows_total += sum(x[0] for x in summary)
        if summary:
            global_max_ts = max(global_max_ts,
                                max(x[1] for x in summary))

        final = cfg.drain and e == len(epochs) - 1
        if final:
            # bounded input: close every pane
            watermark = global_max_ts + cfg.window_size_us + cfg.allowed_lateness_us
        else:
            watermark = global_max_ts - cfg.allowed_lateness_us

        # Submit flush + snapshot before launching the next epoch's
        # feed. Ray orders actor calls per caller only, so an e+1 feed
        # chunk could in principle outrun this flush message — the
        # workers' epoch fence (ingest epoch tags + deferred buffer)
        # makes the boundary exact regardless of arrival order.
        flush_refs = [w.flush.remote(watermark) for w in workers]
        snap_refs = [w.snapshot.remote() for w in workers]
        lineage = {"input_files": epochs[e], "watermark": int(watermark),
                   "epoch": e}
        if "crash_after" in cfg.extra:
            # crash tests need strictly sequential commits
            _finalize(e, flush_refs, snap_refs, watermark, lineage)
        elif cfg.distributed_finalize:
            # distributed combine: one reducer per OUTPUT partition
            # (hash-bucketed groupby exchange), then the done-marker
            # task gated on all of them + the previous epoch
            red = [_reduce_out_partition.remote(
                       e, p, flush_refs, lineage, dim_versions, cfg,
                       out_dir, prev=fin_ref)
                   for p in range(cfg.out_partitions)]
            fin_ref = _epoch_done_task.remote(
                e, snap_refs, watermark, out_dir, state_dir,
                *red)
            fin_refs.append(fin_ref)
        else:
            # chain finalizes through the prev-result dependency:
            # commit order holds, the driver never blocks mid-stream
            fin_ref = _finalize_epoch_task.remote(
                e, flush_refs, snap_refs, watermark, lineage,
                dim_versions, cfg, out_dir, state_dir, prev=fin_ref)
            fin_refs.append(fin_ref)
        if debug:
            print(f"[epoch {e}] flush+spawn "
                  f"{time.perf_counter() - te:.2f}s", flush=True)

    tj = time.perf_counter()
    for written, skipped in ray.get(fin_refs):
        replayed_partitions += written
        skipped_partitions += skipped
    if debug:
        print(f"[tail] finalize-chain join "
              f"{time.perf_counter() - tj:.2f}s", flush=True)

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


def _finalize_epoch_body(e: int, partials: list, snap_blobs: list,
                         watermark: int, lineage: dict, dim_versions,
                         cfg, out_dir: str, state_dir: str,
                         crash_after=None) -> tuple[int, int]:
    """Combine + enrich + per-partition exactly-once commit + snapshot
    persist + _EPOCH_DONE for one epoch. Pane partials are
    metadata-scale (pre-aggregated per state partition), so one task
    handles them; per-partition fan-out was measured slower."""
    import pandas as pd

    sink = ExactlyOnceParquetSink(out_dir)
    out = _combine_and_enrich(partials, dim_versions, cfg.window_size_us)
    if len(out):
        h = pd.util.hash_pandas_object(
            out[["window_end", "lang"]], index=False).to_numpy()
        op = (h % np.uint64(cfg.out_partitions)).astype(np.int64)
    else:
        op = np.zeros(0, np.int64)
    written = skipped = 0
    for p in range(cfg.out_partitions):
        tbl = _finalize_schema(
            pa.Table.from_pandas(out[op == p], preserve_index=False).replace_schema_metadata(None))
        if sink.write_partition(e, p, tbl, lineage=lineage):
            written += 1
        else:
            skipped += 1
        # test hook: simulated crash mid-epoch, after some partitions
        # committed but before the epoch's snapshot + _EPOCH_DONE
        # (tuple() so a JSON-deserialized [e, p] list also fires)
        if crash_after is not None and tuple(crash_after) == (e, p):
            raise RuntimeError(f"injected crash after epoch={e} part={p}")
    snap_dir = os.path.join(state_dir, f"epoch={e}")
    os.makedirs(snap_dir, exist_ok=True)
    for p, b in enumerate(snap_blobs):
        _atomic_write_bytes(os.path.join(snap_dir, f"part={p}.pkl"), b)
    sink.finish_epoch(e, {"watermark": int(watermark)})
    return written, skipped


@ray.remote(num_cpus=1)
def _reduce_out_partition(e: int, p_out: int, flush_refs: list,
                          lineage: dict, dim_versions, cfg,
                          out_dir: str, prev=None) -> int:
    """One reducer of the DISTRIBUTED final combine
    (cfg.distributed_finalize): pulls every state partition's pane
    partial, keeps only the rows whose (window_end, lang) hash lands
    in output partition ``p_out``, and runs the IDENTICAL
    combine→enrich→schema chain on that bucket before committing it.
    Byte-identical to the single-task path: bucketing is a function
    of the group key (commutes with the aggregate), groupby(sort=True)
    orders each bucket exactly as the global combine orders its
    ``hash % R == p_out`` subset, and merge_asof is row-independent.
    ``prev`` carries the previous epoch's done-marker dependency so
    commit order holds. Volume note: each reducer re-reads all P
    partials (R × Σ|partials| total traffic) — pre-aggregated
    metadata, not event data; acceptable against the alternative of
    changing the worker flush contract."""
    import pandas as pd

    partials = ray.get(list(flush_refs))
    subs = []
    for t in partials:
        if not t.num_rows:
            continue
        df = t.to_pandas()
        h = pd.util.hash_pandas_object(
            df[["window_end", "lang"]], index=False).to_numpy()
        m = (h % np.uint64(cfg.out_partitions)).astype(np.int64) == p_out
        if m.any():
            subs.append(pa.Table.from_pandas(
                df[m], preserve_index=False).replace_schema_metadata(None))
    out = _combine_and_enrich(subs, dim_versions, cfg.window_size_us)
    tbl = _finalize_schema(pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None))
    sink = ExactlyOnceParquetSink(out_dir)
    return 1 if sink.write_partition(e, p_out, tbl,
                                     lineage=lineage) else 0


@ray.remote(num_cpus=0.25)
def _epoch_done_task(e: int, snap_refs: list, watermark: int,
                     out_dir: str, state_dir: str,
                     *written_flags) -> tuple[int, int]:
    """Distributed-finalize epilogue: runs only after every reducer of
    epoch ``e`` committed (the ``*written_flags`` are their results as
    task dependencies), persists the worker snapshots, then writes the
    epoch-done marker — the same atomicity point as the single-task
    path."""
    snap_dir = os.path.join(state_dir, f"epoch={e}")
    os.makedirs(snap_dir, exist_ok=True)
    for p, b in enumerate(ray.get(list(snap_refs))):
        _atomic_write_bytes(os.path.join(snap_dir, f"part={p}.pkl"), b)
    sink = ExactlyOnceParquetSink(out_dir)
    sink.finish_epoch(e, {"watermark": int(watermark)})
    written = sum(written_flags)
    return written, len(written_flags) - written


@ray.remote(num_cpus=1)
def _finalize_epoch_task(e: int, flush_refs: list, snap_refs: list,
                         watermark: int, lineage: dict, dim_versions,
                         cfg, out_dir: str, state_dir: str,
                         prev=None) -> tuple[int, int]:
    """Off-driver epoch finalize (single-node: the task shares the
    local filesystem with the driver; on a real cluster pin it to the
    head node or point state_dir/out_dir at shared storage).

    ``prev`` is the PREVIOUS epoch's finalize result passed as a task
    dependency: Ray won't start this task before it resolves, which
    preserves per-epoch commit order (an epoch is never _EPOCH_DONE
    before its predecessor) without the driver ever blocking — the
    r2 profile showed the driver's join-before-spawn serializing
    1.3-1.9 s of finalize per epoch once the feed got fast."""
    return _finalize_epoch_body(
        e, ray.get(list(flush_refs)), ray.get(list(snap_refs)),
        watermark, lineage, dim_versions, cfg, out_dir, state_dir)


def _finalize_schema(t: pa.Table) -> pa.Table:
    """Stable output schema: window_end as UTC timestamp."""
    if "window_end" in t.column_names and pa.types.is_integer(
            t.schema.field("window_end").type):
        i = t.column_names.index("window_end")
        t = t.set_column(i, "window_end",
                         t.column("window_end").cast(pa.timestamp("us", tz="UTC")))
    return t


@ray.remote
def _feed_session_files(paths: list, partitions: int,
                        key_col: str, ts_col: str, value_col: str,
                        batch_rows: int) -> tuple[int, int, list]:
    """Session-stream feeder: map side of the M×R shuffle (same design
    as _feed_join_files), partitioned by hash(key) so every session
    lives wholly inside one worker."""
    import pyarrow.parquet as pq

    rows, max_ts = 0, -(1 << 62)
    acc: list[list] = [[] for _ in range(partitions)]
    for path in paths:
        pf = pq.ParquetFile(path)
        for rb in pf.iter_batches(batch_size=batch_rows,
                                  columns=[key_col, ts_col, value_col]):
            t = pa.Table.from_batches([rb])
            ts = _ts_us_int64(t.column(ts_col))
            keys = np.asarray(t.column(key_col).to_pylist(),
                              dtype=object)
            vals = t.column(value_col).cast(pa.float64()).to_numpy()
            part = (stable_hash(keys)
                    % np.uint64(partitions)).astype(np.int64)
            order = np.argsort(part, kind="stable")
            bounds = np.searchsorted(part[order],
                                     np.arange(partitions + 1))
            ts_s, keys_s, vals_s = ts[order], keys[order], vals[order]
            for p in range(partitions):
                lo, hi = bounds[p], bounds[p + 1]
                if hi > lo:
                    acc[p].append((ts_s[lo:hi], keys_s[lo:hi],
                                   vals_s[lo:hi]))
            rows += len(t)
            if len(ts):
                max_ts = max(max_ts, int(ts.max()))
    refs: list = [None] * partitions
    for p, chunks in enumerate(acc):
        if chunks:
            refs[p] = ray.put((
                np.concatenate([c[0] for c in chunks]),
                np.concatenate([c[1] for c in chunks]),
                np.concatenate([c[2] for c in chunks])))
    return rows, max_ts, refs


def run_session_stream(input_path: str, out_dir: str, *, key_col: str,
                       ts_col: str, value_col: str, gap_us: int,
                       partitions: int = 8, files_per_epoch: int = 2,
                       allowed_lateness_us: int = 0,
                       resume: bool = True,
                       drain: bool = True,
                       crash_after: tuple | None = None) -> dict:
    """Streaming session windows with the same epoch/watermark/
    exactly-once machinery as run_stream. Sessions are partition-local
    (keyed partitioning), so worker outputs are FINAL — each epoch's
    partition table commits directly, no cross-partition combine."""
    from bento_ray.streaming.actors import SessionWorker

    files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")

    sink = ExactlyOnceParquetSink(out_dir)
    state_dir = os.path.join(out_dir, "_state")
    os.makedirs(state_dir, exist_ok=True)
    last_done = sink.last_done_epoch() if resume else -1
    if last_done >= 0:
        epochs = _resume_chunks(files, files_per_epoch, sink, last_done)
    else:
        epochs = [files[i:i + files_per_epoch]
                  for i in range(0, len(files), files_per_epoch)]
    workers = [SessionWorker.options(num_cpus=0.05).remote(p, gap_us)
               for p in range(partitions)]

    start_epoch = 0
    written = skipped = 0
    if last_done >= 0:
        snap_dir = os.path.join(state_dir, f"epoch={last_done}")
        blobs = []
        for p in range(partitions):
            with open(os.path.join(snap_dir, f"part={p}.pkl"), "rb") as fh:
                blobs.append(fh.read())
        ray.get([w.restore.remote(b) for w, b in zip(workers, blobs)])
        start_epoch = last_done + 1

    t0 = time.perf_counter()
    rows_total = 0
    global_max_ts = -(1 << 62)
    if resume and start_epoch > 0:
        # Re-seed watermark from restored state (see run_stream above).
        global_max_ts = max(ray.get([w.get_max_ts.remote() for w in workers]))
    def _settle(pend) -> None:
        nonlocal written, skipped
        pe, commit_refs, snap_refs, wm = pend
        done = ray.get(commit_refs)
        written += sum(done)
        skipped += len(done) - sum(done)
        ray.get(snap_refs)
        sink.finish_epoch(pe, {"watermark": int(wm)})

    from bento_ray.util import cluster_cpus

    tasks_target = 3 * cluster_cpus()
    pending = None
    for e in range(start_epoch, len(epochs)):
        files_e = epochs[e]
        g = max(1, -(-len(files_e) // tasks_target))
        work = [files_e[i:i + g] for i in range(0, len(files_e), g)]
        summary = _submit_in_waves(
            lambda fs: _feed_session_files.remote(fs, partitions,
                                                  key_col, ts_col,
                                                  value_col, 131072),
            work)
        rows_total += sum(r for r, _, _ in summary)
        if summary:
            global_max_ts = max(global_max_ts,
                                max(mt for _, mt, _ in summary))
        per_refs: list[list] = [[] for _ in range(partitions)]
        for _, _, refs in summary:
            for p, ref in enumerate(refs):
                if ref is not None:
                    per_refs[p].append(ref)
        ray.get([workers[p].ingest_refs.remote(per_refs[p])
                 for p in range(partitions) if per_refs[p]])
        if pending is not None:
            _settle(pending)
        final = drain and e == len(epochs) - 1
        watermark = (global_max_ts + gap_us + 1 if final
                     else global_max_ts - allowed_lateness_us)
        lineage = {"input_files": files_e, "watermark": int(watermark),
                   "epoch": e}
        commit_refs = [
            w.flush_and_commit.remote(watermark, out_dir, e, lineage,
                                      crash_after)
            for w in workers]
        snap_dir = os.path.join(state_dir, f"epoch={e}")
        os.makedirs(snap_dir, exist_ok=True)
        snap_refs = [
            w.snapshot_to.remote(os.path.join(snap_dir, f"part={p}.pkl"))
            for p, w in enumerate(workers)]
        pending = (e, commit_refs, snap_refs, watermark)
    if pending is not None:
        _settle(pending)

    metrics = ray.get([w.get_metrics.remote() for w in workers])
    agg = {k: sum(m[k] for m in metrics) for k in metrics[0]} if metrics else {}
    for w in workers:
        ray.kill(w)
    return {
        "epochs": len(epochs), "start_epoch": start_epoch,
        "rows_fed": rows_total, "elapsed_sec": time.perf_counter() - t0,
        "partitions_written": written, "partitions_skipped": skipped,
        "worker_metrics": agg, "out_dir": out_dir,
    }


@ray.remote
def _feed_typed_files(paths: list, partitions: int,
                      key_col: str, ts_col: str, id_col: str,
                      type_col: str, batch_rows: int
                      ) -> tuple[int, int, list]:
    """Typed-event feeder (CEP / absence / followedBy): map side of
    the M×R shuffle — same design as _feed_join_files (one ray.put
    per non-empty partition, refs back in the tiny task result,
    grouped files per task), partitioned by hash(key) so every key's
    event sequence lives in one worker. Event types travel
    dictionary-encoded (int16 codes + tiny vocab)."""
    import pyarrow.parquet as pq

    rows, max_ts = 0, -(1 << 62)
    acc: list[list] = [[] for _ in range(partitions)]
    for path in paths:
        pf = pq.ParquetFile(path)
        for rb in pf.iter_batches(batch_size=batch_rows,
                                  columns=[key_col, ts_col, id_col,
                                           type_col]):
            t = pa.Table.from_batches([rb])
            ts = _ts_us_int64(t.column(ts_col))
            eid = t.column(id_col).cast(pa.int64()).to_numpy()
            keys = t.column(key_col).cast(pa.int64()).to_numpy()
            tdict = t.column(type_col).combine_chunks() \
                .dictionary_encode()
            idx = tdict.indices
            vocab = tdict.dictionary.to_pylist()
            if idx.null_count:
                # null event types get their own vocab slot (the
                # pre-dictionary feeder passed None through as a
                # value) — a float-NaN index would int16-cast to 0
                # and silently alias the first real event type
                vocab = vocab + [None]
                idx = idx.fill_null(len(vocab) - 1)
            if len(vocab) > 32767:
                raise ValueError(
                    f"{type_col}: {len(vocab)} distinct event types "
                    "exceed the int16 dictionary code space")
            codes = np.asarray(idx.to_numpy(
                zero_copy_only=False), np.int16)
            part = (stable_hash(keys)
                    % np.uint64(partitions)).astype(np.int64)
            order = np.argsort(part, kind="stable")
            bounds = np.searchsorted(part[order],
                                     np.arange(partitions + 1))
            ts_s, eid_s = ts[order], eid[order]
            keys_s, codes_s = keys[order], codes[order]
            for p in range(partitions):
                lo, hi = bounds[p], bounds[p + 1]
                if hi > lo:
                    acc[p].append((ts_s[lo:hi], eid_s[lo:hi],
                                   keys_s[lo:hi], codes_s[lo:hi],
                                   vocab))
            rows += len(t)
            if len(ts):
                max_ts = max(max_ts, int(ts.max()))
    refs: list = [None] * partitions
    for p, chunks in enumerate(acc):
        if not chunks:
            continue
        # merge per-chunk vocabs into one bundle per partition
        vocab: list = []
        vidx: dict = {}
        code_parts = []
        for _, _, _, codes, cvocab in chunks:
            remap = np.empty(len(cvocab), np.int16)
            for i, v in enumerate(cvocab):
                if v not in vidx:
                    vidx[v] = len(vocab)
                    vocab.append(v)
                remap[i] = vidx[v]
            code_parts.append(remap[codes])
        refs[p] = ray.put((
            np.concatenate([c[0] for c in chunks]),
            np.concatenate([c[1] for c in chunks]),
            np.concatenate([c[2] for c in chunks]),
            np.concatenate(code_parts),
            vocab))
    return rows, max_ts, refs


def _run_typed_event_stream(make_worker, input_path: str, out_dir: str,
                            *, key_col: str, ts_col: str, id_col: str,
                            type_col: str, final_span_us: int,
                            partitions: int, files_per_epoch: int,
                            allowed_lateness_us: int, resume: bool,
                            drain: bool,
                            crash_after: tuple | None = None) -> dict:
    """Shared epoch loop for the single-input typed-event stream
    workers (CEP sequence matching, absence timers): per epoch the
    watermark advances to max-event-time − allowed_lateness; the final
    epoch (when ``drain``) flushes with max + final_span_us + 1 so
    every pending emission resolves. Same exactly-once sink +
    per-epoch snapshot/restore protocol as run_session_stream."""
    files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")

    sink = ExactlyOnceParquetSink(out_dir)
    state_dir = os.path.join(out_dir, "_state")
    os.makedirs(state_dir, exist_ok=True)
    last_done = sink.last_done_epoch() if resume else -1
    if last_done >= 0:
        epochs = _resume_chunks(files, files_per_epoch, sink, last_done)
    else:
        epochs = [files[i:i + files_per_epoch]
                  for i in range(0, len(files), files_per_epoch)]
    workers = [make_worker(p) for p in range(partitions)]

    start_epoch = 0
    written = skipped = 0
    if last_done >= 0:
        snap_dir = os.path.join(state_dir, f"epoch={last_done}")
        blobs = []
        for p in range(partitions):
            with open(os.path.join(snap_dir, f"part={p}.pkl"),
                      "rb") as fh:
                blobs.append(fh.read())
        ray.get([w.restore.remote(b)
                 for w, b in zip(workers, blobs)])
        start_epoch = last_done + 1

    t0 = time.perf_counter()
    rows_total = 0
    global_max_ts = -(1 << 62)
    if resume and start_epoch > 0:
        global_max_ts = max(ray.get(
            [w.get_max_ts.remote() for w in workers]))
    def _settle(pend) -> None:
        """Same pipelined-epoch epilogue as _run_two_stream: wait for
        the epoch's worker-local commits and worker-written snapshots,
        then write the done marker."""
        nonlocal written, skipped
        pe, commit_refs, snap_refs, wm = pend
        done = ray.get(commit_refs)
        written += sum(done)
        skipped += len(done) - sum(done)
        ray.get(snap_refs)
        sink.finish_epoch(pe, {"watermark": int(wm)})

    from bento_ray.util import cluster_cpus

    tasks_target = 3 * cluster_cpus()
    pending = None
    for e in range(start_epoch, len(epochs)):
        files_e = epochs[e]
        g = max(1, -(-len(files_e) // tasks_target))
        work = [files_e[i:i + g] for i in range(0, len(files_e), g)]
        summary = _submit_in_waves(
            lambda fs: _feed_typed_files.remote(fs, partitions,
                                                key_col, ts_col,
                                                id_col, type_col,
                                                131072),
            work)
        rows_total += sum(r for r, _, _ in summary)
        if summary:
            global_max_ts = max(global_max_ts,
                                max(mt for _, mt, _ in summary))
        per_refs: list[list] = [[] for _ in range(partitions)]
        for _, _, refs in summary:
            for p, ref in enumerate(refs):
                if ref is not None:
                    per_refs[p].append(ref)
        ray.get([workers[p].ingest_refs.remote(per_refs[p])
                 for p in range(partitions) if per_refs[p]])
        if pending is not None:
            _settle(pending)
        final = drain and e == len(epochs) - 1
        watermark = (global_max_ts + final_span_us + 1 if final
                     else global_max_ts - allowed_lateness_us)
        lineage = {"input_files": files_e, "watermark": int(watermark),
                   "epoch": e}
        commit_refs = [
            w.flush_and_commit.remote(watermark, out_dir, e, lineage,
                                      crash_after)
            for w in workers]
        snap_dir = os.path.join(state_dir, f"epoch={e}")
        os.makedirs(snap_dir, exist_ok=True)
        snap_refs = [
            w.snapshot_to.remote(os.path.join(snap_dir, f"part={p}.pkl"))
            for p, w in enumerate(workers)]
        pending = (e, commit_refs, snap_refs, watermark)
    if pending is not None:
        _settle(pending)

    metrics = ray.get([w.get_metrics.remote() for w in workers])
    agg = {k: sum(m[k] for m in metrics)
           for k in metrics[0]} if metrics else {}
    for w in workers:
        ray.kill(w)
    return {
        "epochs": len(epochs), "start_epoch": start_epoch,
        "rows_fed": rows_total, "elapsed_sec": time.perf_counter() - t0,
        "partitions_written": written, "partitions_skipped": skipped,
        "worker_metrics": agg, "out_dir": out_dir,
    }


def run_cep_stream(input_path: str, out_dir: str, *, pattern: list[str],
                   within_us: int, key_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   type_col: str = "event_type",
                   partitions: int = 8, files_per_epoch: int = 2,
                   allowed_lateness_us: int = 0,
                   resume: bool = True, drain: bool = True) -> dict:
    """Streaming CEP (strict contiguity): each CepWorker emits exactly
    the matches whose tail the watermark has passed, with bounded
    per-key state (events above the watermark + pattern_len−1 below
    it) — see the worker docstring. Output rows are FINAL per
    partition and commit through the idempotent sink."""
    from bento_ray.streaming.actors import CepWorker

    return _run_typed_event_stream(
        lambda p: CepWorker.options(num_cpus=0.05).remote(
            p, pattern, within_us),
        input_path, out_dir, key_col=key_col, ts_col=ts_col,
        id_col=id_col, type_col=type_col, final_span_us=within_us,
        partitions=partitions, files_per_epoch=files_per_epoch,
        allowed_lateness_us=allowed_lateness_us, resume=resume,
        drain=drain)


def run_followed_by_stream(input_path: str, out_dir: str, *,
                           pattern: list[str], within_us: int,
                           key_col: str = "user_id",
                           ts_col: str = "ts", id_col: str = "event_id",
                           type_col: str = "event_type",
                           partitions: int = 8, files_per_epoch: int = 2,
                           allowed_lateness_us: int = 0,
                           resume: bool = True,
                           drain: bool = True) -> dict:
    """Streaming relaxed-contiguity CEP (Flink `followedBy` — the live
    form of stages.cep.match_followed_by): every start event chains to
    the earliest next-step occurrences; a completed chain emits EAGERLY
    at the first flush whose watermark passes its tail (not at the
    start's timeout), and state is bounded by the pattern span behind
    the watermark. Output rows are FINAL per partition and commit
    through the idempotent sink."""
    from bento_ray.streaming.actors import FollowedByWorker

    return _run_typed_event_stream(
        lambda p: FollowedByWorker.options(num_cpus=0.05).remote(
            p, pattern, within_us),
        input_path, out_dir, key_col=key_col, ts_col=ts_col,
        id_col=id_col, type_col=type_col, final_span_us=within_us,
        partitions=partitions, files_per_epoch=files_per_epoch,
        allowed_lateness_us=allowed_lateness_us, resume=resume,
        drain=drain)


def run_absence_stream(input_path: str, out_dir: str, *, first: str,
                       absent: str, within_us: int,
                       key_col: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id",
                       type_col: str = "event_type",
                       partitions: int = 8, files_per_epoch: int = 2,
                       allowed_lateness_us: int = 0,
                       resume: bool = True, drain: bool = True) -> dict:
    """Streaming CEP negation / timeout (Flink `notFollowedBy` — the
    live form of stages.cep.match_absence): a ``first``-type event
    emits an alert exactly when the watermark fires its
    ``ts + within_us`` timeout with no same-key ``absent``-type event
    strictly after it (in (ts, id) order) within the bound; state is
    bounded by the timeout span. Output rows are FINAL per partition
    and commit through the idempotent sink."""
    from bento_ray.streaming.actors import AbsenceWorker

    return _run_typed_event_stream(
        lambda p: AbsenceWorker.options(num_cpus=0.05).remote(
            p, first, absent, within_us),
        input_path, out_dir, key_col=key_col, ts_col=ts_col,
        id_col=id_col, type_col=type_col, final_span_us=within_us,
        partitions=partitions, files_per_epoch=files_per_epoch,
        allowed_lateness_us=allowed_lateness_us, resume=resume,
        drain=drain)


@ray.remote
def _feed_join_files(paths: list, side: int, partitions: int,
                     key_col: str, ts_col: str,
                     id_col: str, batch_rows: int,
                     url_key: bool = False) -> tuple[int, int, int, list]:
    """Interval-join feeder: one raw task per (file group, side),
    partitioned by hash(key) so every key's rows from BOTH streams
    land on the same worker. The group size is picked by the driver so
    an epoch yields a small multiple of the cluster width in tasks —
    task granularity is an execution knob (exactly Ray Data's
    block-sizing), not a job parameter, and per-task overhead
    (submission + P puts + result round-trip) was measurable against
    15k-row single-file tasks. Returns (side, rows, max_ts, refs) —
    the side tag travels WITH the result because _submit_in_waves
    yields results in completion order once the in-flight window
    fills, so zipping against the submission list would misattribute
    each side's event-time frontier and let the two-input watermark
    min(gmax) advance past the lagging stream.

    Map side of a classic M×R shuffle: ONE ``ray.put`` per non-empty
    partition into the plasma store, refs travel back in the (tiny)
    task result and the driver hands each worker its whole epoch ref
    list in a single ``ingest_refs`` call. Direct actor pushes were
    the measured feed-phase scaling cap: P ``.remote()`` calls per
    task cost 0.5→1.5 ms EACH as width grows (submission overhead),
    while shrinking P pushed args past the ~100 KB inline limit onto
    a slower path. A put is a local store write at constant cost.
    Blob ownership sits with the (transient) feed worker process —
    safe because every ref is consumed at this epoch's own barrier,
    and a lost epoch is replayed from its input files on resume."""
    import pyarrow.parquet as pq

    if url_key:
        from bento_ray.textops.urlops import canonicalize_batch

    rows, max_ts = 0, -(1 << 62)
    acc: list[list] = [[] for _ in range(partitions)]
    for path in paths:
        pf = pq.ParquetFile(path)
        for rb in pf.iter_batches(batch_size=batch_rows,
                                  columns=[key_col, ts_col, id_col]):
            t = pa.Table.from_batches([rb])
            ts = _ts_us_int64(t.column(ts_col))
            eid = t.column(id_col).cast(pa.int64()).to_numpy()
            if url_key:
                # messy URL column → canonical form → stable uint64
                # key: the join key only exists after canonicalization
                # unifies tracking-param/www/port/case variants (the
                # click→conversion-by-landing-page pipeline); heavy
                # strings never leave this task
                canon = canonicalize_batch(t.column(key_col))
                keys = stable_hash(canon).astype(np.int64)
            else:
                keys = t.column(key_col).cast(pa.int64()).to_numpy()
            part = (stable_hash(keys)
                    % np.uint64(partitions)).astype(np.int64)
            # one stable sort + boundary slices: P mask passes re-read
            # the part array P times (memory-bandwidth-bound at high
            # widths); this is one pass + one gather per column
            order = np.argsort(part, kind="stable")
            bounds = np.searchsorted(part[order],
                                     np.arange(partitions + 1))
            ts_s, eid_s, keys_s = ts[order], eid[order], keys[order]
            for p in range(partitions):
                lo, hi = bounds[p], bounds[p + 1]
                if hi > lo:
                    acc[p].append((ts_s[lo:hi], eid_s[lo:hi],
                                   keys_s[lo:hi]))
            rows += len(t)
            if len(ts):
                max_ts = max(max_ts, int(ts.max()))
    refs: list = [None] * partitions
    for p, chunks in enumerate(acc):
        if chunks:
            refs[p] = ray.put((
                np.concatenate([c[0] for c in chunks]),
                np.concatenate([c[1] for c in chunks]),
                np.concatenate([c[2] for c in chunks])))
    return side, rows, max_ts, refs


def _run_two_stream(make_worker, left_path: str, right_path: str,
                    out_dir: str, *, key_col: str, ts_col: str,
                    id_col: str, final_span_us: int, partitions: int,
                    files_per_epoch: int, allowed_lateness_us: int,
                    resume: bool, drain: bool,
                    crash_after: tuple | None = None,
                    url_key: bool = False) -> dict:
    """Shared epoch loop for the two-input stream joins: the watermark
    is the MINIMUM of the two input streams' event-time frontiers
    minus the allowed lateness (Flink's two-input watermark rule); the
    final epoch flushes with max-frontier + final_span_us + 1 so every
    pending emission drains. Same exactly-once sink + per-epoch
    snapshot/restore protocol as run_cep_stream."""
    lf = sorted(glob.glob(os.path.join(left_path, "*.parquet")))
    rf = sorted(glob.glob(os.path.join(right_path, "*.parquet")))
    if not lf or not rf:
        raise FileNotFoundError(
            f"no parquet files under {left_path!r} / {right_path!r}")

    sink = ExactlyOnceParquetSink(out_dir)
    state_dir = os.path.join(out_dir, "_state")
    os.makedirs(state_dir, exist_ok=True)
    last_done = sink.last_done_epoch() if resume else -1
    if last_done >= 0:
        # each side re-chunks independently against its own lineage key
        lchunks = _resume_chunks(lf, files_per_epoch, sink, last_done,
                                 key="left_files")
        rchunks = _resume_chunks(rf, files_per_epoch, sink, last_done,
                                 key="right_files")
    else:
        lchunks = [lf[i:i + files_per_epoch]
                   for i in range(0, len(lf), files_per_epoch)]
        rchunks = [rf[i:i + files_per_epoch]
                   for i in range(0, len(rf), files_per_epoch)]
    n_epochs = max(len(lchunks), len(rchunks))
    epochs = [(lchunks[e] if e < len(lchunks) else [],
               rchunks[e] if e < len(rchunks) else [])
              for e in range(n_epochs)]
    workers = [make_worker(p) for p in range(partitions)]

    start_epoch = 0
    written = skipped = 0
    if last_done >= 0:
        snap_dir = os.path.join(state_dir, f"epoch={last_done}")
        blobs = []
        for p in range(partitions):
            with open(os.path.join(snap_dir, f"part={p}.pkl"),
                      "rb") as fh:
                blobs.append(fh.read())
        ray.get([w.restore.remote(b)
                 for w, b in zip(workers, blobs)])
        start_epoch = last_done + 1

    t0 = time.perf_counter()
    rows_total = 0
    gmax = [-(1 << 62), -(1 << 62)]
    if resume and start_epoch > 0:
        per_worker = ray.get([w.get_max_ts.remote() for w in workers])
        gmax = [max(m[0] for m in per_worker),
                max(m[1] for m in per_worker)]
    span = int(final_span_us)
    def _settle(pend) -> None:
        """Complete epoch pend: wait for its parallel commits and its
        workers' own snapshot writes, then (and only then) write the
        epoch-done marker — the exactly-once atomicity point is
        unchanged, it just lands one feed later."""
        nonlocal written, skipped
        pe, commit_refs, snap_refs, wm = pend
        done = ray.get(commit_refs)
        written += sum(done)
        skipped += len(done) - sum(done)
        ray.get(snap_refs)
        sink.finish_epoch(pe, {"watermark": int(wm)})

    # Pipelined micro-batches: epoch e's flush/snapshot calls are
    # enqueued on every worker BEFORE any epoch-e+1 ingest_refs call
    # exists, so actor-queue order guarantees the state boundary; its
    # commit tasks and snapshot transfers then overlap e+1's feed and
    # are settled at e+1's barrier. Worst case on a crash mid-feed
    # (e+1): epoch e's data files are committed but its done-marker is
    # not — resume re-feeds epoch e and the idempotent sink skips
    # every committed partition.
    pending = None
    prof = os.environ.get("BENTO_STREAM_PROFILE")
    from bento_ray.util import cluster_cpus

    # feed-task granularity: ~3 tasks per CPU per (epoch, side) so the
    # wave load-balances, but never 15k-row single-file tasks whose
    # fixed cost (submission + P puts) rivals their compute
    tasks_per_side = int(float(os.environ.get('BENTO_FEED_TPS_X', '3')) * cluster_cpus())

    def _grouped(files: list, side: int) -> list:
        if not files:
            return []
        g = max(1, -(-len(files) // tasks_per_side))
        return [(files[i:i + g], side) for i in range(0, len(files), g)]

    for e in range(start_epoch, len(epochs)):
        pt0 = time.perf_counter()
        lfiles, rfiles = epochs[e]
        work = _grouped(lfiles, 0) + _grouped(rfiles, 1)
        summary = _submit_in_waves(
            lambda fs: _feed_join_files.remote(
                fs[0], fs[1], partitions, key_col, ts_col,
                id_col, 131072, url_key),
            work)
        pt1 = time.perf_counter()
        rows_total += sum(r for _, r, _, _ in summary)
        # reduce side of the M×R shuffle: ONE actor call per worker
        # hands over every (side, blob-ref) addressed to it; the
        # ray.get below is the epoch's ingest barrier
        per_sides: list[list] = [[] for _ in range(partitions)]
        per_refs: list[list] = [[] for _ in range(partitions)]
        for side, _, mt, refs in summary:
            gmax[side] = max(gmax[side], mt)
            for p, ref in enumerate(refs):
                if ref is not None:
                    per_sides[p].append(side)
                    per_refs[p].append(ref)
        # explicit ingest barrier: actor queue order alone would let
        # epoch e+1's feed wave run concurrently with ingest(e) +
        # flush(e) — measured slower (cpu oversubscription starves the
        # actors exactly when the pipeline needs them), so the driver
        # waits for ingestion before opening the next feed wave
        ray.get([workers[p].ingest_refs.remote(per_sides[p], per_refs[p])
                 for p in range(partitions) if per_refs[p]])
        pt2 = time.perf_counter()
        if pending is not None:
            _settle(pending)
        pt3 = time.perf_counter()
        if prof:
            print(f"[epoch {e}] feed={pt1-pt0:.3f} ingest={pt2-pt1:.3f} "
                  f"settle={pt3-pt2:.3f} tasks={len(work)}", flush=True)
        final = drain and e == len(epochs) - 1
        watermark = (max(gmax) + span + 1 if final
                     else min(gmax) - allowed_lateness_us)
        lineage = {"left_files": lfiles, "right_files": rfiles,
                   "watermark": int(watermark), "epoch": e}
        commit_refs = [
            w.flush_and_commit.remote(watermark, out_dir, e, lineage,
                                      crash_after)
            for w in workers]
        snap_dir = os.path.join(state_dir, f"epoch={e}")
        os.makedirs(snap_dir, exist_ok=True)
        snap_refs = [
            w.snapshot_to.remote(os.path.join(snap_dir, f"part={p}.pkl"))
            for p, w in enumerate(workers)]
        pending = (e, commit_refs, snap_refs, watermark)
    pt4 = time.perf_counter()
    if pending is not None:
        _settle(pending)
    if prof:
        print(f"[tail] final settle={time.perf_counter()-pt4:.3f}",
              flush=True)

    metrics = ray.get([w.get_metrics.remote() for w in workers])
    agg = {k: sum(m[k] for m in metrics)
           for k in metrics[0]} if metrics else {}
    for w in workers:
        ray.kill(w)
    return {
        "epochs": len(epochs), "start_epoch": start_epoch,
        "rows_fed": rows_total, "elapsed_sec": time.perf_counter() - t0,
        "partitions_written": written, "partitions_skipped": skipped,
        "worker_metrics": agg, "out_dir": out_dir,
    }


def run_interval_join_stream(left_path: str, right_path: str,
                             out_dir: str, *, key_col: str,
                             lower_us: int, upper_us: int,
                             ts_col: str = "ts",
                             id_col: str = "event_id",
                             partitions: int = 8,
                             files_per_epoch: int = 2,
                             allowed_lateness_us: int = 0,
                             resume: bool = True,
                             drain: bool = True,
                             crash_after: tuple | None = None,
                             url_key: bool = False) -> dict:
    """Streaming stream-stream interval join: a pair emits exactly
    when the two-input watermark passes the later of its two
    timestamps, and each IntervalJoinWorker retains only the in-span
    tail of each stream (see the worker docstring for the finality /
    retention proofs). Output rows are FINAL per partition and commit
    through the idempotent sink.

    ``url_key=True`` treats ``key_col`` as a messy URL string column:
    each feed task canonicalizes it (textops.urlops.canonicalize_batch)
    and joins on the stable hash of the canonical form — the
    click→conversion-by-landing-page pipeline."""
    from bento_ray.streaming.actors import IntervalJoinWorker

    return _run_two_stream(
        lambda p: IntervalJoinWorker.options(num_cpus=0.05).remote(
            p, lower_us, upper_us),
        left_path, right_path, out_dir, key_col=key_col, ts_col=ts_col,
        id_col=id_col,
        final_span_us=max(abs(int(lower_us)), abs(int(upper_us))),
        partitions=partitions, files_per_epoch=files_per_epoch,
        allowed_lateness_us=allowed_lateness_us, resume=resume,
        drain=drain, crash_after=crash_after, url_key=url_key)


def run_asof_join_stream(left_path: str, right_path: str,
                         out_dir: str, *, key_col: str,
                         ts_col: str = "ts",
                         id_col: str = "event_id",
                         partitions: int = 8,
                         files_per_epoch: int = 2,
                         allowed_lateness_us: int = 0,
                         resume: bool = True,
                         drain: bool = True) -> dict:
    """Streaming as-of join (the live form of stages.join.asof_join):
    every left row emits exactly once — when the two-input watermark
    reaches its timestamp — carrying the latest same-key right row
    at-or-before it (ties → largest right id; left-join nulls). Right
    state collapses to one row per key behind the watermark. Output
    rows are FINAL per partition and commit through the idempotent
    sink."""
    from bento_ray.streaming.actors import AsofJoinWorker

    return _run_two_stream(
        lambda p: AsofJoinWorker.options(num_cpus=0.05).remote(p),
        left_path, right_path, out_dir, key_col=key_col, ts_col=ts_col,
        id_col=id_col, final_span_us=0,
        partitions=partitions, files_per_epoch=files_per_epoch,
        allowed_lateness_us=allowed_lateness_us, resume=resume,
        drain=drain)
