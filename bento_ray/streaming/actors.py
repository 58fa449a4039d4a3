"""Partitioned stateful stream workers.

One ``PartitionWorker`` actor per hash partition (partitioned on
``hash(url) % P`` by the feeder). Each worker holds the keyed state the
Dataset API cannot express across micro-batch epochs:

- the cross-epoch dedupe seen-set (url-hash → first event time, TTL'd
  by watermark GC — the reference's ``dedupe`` + ``memory`` cache,
  processor_dedupe.go:160-209 / cache_memory.go:16);
- pending window panes (tumbling/sliding assignment with the
  reference's left-open boundary arithmetic, see stages/window.py);
- ``latest_flushed_end`` for the late-data drop rule
  (buffer_system_window.go:333-336).

Protocol per epoch: many concurrent ``ingest()`` calls append compact
columnar chunks (ts, url-hash, lang, nbytes — the heavy html/text bytes
NEVER ship to the state actors); one ``flush(watermark)`` call then
applies deterministic dedupe (first occurrence by min event time),
assigns panes, emits closed panes (``window_end ≤ watermark``) as small
per-partition partial aggregates, and GCs state. Emission is therefore
independent of arrival order within an epoch — replays are
deterministic.
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

import ray


def _atomic_write(path: str, blob: bytes) -> int:
    import os

    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, path)
    return len(blob)


def _pane_ends(ts: np.ndarray, size_us: int, slide_us: int | None,
               offset_us: int) -> tuple[np.ndarray, np.ndarray]:
    """Row indices + window_end per (row, pane) assignment."""
    rel = ts - offset_us
    if not slide_us or slide_us == size_us:
        ends = ((rel + size_us - 1) // size_us) * size_us + offset_us
        return np.arange(len(ts)), ends
    k = size_us // slide_us
    e0 = ((rel + slide_us - 1) // slide_us) * slide_us + offset_us
    idx = np.repeat(np.arange(len(ts)), k)
    ends = (e0[:, None] + (np.arange(k) * slide_us)[None, :]).reshape(-1)
    return idx, ends


class _SeenSet:
    """url-hash → first-event-ts store, numpy-backed.

    16 bytes/entry (sorted uint64 hashes + aligned int64 timestamps)
    vs ~100 for a Python dict slot, and every operation is vectorized:
    membership is a searchsorted probe of the sorted main run plus an
    isin probe of the small unsorted tail; the tail merges into the
    main run when it outgrows max(4096, main/4), so inserts amortize
    to O(log n) with no per-key Python. TTL GC masks both runs. With
    ``dedupe_ttl_us`` set, memory is bounded by key-arrival-rate × TTL;
    without it the full distinct-key set is held (documented trade,
    SURVEY §8) at ~6× less RAM than the dict this replaces."""

    __slots__ = ("h", "t", "th", "tt")

    def __init__(self):
        self.h = np.empty(0, np.uint64)
        self.t = np.empty(0, np.int64)
        self.th = np.empty(0, np.uint64)
        self.tt = np.empty(0, np.int64)

    def __len__(self):
        return len(self.h) + len(self.th)

    def contains(self, q: np.ndarray) -> np.ndarray:
        res = np.zeros(len(q), bool)
        if len(self.h):
            pos = np.minimum(np.searchsorted(self.h, q), len(self.h) - 1)
            res |= self.h[pos] == q
        if len(self.th):
            res |= np.isin(q, self.th)
        return res

    def add(self, q: np.ndarray, ts: np.ndarray) -> None:
        """Append hashes KNOWN to be absent (and mutually unique)."""
        if not len(q):
            return
        self.th = np.concatenate([self.th, q])
        self.tt = np.concatenate([self.tt, ts])
        if len(self.th) > self._tail_limit():
            self._merge()

    def _tail_limit(self) -> int:
        return max(4096, len(self.h) // 4)

    def _merge(self) -> None:
        h = np.concatenate([self.h, self.th])
        t = np.concatenate([self.t, self.tt])
        order = np.argsort(h, kind="stable")
        self.h, self.t = h[order], t[order]
        self.th = np.empty(0, np.uint64)
        self.tt = np.empty(0, np.int64)

    def gc(self, horizon_us: int) -> None:
        if len(self.th):
            self._merge()
        m = self.t >= horizon_us
        self.h, self.t = self.h[m], self.t[m]

    def rebuild(self, h: np.ndarray, t: np.ndarray) -> None:
        """Restore path: entries ordered oldest→newest, later wins
        (a hash can reappear in a later delta after TTL eviction)."""
        idx = np.arange(len(h))
        order = np.lexsort((idx, h))
        hh, tt = np.asarray(h, np.uint64)[order], np.asarray(t, np.int64)[order]
        last = np.flatnonzero(np.concatenate(
            [hh[1:] != hh[:-1], [True]])) if len(hh) else np.empty(0, np.int64)
        self.h, self.t = hh[last], tt[last]
        self.th = np.empty(0, np.uint64)
        self.tt = np.empty(0, np.int64)


class _SpillSeenSet(_SeenSet):
    """Disk-backed seen-set with the SAME contains/add/gc/rebuild
    contract — the memory escape hatch for ``dedupe_ttl_us=None``
    (whole-run dedupe over an unbounded distinct-key set, ~16 B/key
    in RAM otherwise).

    LSM-lite: the in-RAM sorted main run spills to an immutable
    on-disk sorted run (``uint64 .npy``-less raw file, opened as a
    read-only ``np.memmap``) whenever it outgrows ``mem_entries``;
    membership probes binary-search every disk run through the
    memmap, so the OS touches only O(log n) pages per probe batch
    and evicts them freely. Runs compact k→1 when their count
    exceeds 8, keeping probe fan-out bounded. Keys are disjoint
    across runs by construction (``add`` receives only
    globally-absent keys), so dedupe decisions — and therefore the
    flagship's committed bytes — are identical to the in-RAM set
    (pytest-pinned). TTL ``gc`` filters run-by-run (peak RAM = one
    run ≈ mem_entries, never the whole set), so spill + finite TTL
    composes safely; a TTL'd set is bounded anyway — spilling
    matters for the TTL-less mode."""

    def __init__(self, spill_dir: str, mem_entries: int):
        super().__init__()
        import os

        self.spill_dir = spill_dir
        self.mem_entries = int(mem_entries)
        os.makedirs(spill_dir, exist_ok=True)
        # (h memmap, t memmap, n, h path, t path)
        self._runs: list[tuple] = []
        self._run_id = 0

    def __len__(self):
        return super().__len__() + sum(r[2] for r in self._runs)

    def _tail_limit(self) -> int:
        # the RAM bound applies to the tail too — without this a
        # sub-4096-key partition never merges, never spills
        return max(min(4096, self.mem_entries),
                   min(len(self.h) // 4, self.mem_entries))

    def contains(self, q: np.ndarray) -> np.ndarray:
        res = super().contains(q)
        for h, _, n, _, _ in self._runs:
            pos = np.minimum(np.searchsorted(h, q), n - 1)
            res |= np.asarray(h[pos]) == q
        return res

    def _merge(self) -> None:
        super()._merge()
        if len(self.h) > self.mem_entries:
            self._spill()

    def _write_run(self, h: np.ndarray, t: np.ndarray) -> None:
        import os

        hp = os.path.join(self.spill_dir, f"run{self._run_id}.h")
        tp = os.path.join(self.spill_dir, f"run{self._run_id}.t")
        self._run_id += 1
        for path, arr in ((hp, h), (tp, t)):
            tmp = path + ".tmp"
            arr.tofile(tmp)
            os.replace(tmp, path)
        self._runs.append((np.memmap(hp, np.uint64, "r"),
                           np.memmap(tp, np.int64, "r"), len(h),
                           hp, tp))

    def _spill(self) -> None:
        self._write_run(self.h, self.t)
        self.h = np.empty(0, np.uint64)
        self.t = np.empty(0, np.int64)
        if len(self._runs) > 8:
            self._compact()

    def _load_all(self) -> tuple[np.ndarray, np.ndarray]:
        hs = [np.asarray(r[0]) for r in self._runs] + [self.h]
        ts = [np.asarray(r[1]) for r in self._runs] + [self.t]
        self._drop_runs()
        h = np.concatenate(hs)
        t = np.concatenate(ts)
        order = np.argsort(h, kind="stable")
        return h[order], t[order]

    def _drop_runs(self) -> None:
        import os

        self._runs = []
        for f in os.listdir(self.spill_dir):
            if f.startswith("run"):
                os.unlink(os.path.join(self.spill_dir, f))

    def _compact(self) -> None:
        self.h, self.t = self._load_all()
        self._spill()

    def gc(self, horizon_us: int) -> None:
        import os

        # merge the unsorted tail FIRST in every case (base-class
        # _merge, no spill check) — with no disk runs yet the old
        # `if self._runs` guard skipped it and TTL-expired tail
        # entries survived the horizon filter, diverging from the
        # in-RAM set's dedupe decisions
        if len(self.th):
            super()._merge()
        m = self.t >= horizon_us
        self.h, self.t = self.h[m], self.t[m]
        # filter each disk run INDEPENDENTLY (probes don't need global
        # order, only per-run sorted, which filtering preserves) — the
        # old path concatenated every run into RAM each flush, an
        # O(total keys) spike that defeated the spill bound whenever a
        # finite TTL was set alongside spilling
        old = self._runs
        self._runs = []
        for hm, tm, n, hp, tp in old:
            ta = np.asarray(tm)
            k = ta >= horizon_us
            if k.all():
                self._runs.append((hm, tm, n, hp, tp))
                continue
            hf = np.asarray(hm)[k]
            tf = ta[k]
            if len(hf):
                self._write_run(hf, tf)
            for p in (hp, tp):
                os.unlink(p)
        if len(self.h) > self.mem_entries:
            self._spill()

    def rebuild(self, h: np.ndarray, t: np.ndarray) -> None:
        self._drop_runs()
        super().rebuild(h, t)
        if len(self.h) > self.mem_entries:
            self._spill()


class _EpochCommitMixin:
    """Worker-local epoch commit/snapshot protocol shared by every
    stateful stream worker (session, CEP, interval/as-of join,
    absence, followedBy). Subclasses provide ``part_id``,
    ``snapshot()`` and ``flush(watermark_us)``."""

    def snapshot_to(self, path: str) -> int:
        """Write this partition's epoch snapshot to ``path`` itself
        (atomic tmp+rename) — the Flink checkpoint shape: every task
        persists its own state file to shared storage in parallel and
        the driver only records completion. Funnelling P pickle blobs
        through the driver made snapshotting a width-independent
        serial section of every epoch."""
        return _atomic_write(path, self.snapshot())

    def flush_and_commit(self, watermark_us: int, out_dir: str,
                         epoch: int, lineage: dict,
                         crash_after=None) -> bool:
        """Flush and commit this partition's emission through the
        idempotent sink IN the worker (the Flink task-local sink
        write): the emission table never round-trips through plasma
        and no separate commit-task processes exist — fractional-CPU
        commit tasks made the raylet pre-start ~100 extra Python
        workers per run (~1s import each), the measured width-32
        scaling cap. Exactly-once is unchanged: (epoch, part) paths
        are disjoint, write_partition is idempotent, and the driver
        still writes the epoch-done marker only after every commit
        AND snapshot settles. ``crash_after=(epoch, part)`` keeps the
        deterministic fault-injection contract."""
        if crash_after is not None and \
                tuple(crash_after) == (epoch, self.part_id):
            raise RuntimeError("injected crash")
        from bento_ray.streaming.checkpoint import ExactlyOnceParquetSink

        t = self.flush(watermark_us)
        sink = ExactlyOnceParquetSink(out_dir)
        return sink.write_partition(epoch, self.part_id, t,
                                    lineage=lineage)



@ray.remote
class PartitionWorker:
    def __init__(self, part_id: int, size_us: int, slide_us: int | None,
                 offset_us: int, dedupe_ttl_us: int | None = None,
                 spill_dir: str | None = None,
                 spill_entries: int | None = None):
        self.part_id = part_id
        self.size_us = size_us
        self.slide_us = slide_us
        self.offset_us = offset_us
        self.dedupe_ttl_us = dedupe_ttl_us
        # raw rows appended since the last flush (columnar chunks)
        self._raw: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []
        # deduped rows awaiting pane closure
        self._ready = {
            "ts": np.empty(0, np.int64),
            "urlh": np.empty(0, np.uint64),
            "lang": np.empty(0, object),
            "nbytes": np.empty(0, np.int64),
        }
        # url hash → first event ts; disk-backed when a spill bound is
        # set (the dedupe_ttl_us=None whole-run-dedupe memory trade).
        # spill config is kept so restore() can rebuild the SAME kind
        # of set — a resumed spill run must not silently fall back to
        # the unbounded in-RAM set
        self.spill_dir = spill_dir
        self.spill_entries = spill_entries
        self.seen = self._new_seen()
        # hashes added since the last snapshot (list of array chunks)
        self._delta_h: list[np.ndarray] = []
        self._delta_t: list[np.ndarray] = []
        self.chunks_received = 0
        # epoch fencing: ingest calls are tagged with their epoch by
        # the feed tasks; a chunk that arrives BEFORE this partition
        # processed the previous epoch's flush (possible — Ray orders
        # actor calls per caller, and feeds/flush come from different
        # callers) is deferred until that flush runs, so pane contents
        # per (epoch, watermark) are deterministic
        self._epoch = 0
        self._deferred: list[tuple[int, tuple]] = []
        self.latest_flushed_end = -(1 << 62)
        self.max_ts = -(1 << 62)
        self.metrics = {"rows_in": 0, "late_dropped": 0, "dedupe_dropped": 0,
                        "panes_emitted": 0, "rows_emitted": 0}

    def _new_seen(self):
        return (_SpillSeenSet(self.spill_dir, self.spill_entries)
                if self.spill_entries else _SeenSet())

    # -- ingest (many concurrent calls per epoch) ---------------------
    def ingest(self, ts: np.ndarray, urlh: np.ndarray,
               lang_codes: np.ndarray, vocab: list,
               nbytes: np.ndarray, epoch: int = -1) -> int:
        """Accept one compact columnar chunk. ``lang`` arrives
        dictionary-encoded (int8 codes + small vocab) — decoding is one
        vectorized fancy-index, no per-string pickling. Feed tasks push
        fire-and-forget; the epoch barrier is the driver comparing
        ``chunks_received`` against the sum each task reported."""
        self.metrics["rows_in"] += len(ts)
        self.chunks_received += 1
        if len(ts):
            self.max_ts = max(self.max_ts, int(ts.max()))
        lang = np.asarray(vocab, dtype=object)[lang_codes]
        if epoch >= 0 and epoch > self._epoch:
            # early arrival from the NEXT epoch's feed wave (its flush
            # message is still in flight): hold it out of _raw so the
            # pending flush closes panes over exactly its own epoch
            self._deferred.append((epoch, (ts, urlh, lang, nbytes)))
        else:
            self._raw.append((ts, urlh, lang, nbytes))
        return len(ts)

    def get_chunks_received(self) -> int:
        return self.chunks_received

    def get_max_ts(self) -> int:
        return self.max_ts

    # -- flush (one call per epoch, after all ingests) ----------------
    def flush(self, watermark_us: int) -> pa.Table:
        # TTL GC BEFORE deduping this cycle's rows: an entry older than
        # (watermark − ttl) must not suppress a re-occurrence (the
        # reference's TTL'd memory cache evicts at access time)
        if self.dedupe_ttl_us is not None:
            horizon = watermark_us - self.dedupe_ttl_us
            self.seen.gc(horizon)
            if self._delta_h:
                dh = np.concatenate(self._delta_h)
                dt = np.concatenate(self._delta_t)
                m = dt >= horizon
                self._delta_h, self._delta_t = [dh[m]], [dt[m]]
        if self._raw:
            ts = np.concatenate([c[0] for c in self._raw])
            urlh = np.concatenate([c[1] for c in self._raw])
            lang = np.concatenate([c[2] for c in self._raw]).astype(object)
            nbytes = np.concatenate([c[3] for c in self._raw])
            self._raw = []

            # late-data drop (reference rule: ts ≤ latestFlushedWindowEnd)
            ok = ts > self.latest_flushed_end
            self.metrics["late_dropped"] += int((~ok).sum())
            ts, urlh, lang, nbytes = ts[ok], urlh[ok], lang[ok], nbytes[ok]

            # deterministic FIFO dedupe: first occurrence per url-hash by
            # (event time, hash) over everything visible this cycle
            order = np.lexsort((urlh, ts))
            ts, urlh, lang, nbytes = ts[order], urlh[order], lang[order], nbytes[order]
            _, first_idx = np.unique(urlh, return_index=True)
            keep = np.zeros(len(ts), dtype=bool)
            keep[first_idx] = True
            fh = urlh[first_idx].astype(np.uint64)
            known = self.seen.contains(fh)
            keep[first_idx[known]] = False
            new_h = fh[~known]
            new_t = ts[first_idx[~known]].astype(np.int64)
            self.seen.add(new_h, new_t)
            if len(new_h):
                self._delta_h.append(new_h)
                self._delta_t.append(new_t)
            self.metrics["dedupe_dropped"] += int((~keep).sum())
            ts, urlh, lang, nbytes = ts[keep], urlh[keep], lang[keep], nbytes[keep]

            self._ready = {
                "ts": np.concatenate([self._ready["ts"], ts]),
                "urlh": np.concatenate([self._ready["urlh"], urlh]),
                "lang": np.concatenate([self._ready["lang"], lang]).astype(object),
                "nbytes": np.concatenate([self._ready["nbytes"], nbytes]),
            }

        r = self._ready
        idx, ends = _pane_ends(r["ts"], self.size_us, self.slide_us, self.offset_us)
        # emit panes newly closed by this watermark; panes already flushed
        # in a previous cycle (sliding windows re-assign retained rows)
        # must not re-emit
        emit_mask = (ends <= watermark_us) & (ends > self.latest_flushed_end)
        open_mask = ends > watermark_us
        emitted = pa.table({
            "window_end": pa.array(np.zeros(0, np.int64), pa.int64()),
            "lang": pa.array([], pa.string()),
            "pages": pa.array(np.zeros(0, np.int64), pa.int64()),
            "nbytes": pa.array(np.zeros(0, np.int64), pa.int64()),
        })
        if emit_mask.any():
            # local import: pandas costs ~0.4s of every actor
            # process's cold start and only this emission path needs it
            import pandas as pd

            eidx = idx[emit_mask]
            df = pd.DataFrame({
                "window_end": ends[emit_mask],
                "lang": r["lang"][eidx],
                "nbytes": r["nbytes"][eidx],
            })
            agg = (df.groupby(["window_end", "lang"], sort=True)
                     .agg(pages=("nbytes", "size"), nbytes=("nbytes", "sum"))
                     .reset_index())
            emitted = pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)
            self.metrics["panes_emitted"] += len(agg)
            self.metrics["rows_emitted"] += int(len(eidx))

        # advance the flushed frontier to the newest pane end ≤ watermark
        # even when those panes were empty — late rows for an
        # already-closed (possibly empty) window must be dropped, exactly
        # like the reference's latestFlushedWindowEnd.
        epoch_us = self.slide_us or self.size_us
        e_max = ((watermark_us - self.offset_us - self.size_us) // epoch_us) \
            * epoch_us + self.offset_us + self.size_us
        if e_max > self.latest_flushed_end:
            self.latest_flushed_end = e_max

        # retain rows that still belong to an open pane (for sliding
        # windows a row may be both emitted in one pane and retained for
        # the next — keep any row with at least one open pane)
        open_rows = np.zeros(len(r["ts"]), dtype=bool)
        if open_mask.any():
            open_rows[np.unique(idx[open_mask])] = True
        self._ready = {k: v[open_rows] for k, v in r.items()}

        # this epoch is flushed: release any chunks that arrived early
        # for the next epoch into the live buffer
        self._epoch += 1
        if self._deferred:
            still: list[tuple[int, tuple]] = []
            for ep, chunk in self._deferred:
                if ep <= self._epoch:
                    self._raw.append(chunk)
                else:
                    still.append((ep, chunk))
            self._deferred = still

        return emitted

    # -- checkpointing ------------------------------------------------
    def snapshot(self) -> bytes:
        """INCREMENTAL state snapshot: the small per-epoch mutable state
        (pending panes, frontier, metrics) plus only the dedupe keys
        ADDED since the last snapshot. Serializing the full seen-set
        every epoch is O(stream length) driver time — a scaling
        bottleneck (and impossible at 10^12 docs); deltas are O(epoch).
        Restore applies the epoch chain 0..E in order."""
        dh = (np.concatenate(self._delta_h) if self._delta_h
              else np.empty(0, np.uint64))
        dt = (np.concatenate(self._delta_t) if self._delta_t
              else np.empty(0, np.int64))
        self._delta_h, self._delta_t = [], []
        return pickle.dumps({
            "part_id": self.part_id,
            "ready": self._ready,
            "seen_delta": (dh, dt),
            "latest_flushed_end": self.latest_flushed_end,
            "max_ts": self.max_ts,
            "metrics": self.metrics,
        })

    def restore(self, blobs: list[bytes]) -> None:
        """Rebuild from the ordered chain of epoch snapshots: the dedupe
        set is the union of all deltas; the rest of the state comes from
        the newest snapshot."""
        if isinstance(blobs, (bytes, bytearray)):
            blobs = [blobs]
        hs: list[np.ndarray] = []
        ts_: list[np.ndarray] = []
        for blob in blobs:
            st = pickle.loads(blob)
            delta = st.get("seen_delta", st.get("seen", {}))
            if isinstance(delta, dict):  # pre-array snapshot format
                hs.append(np.fromiter(delta.keys(), np.uint64, len(delta)))
                ts_.append(np.fromiter(delta.values(), np.int64, len(delta)))
            else:
                hs.append(np.asarray(delta[0], np.uint64))
                ts_.append(np.asarray(delta[1], np.int64))
        # rebuild the same KIND of seen-set the run was configured
        # with — a spill-configured resume falling back to the in-RAM
        # set would re-inflate the very state the spill bounds (and
        # _SpillSeenSet.rebuild clears stale run files from the
        # crashed attempt before re-spilling)
        self.seen = self._new_seen()
        self.seen.rebuild(
            np.concatenate(hs) if hs else np.empty(0, np.uint64),
            np.concatenate(ts_) if ts_ else np.empty(0, np.int64))
        self._delta_h, self._delta_t = [], []
        self._ready = st["ready"]
        self.latest_flushed_end = st["latest_flushed_end"]
        self.max_ts = st["max_ts"]
        self.metrics = st["metrics"]
        self._raw = []
        # the next fed epoch is the one after the restored chain
        self._epoch = len(blobs)
        self._deferred = []

    def get_metrics(self) -> dict:
        return dict(self.metrics)


@ray.remote
class SessionWorker(_EpochCommitMixin):
    """Keyed session windows over the stream (north-rule addition — the
    reference has no session windows). Partitioned by hash(key); each
    worker tracks the OPEN sessions per key (possibly several until the
    watermark passes them):

        a session covers [start, last]; an event at ts merges into any
        session with start − gap ≤ ts ≤ last + gap (bridging events can
        merge two sessions); a session closes and emits
        (key, session_start, session_end=last, n_events, sum_value)
        ONLY when watermark ≥ last + gap — never eagerly on a same-flush
        gap-exceeding event, so an out-of-order event in a later epoch
        still lands in its (still-open) session.

    Late-drop rule (mirrors PartitionWorker.latest_flushed_end): events
    with ts ≤ the last flush watermark are dropped and counted in
    ``late_dropped`` — by construction any event that could touch an
    already-emitted session satisfies ts ≤ emitted.last + gap ≤ that
    watermark, so emission stays deterministic under replay.

    Flush is vectorized: one lexsort + break-scan + segment-reduce forms
    "mini-sessions" (O(events) numpy), then a Python merge runs only
    over mini-sessions × open keys — never per event.

    State = open sessions only — bounded by active keys within one gap
    of the watermark."""

    def __init__(self, part_id: int, gap_us: int):
        self.part_id = part_id
        self.gap_us = gap_us
        self._raw: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        # key → sorted list of [start, last, n, sum] (disjoint by > gap)
        self.open: dict = {}
        self.max_ts = -(1 << 62)
        self.frontier = -(1 << 62)  # last flush watermark
        self.metrics = {"rows_in": 0, "sessions_emitted": 0,
                        "late_dropped": 0}

    def ingest(self, ts: np.ndarray, keys: np.ndarray,
               values: np.ndarray) -> int:
        self.metrics["rows_in"] += len(ts)
        if len(ts):
            self.max_ts = max(self.max_ts, int(ts.max()))
        self._raw.append((ts, keys, values))
        return len(ts)

    def ingest_refs(self, refs: list) -> int:
        """Reduce side of the engine's M×R feed shuffle (see
        IntervalJoinWorker.ingest_refs): each plasma bundle is a
        (ts, key, value) numpy triple."""
        total = 0
        for ts, keys, values in ray.get(list(refs)):
            total += self.ingest(ts, keys, values)
        return total

    def get_max_ts(self) -> int:
        return self.max_ts

    def flush(self, watermark_us: int) -> pa.Table:
        gap = self.gap_us
        if self._raw:
            ts = np.concatenate([c[0] for c in self._raw]).astype(np.int64)
            keys = np.concatenate([c[1] for c in self._raw]).astype(object)
            vals = np.concatenate([c[2] for c in self._raw]).astype(np.float64)
            self._raw = []
            on_time = ts > self.frontier
            n_late = int(len(ts) - on_time.sum())
            if n_late:
                self.metrics["late_dropped"] += n_late
                ts, keys, vals = ts[on_time], keys[on_time], vals[on_time]
            if len(ts):
                order = np.lexsort((ts, keys))
                ts, keys, vals = ts[order], keys[order], vals[order]
                brk = np.ones(len(ts), dtype=bool)
                if len(ts) > 1:
                    brk[1:] = (keys[1:] != keys[:-1]) | \
                        ((ts[1:] - ts[:-1]) > gap)
                starts = np.flatnonzero(brk)
                counts = np.diff(np.r_[starts, len(ts)])
                seg_last = ts[np.r_[starts[1:], len(ts)] - 1]
                seg_sum = np.add.reduceat(vals, starts)
                # merge mini-sessions into open state (per mini, not
                # per event; bridging minis can merge two open sessions)
                for j in range(len(starts)):
                    k = keys[starts[j]]
                    mini = [int(ts[starts[j]]), int(seg_last[j]),
                            int(counts[j]), float(seg_sum[j])]
                    sess = self.open.get(k)
                    if sess is None:
                        self.open[k] = [mini]
                        continue
                    keep = []
                    for s in sess:
                        if mini[0] - gap <= s[1] and s[0] - gap <= mini[1]:
                            mini = [min(mini[0], s[0]), max(mini[1], s[1]),
                                    mini[2] + s[2], mini[3] + s[3]]
                        else:
                            keep.append(s)
                    keep.append(mini)
                    keep.sort()
                    self.open[k] = keep
        # close only sessions the watermark has passed
        closed: list[tuple] = []
        for k in list(self.open):
            sess = self.open[k]
            still = [s for s in sess if s[1] + gap > watermark_us]
            for s in sess:
                if s[1] + gap <= watermark_us:
                    closed.append((k, *s))
            if still:
                self.open[k] = still
            else:
                del self.open[k]
        self.frontier = max(self.frontier, watermark_us)
        self.metrics["sessions_emitted"] += len(closed)
        closed.sort()
        return pa.table({
            "key": pa.array([c[0] for c in closed]),
            "session_start": pa.array([c[1] for c in closed],
                                      pa.timestamp("us")),
            "session_end": pa.array([c[2] for c in closed],
                                    pa.timestamp("us")),
            "n_events": pa.array([c[3] for c in closed], pa.int64()),
            "sum_value": pa.array([round(c[4], 4) for c in closed],
                                  pa.float64()),
        })

    def snapshot(self) -> bytes:
        return pickle.dumps({"open": self.open, "max_ts": self.max_ts,
                             "frontier": self.frontier,
                             "metrics": self.metrics})

    def restore(self, blobs) -> None:
        if isinstance(blobs, (bytes, bytearray)):
            blobs = [blobs]
        st = pickle.loads(blobs[-1])
        self.open = st["open"]
        self.max_ts = st["max_ts"]
        self.frontier = st.get("frontier", -(1 << 62))
        self.metrics = st["metrics"]
        self.metrics.setdefault("late_dropped", 0)
        self._raw = []

    def get_metrics(self) -> dict:
        return dict(self.metrics)


@ray.remote
class CepWorker(_EpochCommitMixin):
    """Streaming CEP: strict-contiguity pattern matching over the
    live stream (the streaming form of stages.cep.match_event_sequence,
    same output schema and semantics). Partitioned by hash(key).

    Finality rule: after a flush at watermark W, every later-accepted
    event has ts > W (the late-drop rule) — so adjacency between
    events with ts ≤ W can never change, and a match is emitted
    exactly when its LAST event's ts ≤ W. Matches whose tail is still
    above W wait in state.

    State per key after a flush = all events with ts > W plus the
    last (pattern_len − 1) events at-or-below W (the only ones a
    boundary-crossing match can still use — and, being fewer than a
    full pattern, they can never re-emit an old match). Memory is
    bounded by out-of-window arrivals + (k−1) × active keys.

    Every flush is one lexsort + the same shifted-comparison scan as
    the batch operator — no per-event Python."""

    def __init__(self, part_id: int, pattern: list[str],
                 within_us: int):
        if len(pattern) < 2:
            raise ValueError("pattern needs at least two steps")
        self.part_id = part_id
        self.pattern = list(pattern)
        self.within_us = within_us
        self._raw: list[tuple] = []
        self._kept = (np.empty(0, np.int64), np.empty(0, np.int64),
                      np.empty(0, object), np.empty(0, np.int64))
        self.max_ts = -(1 << 62)
        self.frontier = -(1 << 62)
        self.metrics = {"rows_in": 0, "matches_emitted": 0,
                        "late_dropped": 0}

    def ingest(self, ts: np.ndarray, eids: np.ndarray,
               keys: np.ndarray, types: np.ndarray) -> int:
        self.metrics["rows_in"] += len(ts)
        if len(ts):
            self.max_ts = max(self.max_ts, int(ts.max()))
        self._raw.append((ts, eids, keys, types))
        return len(ts)

    def ingest_refs(self, refs: list) -> int:
        """Reduce side of the engine's M×R feed shuffle: each plasma
        bundle is (ts, eid, key, type-codes, vocab) with the event
        type dictionary-encoded for the wire."""
        total = 0
        for ts, eids, keys, codes, vocab in ray.get(list(refs)):
            types = np.asarray(vocab, dtype=object)[codes]
            total += self.ingest(ts, eids, keys, types)
        return total

    def get_max_ts(self) -> int:
        return self.max_ts

    def flush(self, watermark_us: int) -> pa.Table:
        k = len(self.pattern)
        kts, keid, kkey, ktyp = self._kept
        if self._raw:
            ts = np.concatenate([c[0] for c in self._raw]).astype(np.int64)
            eid = np.concatenate([c[1] for c in self._raw]).astype(np.int64)
            key = np.concatenate([c[2] for c in self._raw]).astype(np.int64)
            typ = np.concatenate([c[3] for c in self._raw]).astype(object)
            self._raw = []
            on_time = ts > self.frontier
            n_late = int(len(ts) - on_time.sum())
            if n_late:
                self.metrics["late_dropped"] += n_late
                ts, eid = ts[on_time], eid[on_time]
                key, typ = key[on_time], typ[on_time]
            ts = np.concatenate([kts, ts])
            eid = np.concatenate([keid, eid])
            key = np.concatenate([kkey.astype(np.int64), key])
            typ = np.concatenate([ktyp, typ])
        else:
            ts, eid, key, typ = kts, keid, kkey.astype(np.int64), ktyp
        order = np.lexsort((eid, ts, key))
        ts, eid, key, typ = ts[order], eid[order], key[order], typ[order]
        n = len(ts)

        rows = {"key": np.empty(0, np.int64),
                "first_event_id": np.empty(0, np.int64),
                "last_event_id": np.empty(0, np.int64),
                "span_us": np.empty(0, np.int64)}
        if n >= k:
            m = np.ones(n - k + 1, bool)
            for j, want in enumerate(self.pattern):
                m &= typ[j:n - k + 1 + j] == want
            m &= key[k - 1:] == key[:n - k + 1]
            span = ts[k - 1:] - ts[:n - k + 1]
            m &= span <= self.within_us
            m &= ts[k - 1:] <= watermark_us     # tail is final
            idx = np.flatnonzero(m)
            rows = {"key": key[idx],
                    "first_event_id": eid[idx],
                    "last_event_id": eid[idx + k - 1],
                    "span_us": span[idx]}
            self.metrics["matches_emitted"] += len(idx)

        # retention: events above W entirely; at/below W only each
        # key's last (k-1) — vectorized over key segments
        if n:
            seg_start = np.zeros(n, np.int64)
            new_key = np.ones(n, bool)
            new_key[1:] = key[1:] != key[:-1]
            seg_start = np.maximum.accumulate(
                np.where(new_key, np.arange(n), 0))
            below = ts <= watermark_us
            # per position: count of ≤W rows in this key segment up to
            # and including it (≤W rows precede >W rows within a key)
            cum_below = np.cumsum(below)
            below_before_seg = np.concatenate(
                [[0], cum_below])[seg_start]
            below_in_seg_upto = cum_below - below_before_seg
            # total ≤W rows in the segment = value at the segment's
            # last ≤W row; propagate segment totals via segment ends
            seg_id = np.cumsum(new_key) - 1
            totals = np.zeros(seg_id[-1] + 1, np.int64)
            np.maximum.at(totals, seg_id, below_in_seg_upto)
            keep = (~below) | (below_in_seg_upto >
                               totals[seg_id] - (k - 1))
            self._kept = (ts[keep], eid[keep], key[keep], typ[keep])
        else:
            self._kept = (ts, eid, key, typ)
        self.frontier = max(self.frontier, watermark_us)
        return pa.table({
            "key": pa.array(rows["key"], pa.int64()),
            "first_event_id": pa.array(rows["first_event_id"],
                                       pa.int64()),
            "last_event_id": pa.array(rows["last_event_id"], pa.int64()),
            "span_us": pa.array(rows["span_us"], pa.int64()),
        })

    def snapshot(self) -> bytes:
        return pickle.dumps({"kept": self._kept, "max_ts": self.max_ts,
                             "frontier": self.frontier,
                             "metrics": self.metrics})

    def restore(self, blobs) -> None:
        if isinstance(blobs, (bytes, bytearray)):
            blobs = [blobs]
        st = pickle.loads(blobs[-1])
        self._kept = st["kept"]
        self.max_ts = st["max_ts"]
        self.frontier = st["frontier"]
        self.metrics = st["metrics"]
        self._raw = []

    def get_metrics(self) -> dict:
        return dict(self.metrics)


@ray.remote
class IntervalJoinWorker(_EpochCommitMixin):
    """Streaming stream-stream interval join: same-key (left, right)
    pairs with ``right.ts − left.ts ∈ [lower_us, upper_us]`` over two
    live streams (the streaming form of stages.join.interval_join,
    same pair semantics and lag column). Partitioned by hash(key).

    Finality rule: after a flush at watermark W every later-accepted
    event has ts > W, so a pair emits exactly at the first flush where
    the LATER of its two timestamps is ≤ W — both members must already
    be present then (a later arrival at-or-below W would be dropped as
    late), and re-emission is excluded by masking pairs whose max-ts
    the previous frontier already passed.

    State per side after a flush is bounded by the join span: a left
    row is dropped once ``max(ts, ts + upper_us) ≤ W`` (no retained or
    future right can pair with it and all its pairs are final); a
    right row once ``max(ts, ts − lower_us) ≤ W``. Memory is the
    in-span tail of each stream, independent of stream length.

    Every flush is one lexsort per side + two merge-rank passes
    (stages.join._rank_in_sorted) and pairs expand by repeat +
    cumulative offsets — no per-event Python."""

    def __init__(self, part_id: int, lower_us: int, upper_us: int):
        if lower_us > upper_us:
            raise ValueError("lower_us must be <= upper_us")
        self.part_id = part_id
        self.lower_us = int(lower_us)
        self.upper_us = int(upper_us)
        self._raw: list[tuple] = []          # (side, ts, eid, key)
        empty = lambda: (np.empty(0, np.int64), np.empty(0, np.int64),
                         np.empty(0, np.int64))
        self._kept = [empty(), empty()]      # per side: (ts, eid, key)
        self.max_ts = [-(1 << 62), -(1 << 62)]
        self.frontier = -(1 << 62)
        self.metrics = {"rows_in_left": 0, "rows_in_right": 0,
                        "pairs_emitted": 0, "late_dropped": 0}

    def ingest(self, side: int, ts: np.ndarray, eids: np.ndarray,
               keys: np.ndarray) -> int:
        self.metrics["rows_in_left" if side == 0 else
                     "rows_in_right"] += len(ts)
        if len(ts):
            self.max_ts[side] = max(self.max_ts[side], int(ts.max()))
        self._raw.append((side, ts, eids, keys))
        return len(ts)

    def ingest_refs(self, sides: list, refs: list) -> int:
        """Reduce side of the engine's M×R feed shuffle: the driver
        hands this worker its whole epoch's (side, blob-ref) list in
        one call; each blob is a plasma-resident (ts, eid, key) numpy
        bundle the ``ray.get`` maps zero-copy."""
        total = 0
        for side, chunk in zip(sides, ray.get(list(refs))):
            total += self.ingest(side, *chunk)
        return total

    def get_max_ts(self) -> list[int]:
        return list(self.max_ts)

    def _merge_side(self, side: int) -> tuple:
        kts, keid, kkey = self._kept[side]
        chunks = [c for c in self._raw if c[0] == side]
        if not chunks:
            return kts, keid, kkey
        ts = np.concatenate([c[1] for c in chunks]).astype(np.int64)
        eid = np.concatenate([c[2] for c in chunks]).astype(np.int64)
        key = np.concatenate([c[3] for c in chunks]).astype(np.int64)
        on_time = ts > self.frontier
        n_late = int(len(ts) - on_time.sum())
        if n_late:
            self.metrics["late_dropped"] += n_late
            ts, eid, key = ts[on_time], eid[on_time], key[on_time]
        return (np.concatenate([kts, ts]), np.concatenate([keid, eid]),
                np.concatenate([kkey, key]))

    def flush(self, watermark_us: int) -> pa.Table:
        from bento_ray.stages.join import _rank_in_sorted

        lt, li, lk = self._merge_side(0)
        rt, ri, rk = self._merge_side(1)
        self._raw = []

        outs = []
        if len(lt) and len(rt):
            r_order = np.lexsort((ri, rt, rk))
            rt, ri, rk = rt[r_order], ri[r_order], rk[r_order]
            # A pair with max(l.ts, r.ts) ≤ frontier was emitted at an
            # earlier flush, so enumerate only pairs with a NEW member
            # (ts > frontier): (new lefts × all rights) ∪ (old lefts ×
            # new rights). Per-flush work is then proportional to the
            # newly-formable pairs, not the whole in-span backlog —
            # without this, a span/epoch ratio of K re-scans every
            # surviving pair K times.
            l_new = lt > self.frontier
            r_new = rt > self.frontier
            for lsel, rsel in (
                    (l_new, slice(None)),
                    (~l_new, r_new)):
                ls_t, ls_i, ls_k = lt[lsel], li[lsel], lk[lsel]
                rs_t, rs_i, rs_k = rt[rsel], ri[rsel], rk[rsel]
                if not len(ls_t) or not len(rs_t):
                    continue
                lo = _rank_in_sorted(rs_k, rs_t, ls_k,
                                     ls_t + self.lower_us, "left")
                hi = _rank_in_sorted(rs_k, rs_t, ls_k,
                                     ls_t + self.upper_us, "right")
                counts = hi - lo
                total = int(counts.sum())
                if not total:
                    continue
                lrep = np.repeat(np.arange(len(ls_k)), counts)
                starts = np.cumsum(counts) - counts
                rpos = np.repeat(lo, counts) + (
                    np.arange(total) - np.repeat(starts, counts))
                lt_p, rt_p = ls_t[lrep], rs_t[rpos]
                pair_max = np.maximum(lt_p, rt_p)
                emit = (pair_max > self.frontier) & \
                       (pair_max <= watermark_us)
                idx = np.flatnonzero(emit)
                outs.append((ls_k[lrep][idx], ls_i[lrep][idx],
                             rs_i[rpos][idx], (rt_p - lt_p)[idx]))
                self.metrics["pairs_emitted"] += len(idx)
        if outs:
            out = {"key": np.concatenate([o[0] for o in outs]),
                   "left_id": np.concatenate([o[1] for o in outs]),
                   "right_id": np.concatenate([o[2] for o in outs]),
                   "lag_us": np.concatenate([o[3] for o in outs])}
        else:
            out = {"key": np.empty(0, np.int64),
                   "left_id": np.empty(0, np.int64),
                   "right_id": np.empty(0, np.int64),
                   "lag_us": np.empty(0, np.int64)}

        keep_l = np.maximum(lt, lt + self.upper_us) > watermark_us
        keep_r = np.maximum(rt, rt - self.lower_us) > watermark_us
        self._kept = [(lt[keep_l], li[keep_l], lk[keep_l]),
                      (rt[keep_r], ri[keep_r], rk[keep_r])]
        self.frontier = max(self.frontier, watermark_us)
        return pa.table({
            "key": pa.array(out["key"], pa.int64()),
            "left_id": pa.array(out["left_id"], pa.int64()),
            "right_id": pa.array(out["right_id"], pa.int64()),
            "lag_us": pa.array(out["lag_us"], pa.int64()),
        })

    def snapshot(self) -> bytes:
        return pickle.dumps({"kept": self._kept, "max_ts": self.max_ts,
                             "frontier": self.frontier,
                             "metrics": self.metrics})

    def restore(self, blobs) -> None:
        if isinstance(blobs, (bytes, bytearray)):
            blobs = [blobs]
        st = pickle.loads(blobs[-1])
        self._kept = st["kept"]
        self.max_ts = st["max_ts"]
        self.frontier = st["frontier"]
        self.metrics = st["metrics"]
        self._raw = []

    def get_metrics(self) -> dict:
        return dict(self.metrics)


@ray.remote
class AsofJoinWorker(_EpochCommitMixin):
    """Streaming as-of join: every left row emits exactly once with
    the LATEST same-key right row at-or-before its timestamp (ties on
    ts → largest right id — the batch operator's documented rule;
    left-join nulls when no right qualifies). The streaming form of
    stages.join.asof_join, same output schema. Partitioned by
    hash(key).

    Finality rule: a left row's match is final at the first flush
    whose watermark W reaches its timestamp — every right at-or-below
    l.ts has either arrived or will be dropped as late (ts ≤ W), so
    the emitted match can never be superseded.

    State per side after a flush: left rows with ts > W (not yet
    emitted); rights with ts > W plus, per key, the single
    lexicographically-last right at-or-below W — the only row below
    the watermark a FUTURE left (ts > W) can still match. Memory is
    the in-flight tail of both streams + one row per active key
    (the same shape as the session/dedupe state, TTL-able the same
    way if key cardinality is unbounded).

    Every flush is one lexsort per side + one merge-rank pass
    (stages.join._rank_in_sorted) — no per-event Python."""

    def __init__(self, part_id: int):
        self.part_id = part_id
        empty = lambda: (np.empty(0, np.int64), np.empty(0, np.int64),
                         np.empty(0, np.int64))
        self._raw: list[tuple] = []          # (side, ts, eid, key)
        self._kept = [empty(), empty()]      # per side: (ts, eid, key)
        self.max_ts = [-(1 << 62), -(1 << 62)]
        self.frontier = -(1 << 62)
        self.metrics = {"rows_in_left": 0, "rows_in_right": 0,
                        "rows_emitted": 0, "late_dropped": 0}

    def ingest(self, side: int, ts: np.ndarray, eids: np.ndarray,
               keys: np.ndarray) -> int:
        self.metrics["rows_in_left" if side == 0 else
                     "rows_in_right"] += len(ts)
        if len(ts):
            self.max_ts[side] = max(self.max_ts[side], int(ts.max()))
        self._raw.append((side, ts, eids, keys))
        return len(ts)

    def ingest_refs(self, sides: list, refs: list) -> int:
        """Reduce side of the engine's M×R feed shuffle — see
        IntervalJoinWorker.ingest_refs."""
        total = 0
        for side, chunk in zip(sides, ray.get(list(refs))):
            total += self.ingest(side, *chunk)
        return total

    def get_max_ts(self) -> list[int]:
        return list(self.max_ts)

    def _merge_side(self, side: int) -> tuple:
        kts, keid, kkey = self._kept[side]
        chunks = [c for c in self._raw if c[0] == side]
        if not chunks:
            return kts, keid, kkey
        ts = np.concatenate([c[1] for c in chunks]).astype(np.int64)
        eid = np.concatenate([c[2] for c in chunks]).astype(np.int64)
        key = np.concatenate([c[3] for c in chunks]).astype(np.int64)
        on_time = ts > self.frontier
        n_late = int(len(ts) - on_time.sum())
        if n_late:
            self.metrics["late_dropped"] += n_late
            ts, eid, key = ts[on_time], eid[on_time], key[on_time]
        return (np.concatenate([kts, ts]), np.concatenate([keid, eid]),
                np.concatenate([kkey, key]))

    def flush(self, watermark_us: int) -> pa.Table:
        from bento_ray.stages.join import _rank_in_sorted

        lt, li, lk = self._merge_side(0)
        rt, ri, rk = self._merge_side(1)
        self._raw = []

        r_order = np.lexsort((ri, rt, rk))
        rt, ri, rk = rt[r_order], ri[r_order], rk[r_order]

        emit = lt <= watermark_us
        le_t, le_i, le_k = lt[emit], li[emit], lk[emit]
        # deterministic output order within the partition
        l_order = np.lexsort((le_i, le_t, le_k))
        le_t, le_i, le_k = le_t[l_order], le_i[l_order], le_k[l_order]
        if len(rt):
            pos = _rank_in_sorted(rk, rt, le_k, le_t, "right") - 1
            safe = np.maximum(pos, 0)
            valid = (pos >= 0) & (rk[safe] == le_k)
        else:
            safe = np.zeros(len(le_k), np.int64)
            valid = np.zeros(len(le_k), bool)
        mask = ~valid
        rid = pa.array(np.where(valid, ri[safe] if len(rt) else 0, 0),
                       pa.int64(), mask=mask)
        rts = pa.array(np.where(valid, rt[safe] if len(rt) else 0, 0),
                       pa.int64(), mask=mask)
        lag = pa.array(
            np.where(valid, le_t - (rt[safe] if len(rt) else 0), 0),
            pa.int64(), mask=mask)
        self.metrics["rows_emitted"] += len(le_k)

        # retention — left: unemitted rows; right: rows above W plus
        # each key's lexicographically-last row at-or-below W
        keep_l = ~emit
        below = rt <= watermark_us
        keep_r = ~below
        if below.any():
            bidx = np.flatnonzero(below)
            bk = rk[bidx]
            seg_last = np.ones(len(bidx), bool)
            seg_last[:-1] = bk[1:] != bk[:-1]
            keep_r[bidx[seg_last]] = True
        self._kept = [(lt[keep_l], li[keep_l], lk[keep_l]),
                      (rt[keep_r], ri[keep_r], rk[keep_r])]
        self.frontier = max(self.frontier, watermark_us)
        return pa.table({
            "key": pa.array(le_k, pa.int64()),
            "left_id": pa.array(le_i, pa.int64()),
            "right_id": rid, "right_ts_us": rts, "lag_us": lag,
        })

    def snapshot(self) -> bytes:
        return pickle.dumps({"kept": self._kept, "max_ts": self.max_ts,
                             "frontier": self.frontier,
                             "metrics": self.metrics})

    def restore(self, blobs) -> None:
        if isinstance(blobs, (bytes, bytearray)):
            blobs = [blobs]
        st = pickle.loads(blobs[-1])
        self._kept = st["kept"]
        self.max_ts = st["max_ts"]
        self.frontier = st["frontier"]
        self.metrics = st["metrics"]
        self._raw = []

    def get_metrics(self) -> dict:
        return dict(self.metrics)


@ray.remote
class AbsenceWorker(_EpochCommitMixin):
    """Streaming CEP negation / timeout (Flink `notFollowedBy` within a
    bound — the alerting shape: "signup with NO purchase inside the
    window"): the streaming form of stages.cep.match_absence, same
    output schema and (ts, id)-order semantics. Partitioned by
    hash(key).

    This is the watermark-fired timeout timer made explicit: a
    ``first``-type event's verdict is final exactly when the watermark
    reaches ``ts + within_us`` — every ``absent``-type event that
    could suppress it has either arrived or will be dropped as late —
    and it emits at that flush iff no same-key ``absent`` event lies
    strictly after it (in (ts, id) order) within the bound.

    State after a flush at W is every retained event with
    ``ts > W − within_us`` (pending starts and the only absent events
    a pending or future start can still see) — bounded by the timeout
    span, independent of stream length.

    Every flush is one lexsort + ONE suffix-min next-occurrence pass —
    the same vectorized scan as the batch operator."""

    def __init__(self, part_id: int, first: str, absent: str,
                 within_us: int):
        self.part_id = part_id
        self.first = first
        self.absent = absent
        self.within_us = int(within_us)
        self._raw: list[tuple] = []
        self._kept = (np.empty(0, np.int64), np.empty(0, np.int64),
                      np.empty(0, object), np.empty(0, np.int64))
        self.max_ts = -(1 << 62)
        self.frontier = -(1 << 62)
        self.metrics = {"rows_in": 0, "alerts_emitted": 0,
                        "late_dropped": 0}

    def ingest(self, ts: np.ndarray, eids: np.ndarray,
               keys: np.ndarray, types: np.ndarray) -> int:
        self.metrics["rows_in"] += len(ts)
        if len(ts):
            self.max_ts = max(self.max_ts, int(ts.max()))
        self._raw.append((ts, eids, keys, types))
        return len(ts)

    def ingest_refs(self, refs: list) -> int:
        """Reduce side of the engine's M×R feed shuffle: each plasma
        bundle is (ts, eid, key, type-codes, vocab) with the event
        type dictionary-encoded for the wire."""
        total = 0
        for ts, eids, keys, codes, vocab in ray.get(list(refs)):
            types = np.asarray(vocab, dtype=object)[codes]
            total += self.ingest(ts, eids, keys, types)
        return total

    def get_max_ts(self) -> int:
        return self.max_ts

    def flush(self, watermark_us: int) -> pa.Table:
        kts, keid, kkey, ktyp = self._kept
        if self._raw:
            ts = np.concatenate([c[0] for c in self._raw]).astype(np.int64)
            eid = np.concatenate([c[1] for c in self._raw]).astype(np.int64)
            key = np.concatenate([c[2] for c in self._raw]).astype(np.int64)
            typ = np.concatenate([c[3] for c in self._raw]).astype(object)
            self._raw = []
            on_time = ts > self.frontier
            relevant = (typ == self.first) | (typ == self.absent)
            keep_new = on_time & relevant
            n_late = int(len(ts) - on_time.sum())
            if n_late:
                self.metrics["late_dropped"] += n_late
            ts = np.concatenate([kts, ts[keep_new]])
            eid = np.concatenate([keid, eid[keep_new]])
            key = np.concatenate([kkey.astype(np.int64), key[keep_new]])
            typ = np.concatenate([ktyp, typ[keep_new]])
        else:
            ts, eid, key, typ = kts, keid, kkey.astype(np.int64), ktyp
        order = np.lexsort((eid, ts, key))
        ts, eid, key, typ = ts[order], eid[order], key[order], typ[order]
        n = len(ts)

        out_key = np.empty(0, np.int64)
        out_id = np.empty(0, np.int64)
        if n:
            pos_if = np.where(typ == self.absent, np.arange(n), n)
            suffmin = np.minimum.accumulate(pos_if[::-1])[::-1]
            nxt = np.concatenate([suffmin[1:], [n]])
            starts = np.flatnonzero(typ == self.first)
            if len(starts):
                landed = nxt[starts]
                safe = np.minimum(landed, n - 1)
                present = (landed < n) & (key[safe] == key[starts]) & \
                    (ts[safe] - ts[starts] <= self.within_us)
                expire = ts[starts] + self.within_us
                emit = (~present) & (expire > self.frontier) & \
                    (expire <= watermark_us)
                idx = starts[emit]
                out_key, out_id = key[idx], eid[idx]
                self.metrics["alerts_emitted"] += len(idx)

        keep = ts > watermark_us - self.within_us
        self._kept = (ts[keep], eid[keep], key[keep], typ[keep])
        self.frontier = max(self.frontier, watermark_us)
        return pa.table({
            "key": pa.array(out_key, pa.int64()),
            "first_event_id": pa.array(out_id, pa.int64()),
        })

    def snapshot(self) -> bytes:
        return pickle.dumps({"kept": self._kept, "max_ts": self.max_ts,
                             "frontier": self.frontier,
                             "metrics": self.metrics})

    def restore(self, blobs) -> None:
        if isinstance(blobs, (bytes, bytearray)):
            blobs = [blobs]
        st = pickle.loads(blobs[-1])
        self._kept = st["kept"]
        self.max_ts = st["max_ts"]
        self.frontier = st["frontier"]
        self.metrics = st["metrics"]
        self._raw = []

    def get_metrics(self) -> dict:
        return dict(self.metrics)


@ray.remote
class FollowedByWorker(_EpochCommitMixin):
    """Streaming relaxed-contiguity CEP (Flink `followedBy` /
    skip-till-next): the live form of stages.cep.match_followed_by,
    same chain rule (every ``pattern[0]`` event chains to the EARLIEST
    later occurrence of each next step, same key, total span ≤
    within_us) and output schema. Partitioned by hash(key).

    Finality: a chain is EAGERLY final at the first flush whose
    watermark W reaches its tail — any event that could change an
    earliest-next link would have to sort before an existing node
    (ts ≤ tail ≤ W) and such an arrival is dropped as late after this
    flush. Chains whose tail the previous frontier already passed were
    identical then (later arrivals are all later than their nodes) and
    were emitted then, so the emission mask
    ``frontier < tail_ts ≤ W`` is exactly-once. A start with no
    completed chain resolves silently once W ≥ start_ts + within_us.

    State: every retained event has ``ts > W − within_us`` — pending
    starts and every candidate an unresolved chain can still reach —
    bounded by the pattern span, independent of stream length.

    Every flush is one lexsort + one suffix-min pass per distinct
    pattern step + len(pattern) vectorized landing rounds — the same
    scan as the batch operator."""

    def __init__(self, part_id: int, pattern: list[str],
                 within_us: int):
        if len(pattern) < 2:
            raise ValueError("pattern needs at least two steps")
        self.part_id = part_id
        self.pattern = list(pattern)
        self.within_us = int(within_us)
        self._raw: list[tuple] = []
        self._kept = (np.empty(0, np.int64), np.empty(0, np.int64),
                      np.empty(0, object), np.empty(0, np.int64))
        self.max_ts = -(1 << 62)
        self.frontier = -(1 << 62)
        self.metrics = {"rows_in": 0, "matches_emitted": 0,
                        "late_dropped": 0}

    def ingest(self, ts: np.ndarray, eids: np.ndarray,
               keys: np.ndarray, types: np.ndarray) -> int:
        self.metrics["rows_in"] += len(ts)
        if len(ts):
            self.max_ts = max(self.max_ts, int(ts.max()))
        self._raw.append((ts, eids, keys, types))
        return len(ts)

    def ingest_refs(self, refs: list) -> int:
        """Reduce side of the engine's M×R feed shuffle: each plasma
        bundle is (ts, eid, key, type-codes, vocab) with the event
        type dictionary-encoded for the wire."""
        total = 0
        for ts, eids, keys, codes, vocab in ray.get(list(refs)):
            types = np.asarray(vocab, dtype=object)[codes]
            total += self.ingest(ts, eids, keys, types)
        return total

    def get_max_ts(self) -> int:
        return self.max_ts

    def flush(self, watermark_us: int) -> pa.Table:
        kts, keid, kkey, ktyp = self._kept
        if self._raw:
            ts = np.concatenate([c[0] for c in self._raw]).astype(np.int64)
            eid = np.concatenate([c[1] for c in self._raw]).astype(np.int64)
            key = np.concatenate([c[2] for c in self._raw]).astype(np.int64)
            typ = np.concatenate([c[3] for c in self._raw]).astype(object)
            self._raw = []
            on_time = ts > self.frontier
            relevant = np.isin(typ, list(set(self.pattern)))
            keep_new = on_time & relevant
            n_late = int(len(ts) - on_time.sum())
            if n_late:
                self.metrics["late_dropped"] += n_late
            ts = np.concatenate([kts, ts[keep_new]])
            eid = np.concatenate([keid, eid[keep_new]])
            key = np.concatenate([kkey.astype(np.int64), key[keep_new]])
            typ = np.concatenate([ktyp, typ[keep_new]])
        else:
            ts, eid, key, typ = kts, keid, kkey.astype(np.int64), ktyp
        order = np.lexsort((eid, ts, key))
        ts, eid, key, typ = ts[order], eid[order], key[order], typ[order]
        n = len(ts)

        out_key = np.empty(0, np.int64)
        out_first = np.empty(0, np.int64)
        out_last = np.empty(0, np.int64)
        out_span = np.empty(0, np.int64)
        if n >= len(self.pattern):
            nxt = {}
            for want in set(self.pattern[1:]):
                pos_if = np.where(typ == want, np.arange(n), n)
                suffmin = np.minimum.accumulate(pos_if[::-1])[::-1]
                nxt[want] = np.concatenate([suffmin[1:], [n]])
            cur = np.flatnonzero(typ == self.pattern[0])
            starts = cur
            alive = np.ones(len(cur), bool)
            for want in self.pattern[1:]:
                landed = nxt[want][np.minimum(cur, n - 1)]
                landed[cur >= n] = n
                alive &= landed < n
                safe = np.minimum(landed, n - 1)
                alive &= key[safe] == key[np.minimum(starts, n - 1)]
                cur = np.where(alive, landed, n)
            ok = np.flatnonzero(alive)
            if len(ok):
                first, last = starts[ok], cur[ok]
                span = ts[last] - ts[first]
                tail = ts[last]
                emit = (span <= self.within_us) & \
                       (tail > self.frontier) & (tail <= watermark_us)
                first, last = first[emit], last[emit]
                out_key = key[first]
                out_first, out_last = eid[first], eid[last]
                out_span = ts[last] - ts[first]
                self.metrics["matches_emitted"] += len(first)

        keep = ts > watermark_us - self.within_us
        self._kept = (ts[keep], eid[keep], key[keep], typ[keep])
        self.frontier = max(self.frontier, watermark_us)
        return pa.table({
            "key": pa.array(out_key, pa.int64()),
            "first_event_id": pa.array(out_first, pa.int64()),
            "last_event_id": pa.array(out_last, pa.int64()),
            "span_us": pa.array(out_span, pa.int64()),
        })

    def snapshot(self) -> bytes:
        return pickle.dumps({"kept": self._kept, "max_ts": self.max_ts,
                             "frontier": self.frontier,
                             "metrics": self.metrics})

    def restore(self, blobs) -> None:
        if isinstance(blobs, (bytes, bytearray)):
            blobs = [blobs]
        st = pickle.loads(blobs[-1])
        self._kept = st["kept"]
        self.max_ts = st["max_ts"]
        self.frontier = st["frontier"]
        self.metrics = st["metrics"]
        self._raw = []

    def get_metrics(self) -> dict:
        return dict(self.metrics)
