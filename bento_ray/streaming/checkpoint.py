"""Exactly-once idempotent Parquet sink with per-partition write-ahead
intents, atomic commit manifest and lineage metadata.

The reference is at-least-once only (SURVEY.md §1.1 — in-process ack
tree, no durable state); this sink is the new design the north rule
requires. Protocol per (epoch E, output partition P):

1. WAL intent ``_wal/epoch={E}/part={P}.json`` — written (tmp+rename)
   BEFORE any data file; records what is about to be written.
2. Data file ``data/part-{P:05d}-{E:05d}.parquet`` — deterministic name,
   written to a tmp path then atomically renamed. A re-execution after a
   crash rewrites the same bytes to the same name (idempotent).
3. Commit record ``_manifest/epoch={E}/part={P}.json`` — atomic rename;
   its existence marks the partition ACKED. Carries lineage: input
   description, watermark, row count, write timestamp.
4. ``_manifest/epoch={E}/_EPOCH_DONE`` once every partition of the epoch
   committed (plus engine-state snapshot pointers).

Resume: ``committed(E, P)`` partitions are skipped (their data file is
already final); uncommitted partitions are replayed — deterministic
inputs + deterministic filenames ⇒ the rewrite is a no-op-equivalent
overwrite, giving exactly-once *output* under at-least-once execution.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _atomic_write(path: str, payload: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(payload)
    os.replace(tmp, path)


class ExactlyOnceParquetSink:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.wal_dir = os.path.join(out_dir, "_wal")
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        for d in (self.data_dir, self.wal_dir, self.manifest_dir):
            os.makedirs(d, exist_ok=True)

    # -- paths --------------------------------------------------------
    def _wal_path(self, epoch: int, part: int) -> str:
        d = os.path.join(self.wal_dir, f"epoch={epoch}")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"part={part}.json")

    def _commit_path(self, epoch: int, part: int) -> str:
        d = os.path.join(self.manifest_dir, f"epoch={epoch}")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"part={part}.json")

    def data_path(self, epoch: int, part: int) -> str:
        return os.path.join(self.data_dir, f"part-{part:05d}-{epoch:05d}.parquet")

    # -- protocol -----------------------------------------------------
    def committed(self, epoch: int, part: int) -> bool:
        return os.path.exists(self._commit_path(epoch, part))

    def epoch_done(self, epoch: int) -> bool:
        return os.path.exists(
            os.path.join(self.manifest_dir, f"epoch={epoch}", "_EPOCH_DONE"))

    def last_done_epoch(self) -> int:
        """Highest epoch E such that epochs 0..E all have _EPOCH_DONE;
        -1 when none."""
        e = 0
        while self.epoch_done(e):
            e += 1
        return e - 1

    def write_partition(self, epoch: int, part: int, table: pa.Table,
                        lineage: dict | None = None) -> bool:
        """Idempotently write one output partition. Returns False when
        the partition was already committed (skipped — this is the
        'replay only unacked partitions' path)."""
        if self.committed(epoch, part):
            return False
        intent = {
            "epoch": epoch,
            "partition": part,
            "rows": table.num_rows,
            "data_file": self.data_path(epoch, part),
            "lineage": lineage or {},
        }
        _atomic_write(self._wal_path(epoch, part), json.dumps(intent))
        tmp = self.data_path(epoch, part) + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, self.data_path(epoch, part))
        commit = dict(intent)
        commit["committed_at"] = time.time()
        _atomic_write(self._commit_path(epoch, part), json.dumps(commit))
        return True

    def finish_epoch(self, epoch: int, meta: dict | None = None) -> None:
        _atomic_write(
            os.path.join(self.manifest_dir, f"epoch={epoch}", "_EPOCH_DONE"),
            json.dumps(meta or {}),
        )

    # -- introspection ------------------------------------------------
    def epoch_lineage(self, epoch: int) -> dict:
        """The lineage dict recorded for a committed epoch (every
        partition of an epoch carries the same lineage; the first
        commit record found is returned). {} when nothing committed."""
        d = os.path.join(self.manifest_dir, f"epoch={epoch}")
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                if f.startswith("part="):
                    with open(os.path.join(d, f)) as fh:
                        return json.load(fh).get("lineage", {})
        return {}

    def lineage(self) -> list[dict]:
        # NUMERIC epoch/partition order: a lexicographic listdir sort
        # interleaves epoch=10 between epoch=1 and epoch=2 once the
        # run passes 10 epochs, scrambling replay/watermark reads
        def _num(name: str) -> tuple:
            head, _, tail = name.partition("=")
            tail = tail.split(".")[0]
            return (0, int(tail)) if tail.isdigit() else (1, name)

        out = []
        for ed in sorted(os.listdir(self.manifest_dir),
                         key=lambda n: _num(n)):
            d = os.path.join(self.manifest_dir, ed)
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d), key=lambda n: _num(n)):
                if f.startswith("part="):
                    with open(os.path.join(d, f)) as fh:
                        out.append(json.load(fh))
        return out

    def committed_files(self) -> list[str]:
        return [rec["data_file"] for rec in self.lineage() if rec["rows"] > 0]

    def read(self):
        """The committed output as a Dataset (only manifest-listed files
        — orphaned data files from failed runs are invisible)."""
        import ray.data as rd

        files = self.committed_files()
        if not files:
            return None
        return rd.read_parquet(files)
