"""Lightweight pipeline metrics — the reference's auto-observed
processor counters (processor_received/_sent/_error, input_received,
output_sent — internal/component/processor/auto_observed.go:78-82) and
the Bloblang ``count(name)`` shared counter, as a zero-CPU counter
actor.

Usage:

    reg = MetricsRegistry()
    ds = metric_stage(ds, reg, "extract")     # counts rows+batches through
    ... run pipeline ...
    reg.snapshot()   # {'extract.batches': 12, 'extract.rows': 98304, ...}

The tap adds one fire-and-forget actor call per BATCH (not per row);
final counts are exact once the pipeline has been consumed.

Caveat: counts are per plan EXECUTION. A lazy Dataset consumed twice
(or fanned out to consumers that each re-execute, e.g. ``split`` +
multiple sinks) counts twice — ``materialize()`` upstream of the fan
for once-only counts, mirroring how the reference counts per delivered
message, not per source record.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import pyarrow.compute as pc

import ray


@ray.remote(num_cpus=0)
class _CounterActor:
    def __init__(self):
        self.counts: dict[str, int] = defaultdict(int)

    def add(self, name: str, n: int = 1) -> None:
        self.counts[name] += n

    def add_many(self, items: dict[str, int]) -> None:
        for k, v in items.items():
            self.counts[k] += v

    def next_value(self, name: str) -> int:
        """The Bloblang ``count(name)`` contract: a named shared counter
        returning 1, 2, 3, … across the whole pipeline."""
        self.counts[name] += 1
        return self.counts[name]

    def snapshot(self) -> dict:
        return dict(self.counts)

    def reset(self) -> None:
        self.counts.clear()


class MetricsRegistry:
    """Driver-facing handle around one shared counter actor."""

    def __init__(self):
        self.actor = _CounterActor.remote()

    def counter_next(self, name: str) -> int:
        return ray.get(self.actor.next_value.remote(name))

    def snapshot(self) -> dict:
        return ray.get(self.actor.snapshot.remote())

    def reset(self) -> None:
        ray.get(self.actor.reset.remote())


def metric_stage(ds, registry: MetricsRegistry, name: str,
                 err_col: str = "err"):
    """Identity tap counting batches / rows / errored rows through a
    point in the plan (the ``metric`` processor + auto-observed
    counters)."""
    actor = registry.actor

    def _tap(t: pa.Table) -> pa.Table:
        counts = {f"{name}.batches": 1, f"{name}.rows": len(t)}
        if err_col in t.column_names:
            counts[f"{name}.errors"] = int(
                pc.sum(pc.is_valid(t.column(err_col)).cast(pa.int64()))
                .as_py() or 0)
        # ack the add: actor ordering is per-submitter, so a
        # fire-and-forget from a worker process could land AFTER the
        # driver's snapshot() even though the pipeline was consumed.
        # One tiny actor round-trip per BATCH is noise next to the
        # batch's own compute, and makes "exact once consumed" true.
        ray.get(actor.add_many.remote(counts))
        return t

    return ds.map_batches(_tap, batch_format="pyarrow")
