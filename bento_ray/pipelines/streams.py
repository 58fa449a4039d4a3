"""Streams mode — named multi-pipeline management.

Reference: ``bento streams`` (internal/stream/manager/type.go:130-233):
a manager holding named streams with create / read / update / delete
and per-stream status. Here a stream is a bounded Ray Dataset pipeline
(built from a YAML config or a Pipeline) plus its run state; ``run``
executes one stream to its sink, ``run_all`` executes every idle
stream. Bounded-batch semantics: each run is one complete pass of the
input (the micro-batch analog of the reference's continuous streams —
the continuous engine lives in bento_ray.streaming).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class StreamInfo:
    name: str
    config: object                      # Pipeline or raw YAML text
    active: bool = False
    runs: int = 0
    last_error: str | None = None
    last_rows: int | None = None
    last_duration_sec: float | None = None
    created_at: float = field(default_factory=time.time)
    updated_at: float = field(default_factory=time.time)


class StreamManager:
    """CRUD manager for named pipelines (type.go:130-233 semantics:
    create fails if the name exists, update replaces the config,
    delete removes; status reports run state)."""

    def __init__(self):
        self._streams: dict[str, StreamInfo] = {}

    def create(self, name: str, config) -> None:
        if name in self._streams:
            raise ValueError(f"stream {name!r} already exists")
        self._streams[name] = StreamInfo(name=name, config=config)

    def read(self, name: str) -> StreamInfo:
        if name not in self._streams:
            raise KeyError(f"stream {name!r} does not exist")
        return self._streams[name]

    def update(self, name: str, config) -> None:
        info = self.read(name)
        info.config = config
        info.updated_at = time.time()

    def delete(self, name: str) -> None:
        if name not in self._streams:
            raise KeyError(f"stream {name!r} does not exist")
        del self._streams[name]

    def list(self) -> dict[str, dict]:
        return {n: {"active": s.active, "runs": s.runs,
                    "last_error": s.last_error,
                    "last_rows": s.last_rows,
                    "uptime_sec": time.time() - s.created_at}
                for n, s in self._streams.items()}

    # -- execution -----------------------------------------------------
    def _build(self, info: StreamInfo):
        from bento_ray.pipelines.builder import Pipeline

        cfg = info.config
        if isinstance(cfg, Pipeline):
            return cfg
        if isinstance(cfg, str):
            return Pipeline.from_yaml(cfg)
        if isinstance(cfg, dict):
            return Pipeline.from_spec(cfg)
        raise TypeError(f"unsupported stream config {type(cfg)}")

    def run(self, name: str, sink=None):
        """Execute one bounded pass. ``sink(dataset)`` consumes the
        plan (defaults to counting — a materialising no-op sink)."""
        info = self.read(name)
        info.active = True
        t0 = time.perf_counter()
        try:
            p = self._build(info)
            ds = p.dataset()
            if sink is not None:
                result = sink(ds)
                info.last_rows = result if isinstance(result, int) else None
            else:
                info.last_rows = ds.count()
            info.last_error = None
            return info.last_rows
        except Exception as e:  # noqa: BLE001
            info.last_error = str(e)
            raise
        finally:
            info.active = False
            info.runs += 1
            info.last_duration_sec = time.perf_counter() - t0

    def run_all(self, sinks: dict | None = None) -> dict:
        out = {}
        for name in list(self._streams):
            out[name] = self.run(name, (sinks or {}).get(name))
        return out
