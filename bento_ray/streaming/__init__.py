"""Streaming engine public surface.

Lazy re-exports (PEP 562): every stream worker actor lives in
``bento_ray.streaming.actors``, and importing THAT module in a fresh
Ray worker process first executes this package ``__init__`` — an eager
``from .engine import …`` here put the whole driver-side engine (and
its import closure) on the cold-start path of all P state actors,
a measurable slice of per-run ramp time at high parallelism. The
driver pays the same import once either way."""

_EXPORTS = {
    "StreamConfig": "engine",
    "run_stream": "engine",
    "run_session_stream": "engine",
    "run_cep_stream": "engine",
    "run_absence_stream": "engine",
    "run_followed_by_stream": "engine",
    "run_interval_join_stream": "engine",
    "run_asof_join_stream": "engine",
    "ExactlyOnceParquetSink": "checkpoint",
}

__all__ = list(_EXPORTS)


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(
            f"bento_ray.streaming.{_EXPORTS[name]}")
        val = getattr(mod, name)
        globals()[name] = val
        return val
    raise AttributeError(
        f"module 'bento_ray.streaming' has no attribute {name!r}")
