from bento_ray.streaming.checkpoint import ExactlyOnceParquetSink
from bento_ray.streaming.engine import (
    StreamConfig,
    run_absence_stream,
    run_asof_join_stream,
    run_cep_stream,
    run_followed_by_stream,
    run_interval_join_stream,
    run_session_stream,
    run_stream,
)

__all__ = [
    "StreamConfig",
    "run_stream",
    "run_session_stream",
    "run_cep_stream",
    "run_absence_stream",
    "run_followed_by_stream",
    "run_interval_join_stream",
    "run_asof_join_stream",
    "ExactlyOnceParquetSink",
]
