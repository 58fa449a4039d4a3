from bento_ray.streaming.checkpoint import ExactlyOnceParquetSink
from bento_ray.streaming.engine import StreamConfig, run_stream

__all__ = ["StreamConfig", "run_stream", "ExactlyOnceParquetSink"]
