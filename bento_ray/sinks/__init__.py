from bento_ray.sinks.outputs import (
    drop,
    fallback,
    fan_out,
    reject_errored,
    retry_sink,
    round_robin,
    switch_output,
    write_csv,
    write_json,
    write_parquet,
)

__all__ = [
    "write_parquet",
    "write_csv",
    "write_json",
    "drop",
    "switch_output",
    "fan_out",
    "fallback",
    "retry_sink",
    "reject_errored",
    "round_robin",
]
