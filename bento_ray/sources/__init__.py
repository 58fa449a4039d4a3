from bento_ray.sources.inputs import (
    broker,
    from_generate,
    read_csv,
    read_json,
    read_lines,
    read_parquet,
    read_until,
    register_stream,
    resource,
    sequence,
)

__all__ = [
    "read_parquet",
    "read_csv",
    "read_json",
    "read_lines",
    "from_generate",
    "sequence",
    "broker",
    "read_until",
    "register_stream",
    "resource",
]
