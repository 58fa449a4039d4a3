from bento_ray.pipelines.flagship import (
    dim_versions_table,
    flagship_batch,
    flagship_streaming,
)

__all__ = ["flagship_batch", "flagship_streaming", "dim_versions_table"]
