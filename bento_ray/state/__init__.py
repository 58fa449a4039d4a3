from bento_ray.state.store import CacheActor, CacheClient, LocalCache

__all__ = ["CacheActor", "CacheClient", "LocalCache"]
