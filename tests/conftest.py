import os

import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    os.environ.setdefault("RAY_DEDUP_LOGS", "1")
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_small(tmp_path_factory):
    """A small cached pages corpus (deterministic, seed=42)."""
    from bento_ray.testgen import ensure_pages_dataset

    return ensure_pages_dataset(3000, seed=42,
                                cache_root=str(tmp_path_factory.mktemp("pages")),
                                files=6)
