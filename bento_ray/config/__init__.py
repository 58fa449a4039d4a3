"""YAML config front-end: env interpolation, ${! } fields,
message-level processors, and the `bento test` golden runner."""

from bento_ray.config.envsubst import interpolate_env  # noqa: F401
from bento_ray.config.field import InterpolatedField  # noqa: F401
from bento_ray.config.processors import (  # noqa: F401
    Runtime, build_cache, build_processor, run_processors,
)
from bento_ray.config.testrunner import (  # noqa: F401
    TestFailure, run_config_tests,
)
