"""bento_ray — a Ray-Data-native structured-streaming / data-processing engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference stream processor (warpstreamlabs/bento, a
Go channel-and-goroutine engine) re-expressed Ray-Data-first:

- every per-record operator is a vectorized ``map_batches`` transform over
  zero-copy Arrow batches;
- stateful components (windows, dedupe state, caches, stream-table join
  state) are actor-pool stages partitioned by key hash;
- wide operations use ``groupby`` / ``sort`` / ``repartition`` with
  two-phase (partial + final) aggregation to bound shuffle volume;
- the sink is an exactly-once idempotent Parquet writer with
  per-partition write-ahead intents and an atomic commit manifest.

Nothing in this package calls ``ray.init()`` — the driver, ``bench.py``
or the test fixture own the Ray session.
"""

from bento_ray.html import strip_html
from bento_ray.schema import PAGES_SCHEMA
from bento_ray.util import quiet_benign_ray_warnings

# install the filter for Ray's known-benign empty-schema-divergence
# warning (see util._BenignEmptySchemaDivergence); pure logging config,
# no Ray session is touched
quiet_benign_ray_warnings()

__all__ = ["strip_html", "PAGES_SCHEMA"]
__version__ = "0.1.0"
