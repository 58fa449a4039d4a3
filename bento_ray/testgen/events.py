"""Deterministic synthetic two-sided event streams (click / purchase)
for benchmarking the stateful stream-stream join drivers at scale.

Every row is a pure function of (seed, side, row_id): timestamps are a
prefix sum of seeded integer gaps (time-ordered within a side, the
stream arrival order), keys are a seeded hash of the row id into a
fixed user universe, event ids are globally unique. Files are
contiguous time slices, so the per-file feed tasks deliver each side in
event-time order — the same shape a Kafka-partition replay would have.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS_US = 1_704_067_200_000_000   # 2024-01-01T00:00:00Z
MEAN_GAP_US = 100_000                # one event per ~100 ms per side


def _side_table(n: int, seed: int, side: int, users: int) -> pa.Table:
    rng = np.random.RandomState(seed * 7919 + side)
    gaps = rng.randint(MEAN_GAP_US // 2, MEAN_GAP_US * 3 // 2,
                       size=n).astype(np.int64)
    ts = BASE_TS_US + np.cumsum(gaps)
    user = rng.randint(0, users, size=n).astype(np.int64)
    eid = (np.arange(n, dtype=np.int64) * 2 + side)  # globally unique
    return pa.table({
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(user),
        "event_id": pa.array(eid),
    })


def ensure_event_streams(n_per_side: int, seed: int = 42,
                         files: int = 64, users: int | None = None,
                         cache_root: str = "/tmp/bento_ray_events"
                         ) -> tuple[str, str]:
    """Generate (once, cached) the two stream directories and return
    (left_dir, right_dir). ``users`` defaults to n/2000 so per-user
    event rates — and therefore join fan-out — stay constant as the
    corpus scales."""
    if users is None:
        users = max(64, n_per_side // 2000)
    root = os.path.join(cache_root,
                        f"n{n_per_side}_s{seed}_f{files}_u{users}")
    left, right = os.path.join(root, "left"), os.path.join(root, "right")
    done = os.path.join(root, "_SUCCESS")
    if os.path.exists(done):
        return left, right
    os.makedirs(left, exist_ok=True)
    os.makedirs(right, exist_ok=True)
    shard = (n_per_side + files - 1) // files
    for side, d in ((0, left), (1, right)):
        t = _side_table(n_per_side, seed, side, users)
        for f in range(files):
            lo, hi = f * shard, min((f + 1) * shard, n_per_side)
            if lo >= hi:
                break
            pq.write_table(t.slice(lo, hi - lo),
                           os.path.join(d, f"ev-{f:05d}.parquet"))
    with open(done, "w") as fh:
        fh.write("ok")
    return left, right
