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


def _url_side_draws(n: int, seed: int, side: int, pages: int
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The seeded numeric draws for one side — cheap (pure numpy) and
    sequential by necessity (one RandomState stream, cumsum ts). The
    expensive elementwise string assembly is split out so corpus
    generation can fan the per-file chunks across a process pool
    without changing a single output value."""
    rng = np.random.RandomState(seed * 104729 + side)
    gaps = rng.randint(MEAN_GAP_US // 2, MEAN_GAP_US * 3 // 2,
                       size=n).astype(np.int64)
    ts = BASE_TS_US + np.cumsum(gaps)
    page = rng.randint(0, pages, size=n)
    v = rng.randint(0, 6, size=n)
    return ts, page, v


def _url_chunk_table(ts: np.ndarray, page: np.ndarray, v: np.ndarray,
                     lo: int, side: int, pages: int) -> pa.Table:
    """Elementwise messy-url assembly for one contiguous chunk.

    Every op here is row-local, so chunked output is identical to the
    original whole-side pandas pipeline."""
    import pandas as pd

    n = len(ts)
    ndom = max(16, pages // 16)
    dom = pd.Series(page % ndom).astype(str)
    pid = pd.Series(page).astype(str)
    host = "site" + dom + ".example.com"
    path = "/p/" + pid

    v = pd.Series(v)
    host = host.where(v != 1, host.str.upper())
    host = ("www." + host).where(v == 2, host)
    host = (host + ":443").where(v == 3, host)
    q = pd.Series(np.where(v == 4, "?utm_source=ad&utm_campaign=c", ""))
    path = (path + "/").where(v == 5, path)
    url = "https://" + host + path + q

    eid = (np.arange(lo, lo + n, dtype=np.int64) * 2 + side)
    return pa.table({
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "url": pa.array(url, pa.string()),
        "event_id": pa.array(eid),
    })


def _url_side_table(n: int, seed: int, side: int, pages: int) -> pa.Table:
    """One side of the click→conversion corpus: every event references
    a canonical landing page through a seeded MESSY url variant
    (mixed-case host, ``www.`` prefix, default port, ``utm_*`` tracking
    params, trailing slash) so the feed stage must do real
    canonicalization work — exactly the per-event cost profile of a
    production clickstream — and the join key only exists AFTER
    textops.urlops.canonicalize_batch unifies the variants."""
    ts, page, v = _url_side_draws(n, seed, side, pages)
    return _url_chunk_table(ts, page, v, 0, side, pages)


def _write_url_chunk(args) -> None:
    path, ts, page, v, lo, side, pages = args
    pq.write_table(_url_chunk_table(ts, page, v, lo, side, pages), path)


def ensure_url_event_streams(n_per_side: int, seed: int = 42,
                             files: int = 64, pages: int | None = None,
                             cache_root: str = "/tmp/bento_ray_url_events"
                             ) -> tuple[str, str]:
    """Generate (once, cached) the click/conversion stream pair keyed
    by messy landing-page URLs; returns (clicks_dir, conversions_dir).
    ``pages`` defaults to n/2000 so per-page event rates — and join
    fan-out — stay constant as the corpus scales."""
    if pages is None:
        pages = max(64, n_per_side // 2000)
    root = os.path.join(cache_root,
                        f"n{n_per_side}_s{seed}_f{files}_p{pages}")
    left, right = os.path.join(root, "left"), os.path.join(root, "right")
    done = os.path.join(root, "_SUCCESS")
    if os.path.exists(done):
        return left, right
    os.makedirs(left, exist_ok=True)
    os.makedirs(right, exist_ok=True)
    shard = (n_per_side + files - 1) // files
    # The string assembly dominates generation cost at benchmark scale
    # (~1 µs/row/op in pandas object space); fan the per-file chunks
    # across a process pool. Values are identical to the sequential
    # path — the seeded draws stay one sequential stream per side and
    # only the elementwise assembly is chunked.
    parallel = n_per_side >= 2_000_000 and files > 1
    jobs = []
    for side, d in ((0, left), (1, right)):
        if parallel:
            ts, page, v = _url_side_draws(n_per_side, seed, side, pages)
            for f in range(files):
                lo, hi = f * shard, min((f + 1) * shard, n_per_side)
                if lo >= hi:
                    break
                jobs.append((os.path.join(d, f"ev-{f:05d}.parquet"),
                             ts[lo:hi], page[lo:hi], v[lo:hi],
                             lo, side, pages))
        else:
            t = _url_side_table(n_per_side, seed, side, pages)
            for f in range(files):
                lo, hi = f * shard, min((f + 1) * shard, n_per_side)
                if lo >= hi:
                    break
                pq.write_table(t.slice(lo, hi - lo),
                               os.path.join(d, f"ev-{f:05d}.parquet"))
    if parallel:
        from concurrent.futures import ProcessPoolExecutor

        workers = min(len(jobs), os.cpu_count() or 4)
        with ProcessPoolExecutor(max_workers=workers) as ex:
            for _ in ex.map(_write_url_chunk, jobs, chunksize=2):
                pass
    with open(done, "w") as fh:
        fh.write("ok")
    return left, right
