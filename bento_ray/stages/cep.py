"""Complex-event-processing primitives (the north rule names CEP
alongside windows/watermarks/joins; the reference engine reaches the
same use cases through Bloblang + cache state —
`/root/reference/internal/impl/pure/processor_cache.go` patterns —
here it is a first-class distributed operator).

``match_event_sequence`` finds CONSECUTIVE per-key event-type
sequences (MATCH_RECOGNIZE's strict contiguity / Flink CEP `next`)
completed within a time bound. Distributed shape: one hash exchange
co-locates each key's events (coarse partitions — P vectorized scans,
not one Python callback per key), then a numpy lexsort + shifted-
comparison pass detects matches with zero per-row Python. State never
outlives a partition scan; skewed keys cost only their share of one
partition (salt upstream if one key dominates a partition's RAM).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["match_event_sequence", "match_followed_by",
           "match_absence"]


def match_event_sequence(ds, pattern: list[str], *, within_us: int,
                         key_col: str = "user_id", ts_col: str = "ts",
                         type_col: str = "event_type",
                         id_col: str = "event_id",
                         num_parts: int | None = None):
    """Emit one row per completed match: (key, first_event_id,
    last_event_id, span_us). A match is ``len(pattern)`` CONSECUTIVE
    events of one key (ordered by ts, id — deterministic under ties)
    whose types equal ``pattern`` and whose total span ≤ within_us.
    Overlapping matches all report (no skip-past-last-row policy)."""
    if len(pattern) < 2:
        raise ValueError("pattern needs at least two steps")
    from bento_ray.util import stable_hash

    if num_parts is None:
        from bento_ray.util import cluster_cpus
        num_parts = max(4, cluster_cpus())
    P = num_parts
    k = len(pattern)

    def _part(t: pa.Table) -> pa.Table:
        h = stable_hash(t.column(key_col)) % np.uint64(P)
        return t.append_column("part", pa.array(h.astype(np.int64)))

    def _scan(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        ts = t.column(ts_col).cast(pa.int64()).to_numpy()
        typ = t.column(type_col).to_numpy(zero_copy_only=False)
        eid = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, key))
        key, ts, typ, eid = key[order], ts[order], typ[order], eid[order]
        n = len(key)
        if n < k:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                "first_event_id": pa.array([], pa.int64()),
                "last_event_id": pa.array([], pa.int64()),
                "span_us": pa.array([], pa.int64()),
            })
        m = np.ones(n - k + 1, bool)
        for j, want in enumerate(pattern):
            m &= typ[j:n - k + 1 + j] == want
        m &= key[k - 1:] == key[:n - k + 1]          # same key throughout
        span = ts[k - 1:] - ts[:n - k + 1]
        m &= span <= within_us
        idx = np.flatnonzero(m)
        return pa.table({
            key_col: pa.array(key[idx], pa.int64()),
            "first_event_id": pa.array(eid[idx], pa.int64()),
            "last_event_id": pa.array(eid[idx + k - 1], pa.int64()),
            "span_us": pa.array(span[idx], pa.int64()),
        })

    return (ds.map_batches(_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda t: _scan(t.drop_columns(["part"])),
                        batch_format="pyarrow"))


def match_followed_by(ds, pattern: list[str], *, within_us: int,
                      key_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      id_col: str = "event_id",
                      num_parts: int | None = None):
    """RELAXED-contiguity CEP (Flink CEP ``followedBy`` / SQL
    MATCH_RECOGNIZE with intervening rows allowed): for EVERY event of
    type ``pattern[0]``, chain to the EARLIEST later event of
    ``pattern[1]`` for the same key, then the earliest ``pattern[2]``
    after that, …; emit (key, first_event_id, last_event_id, span_us)
    when the chain completes with total span ≤ ``within_us``
    (earliest-completion per start event — deterministic, and exactly
    expressible in SQL as nested next-occurrence window minima, which
    is what the oracle runs).

    Distributed shape mirrors ``match_event_sequence``: one hash
    exchange on the key, then P vectorized partition scans. The
    next-occurrence indices per step come from ONE reversed
    ``np.minimum.accumulate`` suffix pass over position-if-type —
    no per-row Python, no per-key loop. Crossing a key boundary is
    detected by a single key-equality check on the landed index:
    because the sort groups keys contiguously, a nearer in-key match
    would always beat a cross-key one, so key[next] != key[i] proves
    the rest of i's segment holds no such event."""
    if len(pattern) < 2:
        raise ValueError("pattern needs at least two steps")
    from bento_ray.util import stable_hash

    if num_parts is None:
        from bento_ray.util import cluster_cpus
        num_parts = max(4, cluster_cpus())
    P = num_parts

    def _part(t: pa.Table) -> pa.Table:
        h = stable_hash(t.column(key_col)) % np.uint64(P)
        return t.append_column("part", pa.array(h.astype(np.int64)))

    empty = pa.table({
        key_col: pa.array([], pa.int64()),
        "first_event_id": pa.array([], pa.int64()),
        "last_event_id": pa.array([], pa.int64()),
        "span_us": pa.array([], pa.int64()),
    })

    def _scan(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        ts = t.column(ts_col).cast(pa.int64()).to_numpy()
        typ = t.column(type_col).to_numpy(zero_copy_only=False)
        eid = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, key))
        key, ts, typ, eid = key[order], ts[order], typ[order], eid[order]
        n = len(key)
        if n < len(pattern):
            return empty
        # nxt[want][i] = smallest index > i with typ == want (or n)
        nxt = {}
        for want in set(pattern[1:]):
            pos_if = np.where(typ == want, np.arange(n), n)
            suffmin = np.minimum.accumulate(pos_if[::-1])[::-1]
            nxt[want] = np.concatenate([suffmin[1:], [n]])
        cur = np.flatnonzero(typ == pattern[0])     # start positions
        starts = cur
        alive = np.ones(len(cur), bool)
        for want in pattern[1:]:
            landed = nxt[want][np.minimum(cur, n - 1)]
            landed[cur >= n] = n
            alive &= landed < n
            safe = np.minimum(landed, n - 1)
            alive &= key[safe] == key[np.minimum(starts, n - 1)]
            cur = np.where(alive, landed, n)
        ok = np.flatnonzero(alive)
        if len(ok) == 0:
            return empty
        first, last = starts[ok], cur[ok]
        span = ts[last] - ts[first]
        keep = span <= within_us
        first, last, span = first[keep], last[keep], span[keep]
        return pa.table({
            key_col: pa.array(key[first], pa.int64()),
            "first_event_id": pa.array(eid[first], pa.int64()),
            "last_event_id": pa.array(eid[last], pa.int64()),
            "span_us": pa.array(span, pa.int64()),
        })

    return (ds.map_batches(_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda t: _scan(t.drop_columns(["part"])),
                        batch_format="pyarrow"))


def match_absence(ds, first: str, absent: str, *, within_us: int,
                  key_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  id_col: str = "event_id",
                  num_parts: int | None = None):
    """CEP negation / timeout pattern (Flink `notFollowedBy` within a
    time bound — the alerting shape: "signup with NO purchase inside
    7 days"): emit (key, first_event_id) for every ``first``-type
    event with no ``absent``-type event for the same key strictly
    after it (in (ts, id) order) within ``within_us``.

    Same distributed shape as the other CEP scans: one hash exchange
    on the key, P partition scans, ONE suffix-min pass for the
    next-occurrence index — the absence test is then a single
    vectorized comparison. In a live stream this is the
    watermark-fired timeout timer; over a bounded table the suffix
    scan IS that timer's final state."""
    from bento_ray.util import stable_hash

    if num_parts is None:
        from bento_ray.util import cluster_cpus
        num_parts = max(4, cluster_cpus())
    P = num_parts

    def _part(t: pa.Table) -> pa.Table:
        h = stable_hash(t.column(key_col)) % np.uint64(P)
        return t.append_column("part", pa.array(h.astype(np.int64)))

    empty = pa.table({
        key_col: pa.array([], pa.int64()),
        "first_event_id": pa.array([], pa.int64()),
    })

    def _scan(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        ts = t.column(ts_col).cast(pa.int64()).to_numpy()
        typ = t.column(type_col).to_numpy(zero_copy_only=False)
        eid = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, key))
        key, ts, typ, eid = key[order], ts[order], typ[order], eid[order]
        n = len(key)
        if n == 0:
            return empty
        pos_if = np.where(typ == absent, np.arange(n), n)
        suffmin = np.minimum.accumulate(pos_if[::-1])[::-1]
        nxt = np.concatenate([suffmin[1:], [n]])
        starts = np.flatnonzero(typ == first)
        landed = nxt[starts]
        safe = np.minimum(landed, n - 1)
        # present = an in-key absent-event within the bound exists
        present = (landed < n) & (key[safe] == key[starts]) & \
            (ts[safe] - ts[starts] <= within_us)
        keep = starts[~present]
        return pa.table({
            key_col: pa.array(key[keep], pa.int64()),
            "first_event_id": pa.array(eid[keep], pa.int64()),
        })

    return (ds.map_batches(_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda t: _scan(t.drop_columns(["part"])),
                        batch_format="pyarrow"))
