"""Round-4 session-3 operators: interval join, relaxed-contiguity CEP,
per-group top-k, rolling per-key aggregates — brute-force goldens and
edge cases (the DuckDB hash parity rides tools/check_oracle.py /
test_queries_oracle.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

US = 1_000_000


def _events_ds(rows):
    return rd.from_items(rows).map_batches(
        lambda t: t.set_column(
            t.column_names.index("ts"), "ts",
            t.column("ts").cast(pa.timestamp("us"))),
        batch_format="pyarrow")


# ---------------------------------------------------------------- interval


def test_interval_join_basic_and_bounds():
    from bento_ray.stages.join import interval_join

    left = rd.from_items([
        {"user_id": 1, "ts": 100, "event_id": 10},
        {"user_id": 2, "ts": 100, "event_id": 11},   # no right for key 2
    ])
    right = rd.from_items([
        {"user_id": 1, "ts": 100, "event_id": 20},   # lag 0: below lower=1
        {"user_id": 1, "ts": 101, "event_id": 21},   # lag 1: inclusive lower
        {"user_id": 1, "ts": 150, "event_id": 22},   # lag 50: inclusive upper
        {"user_id": 1, "ts": 151, "event_id": 23},   # lag 51: above upper
    ])
    out = interval_join(left, right, key_col="user_id",
                        left_ts="ts", right_ts="ts",
                        left_id_col="event_id", right_id_col="event_id",
                        lower_us=1, upper_us=50).to_pandas() \
        .sort_values("right_id")
    assert list(out["right_id"]) == [21, 22]
    assert list(out["lag_us"]) == [1, 50]


def test_interval_join_brute_force():
    from bento_ray.stages.join import interval_join

    rng = np.random.default_rng(7)
    n = 400
    mk = lambda off: [{"user_id": int(rng.integers(0, 12)),
                       "ts": int(rng.integers(0, 1000)),
                       "event_id": off + i} for i in range(n)]
    lrows, rrows = mk(0), mk(10_000)
    out = interval_join(rd.from_items(lrows), rd.from_items(rrows),
                        key_col="user_id", left_ts="ts", right_ts="ts",
                        left_id_col="event_id", right_id_col="event_id",
                        lower_us=-25, upper_us=40).to_pandas()
    got = sorted(zip(out["left_id"], out["right_id"], out["lag_us"]))
    want = sorted(
        (l["event_id"], r["event_id"], r["ts"] - l["ts"])
        for l in lrows for r in rrows
        if l["user_id"] == r["user_id"] and -25 <= r["ts"] - l["ts"] <= 40)
    assert got == want


# --------------------------------------------------------------------- CEP


def test_match_followed_by_skips_intervening():
    from bento_ray.stages.cep import match_followed_by

    rows = [
        # signup → (view) → click → (error) → purchase: matches
        {"event_id": 1, "user_id": 1, "ts": 0, "event_type": "signup"},
        {"event_id": 2, "user_id": 1, "ts": 1 * US, "event_type": "view"},
        {"event_id": 3, "user_id": 1, "ts": 2 * US, "event_type": "click"},
        {"event_id": 4, "user_id": 1, "ts": 3 * US, "event_type": "error"},
        {"event_id": 5, "user_id": 1, "ts": 4 * US, "event_type": "purchase"},
        # user 2: signup → purchase → click: purchase precedes click — no
        {"event_id": 6, "user_id": 2, "ts": 0, "event_type": "signup"},
        {"event_id": 7, "user_id": 2, "ts": 1 * US, "event_type": "purchase"},
        {"event_id": 8, "user_id": 2, "ts": 2 * US, "event_type": "click"},
        # user 3's purchase must not complete user 2's chain
        {"event_id": 9, "user_id": 3, "ts": 3 * US, "event_type": "purchase"},
    ]
    out = match_followed_by(
        _events_ds(rows), ["signup", "click", "purchase"],
        within_us=60 * US).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["user_id"], r["first_event_id"], r["last_event_id"],
            r["span_us"]) == (1, 1, 5, 4 * US)


def test_match_followed_by_earliest_completion_and_bound():
    from bento_ray.stages.cep import match_followed_by

    rows = [
        {"event_id": 1, "user_id": 1, "ts": 0, "event_type": "a"},
        {"event_id": 2, "user_id": 1, "ts": 1 * US, "event_type": "b"},
        {"event_id": 3, "user_id": 1, "ts": 2 * US, "event_type": "b"},
        # chain uses the EARLIEST b (id 2), not the later one
        {"event_id": 4, "user_id": 1, "ts": 99 * US, "event_type": "a"},
        # second start's b lands outside the bound
        {"event_id": 5, "user_id": 1, "ts": 200 * US, "event_type": "b"},
    ]
    out = match_followed_by(_events_ds(rows), ["a", "b"],
                            within_us=50 * US).to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["first_event_id"],
            out.iloc[0]["last_event_id"]) == (1, 2)


def test_match_followed_by_brute_force():
    from bento_ray.stages.cep import match_followed_by

    rng = np.random.default_rng(3)
    types = ["a", "b", "c"]
    rows = [{"event_id": i, "user_id": int(rng.integers(0, 8)),
             "ts": int(rng.integers(0, 300)) * US,
             "event_type": types[rng.integers(0, 3)]}
            for i in range(500)]
    within = 120 * US
    out = match_followed_by(_events_ds(rows), ["a", "b", "c"],
                            within_us=within).to_pandas()
    got = sorted(zip(out["user_id"], out["first_event_id"],
                     out["last_event_id"], out["span_us"]))

    # brute force: per user, (ts, id)-ordered; every 'a' chains to the
    # earliest later 'b', then the earliest 'c' after that
    want = []
    byuser = {}
    for r in rows:
        byuser.setdefault(r["user_id"], []).append(r)
    for u, evs in byuser.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for i, e in enumerate(evs):
            if e["event_type"] != "a":
                continue
            b = next((j for j in range(i + 1, len(evs))
                      if evs[j]["event_type"] == "b"), None)
            if b is None:
                continue
            c = next((j for j in range(b + 1, len(evs))
                      if evs[j]["event_type"] == "c"), None)
            if c is None:
                continue
            span = evs[c]["ts"] - e["ts"]
            if span <= within:
                want.append((u, e["event_id"], evs[c]["event_id"], span))
    assert got == sorted(want)


# ------------------------------------------------------------------- top-k


def test_topk_per_group_golden_and_ties():
    from bento_ray.stages.rank import topk_per_group

    rows = [
        {"g": "x", "v": 5.0, "id": 1},
        {"g": "x", "v": 9.0, "id": 2},
        {"g": "x", "v": 9.0, "id": 3},   # tie: lower id wins rank
        {"g": "x", "v": 7.0, "id": 4},
        {"g": "y", "v": 1.0, "id": 5},
    ]
    out = topk_per_group(rd.from_items(rows), ["g"], "v", "id", 2,
                         descending=True).to_pandas()
    got = sorted(zip(out["g"], out["id"]))
    assert got == [("x", 2), ("x", 3), ("y", 5)]


def test_topk_per_group_brute_force_many_blocks():
    from bento_ray.stages.rank import topk_per_group

    rng = np.random.default_rng(11)
    rows = [{"g": int(rng.integers(0, 9)),
             "v": float(rng.integers(0, 40)),   # many ties
             "id": i} for i in range(1000)]
    ds = rd.from_items(rows).repartition(16)
    out = topk_per_group(ds, ["g"], "v", "id", 5,
                         descending=True).to_pandas()
    got = sorted(zip(out["g"], out["id"]))
    want = []
    for g in set(r["g"] for r in rows):
        grp = sorted((r for r in rows if r["g"] == g),
                     key=lambda r: (-r["v"], r["id"]))[:5]
        want += [(g, r["id"]) for r in grp]
    assert got == sorted(want)


# ----------------------------------------------------------------- rolling


def test_rolling_aggregate_resets_and_window():
    from bento_ray.stages.rank import rolling_aggregate

    rows = [
        {"user_id": 1, "ts": 1, "event_id": 1, "value": 1.0},
        {"user_id": 1, "ts": 2, "event_id": 2, "value": 2.0},
        {"user_id": 1, "ts": 3, "event_id": 3, "value": 3.0},
        {"user_id": 1, "ts": 4, "event_id": 4, "value": 4.0},
        {"user_id": 2, "ts": 1, "event_id": 5, "value": 100.0},  # reset
    ]
    out = rolling_aggregate(rd.from_items(rows), key_col="user_id",
                            ts_col="ts", val_col="value",
                            id_col="event_id", window=3).to_pandas() \
        .sort_values("event_id")
    assert list(out["roll_cnt"]) == [1, 2, 3, 3, 1]
    assert list(out["roll_sum_micro"]) == [
        1_000_000, 3_000_000, 6_000_000, 9_000_000, 100_000_000]
    assert list(out["roll_avg"]) == [1.0, 1.5, 2.0, 3.0, 100.0]


def test_rolling_aggregate_brute_force():
    from bento_ray.stages.rank import rolling_aggregate

    rng = np.random.default_rng(5)
    rows = [{"user_id": int(rng.integers(0, 6)),
             "ts": int(rng.integers(0, 100)),
             "event_id": i,
             "value": float(np.round(rng.normal(0, 3), 4))}
            for i in range(600)]
    W = 4
    out = rolling_aggregate(rd.from_items(rows).repartition(8),
                            key_col="user_id", ts_col="ts",
                            val_col="value", id_col="event_id",
                            window=W).to_pandas()
    got = {int(r.event_id): (int(r.roll_cnt), int(r.roll_sum_micro))
           for r in out.itertuples()}
    byuser = {}
    for r in rows:
        byuser.setdefault(r["user_id"], []).append(r)
    for u, evs in byuser.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        micro = [int(np.floor(abs(r["value"] * 1e6) + 0.5)
                     * np.sign(r["value"])) for r in evs]
        for i, e in enumerate(evs):
            lo = max(0, i - W + 1)
            assert got[e["event_id"]] == (i - lo + 1, sum(micro[lo:i + 1]))


def test_match_absence_timeout_pattern():
    from bento_ray.stages.cep import match_absence

    rows = [
        # user 1: signup with purchase 5s later — suppressed
        {"event_id": 1, "user_id": 1, "ts": 0, "event_type": "signup"},
        {"event_id": 2, "user_id": 1, "ts": 5 * US, "event_type": "purchase"},
        # user 1: second signup, next purchase 100s later — emitted
        {"event_id": 3, "user_id": 1, "ts": 10 * US, "event_type": "signup"},
        {"event_id": 4, "user_id": 1, "ts": 110 * US, "event_type": "purchase"},
        # user 2: signup, never purchases — emitted
        {"event_id": 5, "user_id": 2, "ts": 0, "event_type": "signup"},
        # user 3's purchase must not suppress user 2's signup
        {"event_id": 6, "user_id": 3, "ts": 1 * US, "event_type": "purchase"},
        # same-ts tie: purchase with HIGHER id counts as "after"
        {"event_id": 7, "user_id": 4, "ts": 0, "event_type": "signup"},
        {"event_id": 8, "user_id": 4, "ts": 0, "event_type": "purchase"},
    ]
    out = match_absence(_events_ds(rows), "signup", "purchase",
                        within_us=30 * US).to_pandas()
    got = sorted(zip(out["user_id"], out["first_event_id"]))
    assert got == [(1, 3), (2, 5)]


# ------------------------------------------------------------------- as-of


def test_asof_join_brute_force():
    from bento_ray.stages.join import asof_join

    rng = np.random.default_rng(13)
    n = 300
    mk = lambda off: [{"user_id": int(rng.integers(0, 10)),
                       "ts": int(rng.integers(0, 200)),
                       "event_id": off + i} for i in range(n)]
    lrows, rrows = mk(0), mk(10_000)
    out = asof_join(rd.from_items(lrows), rd.from_items(rrows),
                    key_col="user_id", left_ts="ts", right_ts="ts",
                    left_id_col="event_id", right_id_col="event_id"
                    ).to_pandas()
    got = {int(r.left_id): (None if np.isnan(r.right_id)
                            else int(r.right_id))
           for r in out.itertuples()}
    assert len(got) == n
    for l in lrows:
        cands = [r for r in rrows
                 if r["user_id"] == l["user_id"] and r["ts"] <= l["ts"]]
        want = max(cands, key=lambda r: (r["ts"], r["event_id"]))["event_id"] \
            if cands else None
        assert got[l["event_id"]] == want, l


def test_asof_join_no_right_side_for_key():
    from bento_ray.stages.join import asof_join

    left = rd.from_items([{"user_id": 1, "ts": 10, "event_id": 1},
                          {"user_id": 2, "ts": 10, "event_id": 2}])
    right = rd.from_items([{"user_id": 1, "ts": 5, "event_id": 7},
                           {"user_id": 1, "ts": 10, "event_id": 8},
                           {"user_id": 1, "ts": 11, "event_id": 9}])
    out = asof_join(left, right, key_col="user_id", left_ts="ts",
                    right_ts="ts", left_id_col="event_id",
                    right_id_col="event_id").to_pandas() \
        .sort_values("left_id")
    # equal-ts right (id 8) matches; key 2 has no right → null
    assert list(out["left_id"]) == [1, 2]
    assert out.iloc[0]["right_id"] == 8 and out.iloc[0]["lag_us"] == 0
    assert np.isnan(out.iloc[1]["right_id"])
