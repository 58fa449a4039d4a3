"""Runnable tour of the event-pattern layer. Usage:

    cd /root/repo && python examples/stream_patterns_demo.py

Walks the events table through the order-sensitive operators added in
round 4: strict-contiguity CEP → followedBy chains → absence
(timeout) detection → stream-stream interval join → large-large as-of
join → per-key rolling aggregates → windowed top-k — every stage the
driver gate hash-checks against DuckDB SQL.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from bento_ray.sources import read_parquet
    from bento_ray.stages.cep import (match_absence, match_event_sequence,
                                      match_followed_by)
    from bento_ray.stages.join import asof_join, interval_join
    from bento_ray.stages.rank import rolling_aggregate, topk_per_group

    ev = read_parquet(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id", "event_type",
                               "value"])
    HOUR = 3_600_000_000

    print("== CEP: strict contiguity (click immediately before purchase)")
    strict = match_event_sequence(ev, ["click", "purchase"],
                                  within_us=6 * HOUR)
    print(strict.to_pandas().head(3).to_string(index=False))

    print("\n== CEP: followedBy (signup … click … purchase within 48h)")
    chains = match_followed_by(ev, ["signup", "click", "purchase"],
                               within_us=48 * HOUR)
    print(chains.to_pandas().head(3).to_string(index=False))

    print("\n== CEP: absence (signup with NO purchase within 6h)")
    gone = match_absence(ev, "signup", "purchase", within_us=6 * HOUR)
    print(f"{gone.count()} lapsed signups")

    print("\n== interval join (purchases within 2h after a click)")
    clicks = ev.filter(expr="event_type == 'click'")
    buys = ev.filter(expr="event_type == 'purchase'")
    pairs = interval_join(clicks, buys, key_col="user_id",
                          left_ts="ts", right_ts="ts",
                          left_id_col="event_id", right_id_col="event_id",
                          left_out="click_id", right_out="purchase_id",
                          lower_us=1, upper_us=2 * HOUR)
    print(pairs.to_pandas().head(3).to_string(index=False))

    print("\n== as-of join (latest click at-or-before each purchase)")
    attrib = asof_join(buys, clicks, key_col="user_id",
                       left_ts="ts", right_ts="ts",
                       left_id_col="event_id", right_id_col="event_id",
                       left_out="purchase_id", right_out="click_id")
    print(attrib.to_pandas().head(3).to_string(index=False))

    print("\n== rolling 5-event average per user")
    roll = rolling_aggregate(ev, key_col="user_id", ts_col="ts",
                             val_col="value", id_col="event_id", window=5)
    print(roll.to_pandas().head(3).to_string(index=False))

    print("\n== top-2 events by value per type")
    top = topk_per_group(ev, ["event_type"], "value", "event_id", 2)
    print(top.to_pandas().sort_values(["event_type", "event_id"])
          .head(6).to_string(index=False))

    ray.shutdown()


if __name__ == "__main__":
    main()
