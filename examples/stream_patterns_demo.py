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

    # ---- the LIVE forms: same semantics over an unbounded stream ----
    # (watermark-final emission, exactly-once sink, snapshot resume;
    # each batch operator above has a streaming twin in
    # bento_ray.streaming — pytest pins byte parity between the two)
    import glob
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bento_ray.streaming import (ExactlyOnceParquetSink,
                                     run_absence_stream)

    print("\n== STREAMING absence: the watermark-fired timeout timer")
    work = tempfile.mkdtemp(prefix="stream_demo_")
    src = os.path.join(SF, "events.parquet")
    t = pq.read_table(src, columns=["ts", "user_id", "event_id",
                                    "event_type"])
    df = t.to_pandas().sort_values(["ts", "event_id"])
    n = len(df)
    feed = os.path.join(work, "feed")
    os.makedirs(feed)
    for i in range(4):                      # 4 arrival files = 4 epochs
        pq.write_table(
            pa.Table.from_pandas(df.iloc[i * n // 4:(i + 1) * n // 4],
                                 preserve_index=False),
            os.path.join(feed, f"arrivals-{i:02d}.parquet"))
    out = os.path.join(work, "alerts")
    m = run_absence_stream(feed, out, first="click", absent="purchase",
                           within_us=6 * 3_600_000_000,
                           partitions=4, files_per_epoch=1)
    alerts = ExactlyOnceParquetSink(out).read().to_pandas()
    print(f"{len(alerts)} lapsed signups across {m['epochs']} epochs; "
          f"metrics: {m['worker_metrics']}")
    # re-run over the same sink: every epoch already committed
    m2 = run_absence_stream(feed, out, first="click", absent="purchase",
                            within_us=6 * 3_600_000_000,
                            partitions=4, files_per_epoch=1)
    print(f"re-run wrote {m2['partitions_written']} partitions — the "
          f"sink manifest showed epochs 0..{m2['start_epoch'] - 1} "
          f"already done, so it resumed past the whole stream")
    shutil.rmtree(work, ignore_errors=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
