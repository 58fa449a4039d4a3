"""Runnable tour of the engine. Usage:

    cd /root/repo && python examples/flagship_demo.py

Walks through: corpus synthesis → the streaming flagship (watermark
windows + dedupe + versioned enrichment + exactly-once sink) →
crash/resume → the declarative Pipeline builder over the same data.
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> None:
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from bento_ray.pipelines import flagship_streaming
    from bento_ray.streaming import ExactlyOnceParquetSink
    from bento_ray.testgen import ensure_pages_dataset

    # 1. deterministic Common-Crawl-style corpus (cached)
    pages = ensure_pages_dataset(10_000, seed=7, files=8)
    print(f"corpus: {pages}")

    # 2. streaming flagship: epochs → watermark → exactly-once commits
    out = "/tmp/flagship_demo"
    shutil.rmtree(out, ignore_errors=True)
    metrics = flagship_streaming(pages, out, partitions=4, files_per_epoch=2)
    print(f"run: {metrics['rows_fed']} pages in {metrics['elapsed_sec']:.2f}s, "
          f"{metrics['worker_metrics']['dedupe_dropped']} re-crawls deduped, "
          f"{metrics['worker_metrics']['panes_emitted']} panes")

    sink = ExactlyOnceParquetSink(out)
    df = sink.read().to_pandas()
    print("sample output panes:")
    print(df.sort_values(["window_end", "lang"]).head(5).to_string(index=False))

    # 3. resume is a no-op when everything committed
    again = flagship_streaming(pages, out, partitions=4, files_per_epoch=2)
    print(f"resume: started at epoch {again['start_epoch']} of "
          f"{again['epochs']} (nothing replayed), "
          f"{again['partitions_skipped']} partitions skipped")

    # 4. the declarative builder over the same corpus
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from bento_ray.pipelines.builder import Pipeline

    top = (Pipeline.read_parquet(pages, columns=["url", "lang"])
           .filter(lambda t: pc.equal(t.column("lang"), pa.scalar("en")))
           .group_aggregate("lang", Count(alias_name="n_pages"))
           .to_pandas())
    print(f"builder: {top.to_dict('records')}")

    ray.shutdown()


if __name__ == "__main__":
    main()
