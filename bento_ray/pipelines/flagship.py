"""The flagship pipeline — the north rule end-to-end:

    pages parquet
      → strip_html extraction (byte-identical per url vs reference)
      → hash-partition on url, dedupe (FIFO: first crawl per url wins)
      → tumbling event-time windows on warc_ts (10s, UTC-epoch aligned,
        left-open/right-closed, allowed_lateness)
      → per-(window, lang) aggregate: pages, extracted-text bytes
      → stateful stream-table join against the per-lang enrichment
        table (last-write-wins versions)
      → exactly-once partitioned Parquet sink

Two execution modes over the same semantics:

- ``flagship_streaming``: the micro-batch watermark engine
  (bento_ray.streaming) — stateful actors, per-partition checkpoints,
  resume. The real engine.
- ``flagship_batch``: pure bounded Dataset plan (map_batches → groupby)
  — used for cross-checking results and as the bench reference point.
  Both must produce identical pane rows for on-time bounded input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from bento_ray.html import strip_html_batch
from bento_ray.stages.window import assign_tumbling
from bento_ray.testgen.pages import BASE_TS_US, lang_info_table, lang_updates_table
from bento_ray.util import rfc3339nano


def dim_versions_table(include_updates: bool = True) -> pa.Table:
    """lang_info v1 (valid from -inf) + the v2 update stream, as one
    versioned dimension for last-write-wins asof joins."""
    v1 = lang_info_table().to_pandas()
    v1["update_ts"] = np.int64(-(1 << 62))
    frames = [v1]
    if include_updates:
        v2 = lang_updates_table().to_pandas()
        v2["update_ts"] = v2["update_ts"].astype("int64")
        frames.append(v2)
    dim = pd.concat(frames, ignore_index=True)
    return pa.Table.from_pandas(dim, preserve_index=False).replace_schema_metadata(None)


class _Extract:
    """html → text + byte count; drops the heavy html column immediately
    after extraction (project early — SURVEY.md §7.4.7)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = strip_html_batch(t.column("html").to_pylist())
        # utf-8 byte length from Arrow string offsets — re-encoding
        # every text (`len(x.encode())`) would copy the corpus again
        # (same trick as the streaming Feeder, streaming/engine.py)
        arr = pa.array(texts, pa.string())
        offs = np.frombuffer(arr.buffers()[1], np.int32,
                             count=len(arr) + 1)
        nbytes = pa.array(np.diff(offs).astype(np.int64), pa.int64())
        out = t.drop_columns(["html"])
        return out.append_column("extracted_nbytes", nbytes)


def pages_from_documents(sf_dir: str):
    """Derive a pages-shaped stream from the driver's ``documents``
    table: deterministic url / event time / html wrapper per doc_id.
    Lets the flagship run directly over /root/testdata."""
    from bento_ray.html import go_escape

    from bento_ray.sources.inputs import read_parquet

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "lang", "source"])

    def _f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        srcs = t.column("source").to_pylist()
        urls = [f"https://{s}.example.org/doc/{i}" for i, s in zip(ids, srcs)]
        ts = [BASE_TS_US + i * 100_000 for i in ids]
        htmls = [f"<article><p>{go_escape(x or '')}</p></article>".encode()
                 for x in texts]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(t.column("lang").to_pylist(), pa.string()),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


def flagship_batch(pages, window_size_us: int = 10_000_000,
                   include_updates: bool = True):
    """Bounded Dataset plan of the flagship. ``pages`` is a parquet
    path/dir or an already-constructed pages Dataset. Returns a Dataset
    of (window_end, lang, pages, nbytes, lang_name, script, version,
    window_end_timestamp)."""
    if isinstance(pages, str):
        from bento_ray.sources.inputs import read_parquet

        ds = read_parquet(pages, columns=["url", "warc_ts", "html", "lang"])
    else:
        ds = pages
    ds = ds.map_batches(_Extract(), batch_format="pyarrow")

    # dedupe: first crawl per url — two-phase via dedupe_exact
    # (per-batch partial, then ONE coarse-partition pass; the previous
    # groupby("url").map_groups paid a Python call per distinct url)
    from bento_ray.stages.dedupe import dedupe_exact

    ds = dedupe_exact(ds, ["url"], keep="first", order_cols=["warc_ts"])

    ds = ds.map_batches(
        lambda t: assign_tumbling(t, "warc_ts", window_size_us),
        batch_format="pyarrow")

    from ray.data.aggregate import Count, Sum

    agg = ds.groupby(["window_end", "lang"]).aggregate(
        Count(alias_name="pages"),
        Sum("extracted_nbytes", alias_name="nbytes"),
    )

    dim = dim_versions_table(include_updates).to_pandas()
    dim = dim.sort_values("update_ts", kind="stable")

    def _enrich(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        we = pd.to_datetime(df["window_end"], utc=True)
        df["__we_us"] = we.astype("datetime64[us, UTC]").astype("int64")
        df = df.sort_values("__we_us", kind="stable")
        out = pd.merge_asof(df, dim, left_on="__we_us", right_on="update_ts",
                            by="lang", direction="backward")
        out["window_end_timestamp"] = [rfc3339nano(v) for v in out["__we_us"]]
        out = out.drop(columns=["__we_us", "update_ts"])
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return agg.map_batches(_enrich, batch_format="pyarrow")


def flagship_streaming(pages_path: str, out_dir: str, *,
                       partitions: int = 8,
                       window_size_us: int = 10_000_000,
                       lateness_us: int = 2_000_000,
                       files_per_epoch: int = 2,
                       include_updates: bool = True,
                       resume: bool = True,
                       distributed_finalize: bool = False) -> dict:
    from bento_ray.streaming import StreamConfig, run_stream

    cfg = StreamConfig(
        window_size_us=window_size_us,
        allowed_lateness_us=lateness_us,
        partitions=partitions,
        out_partitions=partitions,
        files_per_epoch=files_per_epoch,
        distributed_finalize=distributed_finalize,
    )
    return run_stream(pages_path, cfg, out_dir,
                      dim_versions=dim_versions_table(include_updates),
                      resume=resume)
