"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

Implements FIXTURES.md §1–§3: a seedable generator producing the
authoritative input table ``(url, warc_ts, html, text, lang)`` where
``html`` is drawn from a closed grammar and ``text`` is the *golden*
sanitized output computed structurally by the generator (NOT by calling
the engine's ``strip_html`` — the engine must independently reproduce it
byte-for-byte).

Every row is a pure function of ``(seed, row_id)``, so generation can be
fanned out over Ray (``ray.data.range(n).map_batches(...)``) and is
deterministic regardless of parallelism. Duplicate rows (~10%) re-derive
an earlier row's content inline from its id instead of referencing
shared state.
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from bento_ray.html import go_escape
from bento_ray.schema import (
    LANG_NAMES,
    LANG_PROBS,
    LANG_SCRIPTS,
    LANGS,
    PAGES_SCHEMA,
)

# 2024-01-01T00:00:00Z in microseconds since the unix epoch.
BASE_TS_US = 1_704_067_200_000_000
# Event-time spacing: one page per 100ms ⇒ a 10s window holds ~100 rows.
DEFAULT_DELTA_US = 100_000

_LEXICON = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu amber basalt cobalt dune ember flint garnet "
    "harbor iris jasper krypton lumen marble nectar onyx prism quartz "
    "raven slate topaz umber vertex willow zenith"
).split()

_ENTITIES = ["&amp;", "&lt;", "&gt;"]

# Grammar elements (FIXTURES.md §2): every open tag closed, br void,
# bounded nesting depth ≤ 4.
_CONTAINER_TAGS = ["p", "div", "span", "strong", "em", "ul", "li", "h1", "article"]
_SKIP_TAGS = ["script", "style"]

_SCRIPT_BODY = [
    "var x = 1;",
    "function f(a){return a+1;}",
    "console.log('hi');",
    ".cls{color:red}",
    "window.onload=init;",
]


def _text_node(rng: random.Random) -> str:
    """A text node: lexicon words / digits / entities. Returns the exact
    source bytes; the golden text equals the same bytes (entity escaping
    is preserved through decode+Go-re-escape)."""
    n = rng.randint(2, 8)
    toks = []
    for _ in range(n):
        r = rng.random()
        if r < 0.84:
            toks.append(rng.choice(_LEXICON))
        elif r < 0.94:
            toks.append(str(rng.randint(0, 9999)))
        else:
            toks.append(rng.choice(_ENTITIES))
    return " ".join(toks)


def _gen_nodes(rng: random.Random, depth: int, html: list[str], text: list[str]) -> None:
    """Emit a sequence of sibling nodes into html/text accumulators."""
    n_children = rng.randint(1, 4) if depth > 0 else rng.randint(2, 6)
    for _ in range(n_children):
        r = rng.random()
        if r < 0.1:
            # comment — dropped by sanitization
            html.append(f"<!-- {rng.choice(_LEXICON)} {rng.randint(0, 99)} -->")
        elif r < 0.2:
            # script/style — tags AND content dropped
            tag = rng.choice(_SKIP_TAGS)
            html.append(f"<{tag}>{rng.choice(_SCRIPT_BODY)}</{tag}>")
        elif r < 0.28 and depth < 4:
            # void element
            html.append("<br/>")
        elif r < 0.62 and depth < 4:
            # nested container element (a gets an href attribute)
            if rng.random() < 0.15:
                tag, attrs = "a", f' href="https://x{rng.randint(0, 999)}.example/"'
            else:
                tag, attrs = rng.choice(_CONTAINER_TAGS), ""
            html.append(f"<{tag}{attrs}>")
            _gen_nodes(rng, depth + 1, html, text)
            html.append(f"</{tag}>")
        else:
            t = _text_node(rng)
            html.append(t)
            text.append(t)


def _gen_page_content(seed: int, row_id: int) -> tuple[str, bytes, str, str]:
    """Pure content function: (seed, row_id) → (url, html, text, lang)."""
    rng = random.Random((seed << 34) ^ (row_id * 2654435761))
    # Zipf-ish domain draw (s≈1.1) over n_domains synthetic domains.
    n_domains = 1000
    u = rng.random()
    # inverse-CDF approximation of a bounded zipf: rank ∝ u^(-1/(s-1)) clipped
    rank = min(int((u + 1e-9) ** (-1.0 / 0.9)), n_domains)
    domain = f"site{rank:04d}.example.org"
    url = f"https://{domain}/p{row_id}"
    lang = rng.choices(LANGS, weights=LANG_PROBS, k=1)[0]
    html_parts: list[str] = ["<article>"]
    text_parts: list[str] = []
    _gen_nodes(rng, 1, html_parts, text_parts)
    html_parts.append("</article>")
    html = "".join(html_parts).encode("utf-8")
    # Golden text: kept text nodes in document order, nothing inserted
    # between adjacent nodes, entity escaping preserved (decode + Go
    # escape round-trips the grammar's entities exactly).
    text = go_escape("".join(
        t.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
        for t in text_parts
    ))
    return url, html, text, lang


def _gen_rows(
    ids: np.ndarray,
    seed: int,
    dup_frac: float,
    delta_us: int,
    base_ts_us: int,
) -> pa.Table:
    urls: list[str] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    ts: list[int] = []
    for i in ids.tolist():
        rng = random.Random((seed << 21) ^ i)
        jitter = rng.randint(-2 * delta_us, 2 * delta_us)
        ts.append(base_ts_us + i * delta_us + jitter)
        # ~dup_frac of rows past a warmup are re-crawls of an earlier page:
        # same url/html/text/lang, later warc_ts (exercises dedupe).
        if i > 20 and rng.random() < dup_frac:
            src = rng.randrange(0, i)
        else:
            src = i
        url, html, text, lang = _gen_page_content(seed, src)
        urls.append(url)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(ts, pa.timestamp("us", tz="UTC")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def generate_pages_table(
    n_rows: int,
    seed: int = 42,
    dup_frac: float = 0.10,
    delta_us: int = DEFAULT_DELTA_US,
    base_ts_us: int = BASE_TS_US,
) -> pa.Table:
    """Driver-side generation for tests (small n)."""
    return _gen_rows(np.arange(n_rows), seed, dup_frac, delta_us, base_ts_us)


def make_pages_batch_fn(
    seed: int = 42,
    dup_frac: float = 0.10,
    delta_us: int = DEFAULT_DELTA_US,
    base_ts_us: int = BASE_TS_US,
):
    """Batch fn for ``ray.data.range(n).map_batches(fn, batch_format="pyarrow")``
    — scales generation across the cluster, deterministic by row id."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        return _gen_rows(ids, seed, dup_frac, delta_us, base_ts_us)

    return fn


def ensure_pages_dataset(
    n_rows: int,
    seed: int = 42,
    cache_root: str = "/tmp/bento_ray_pages",
    files: int | None = None,
) -> str:
    """Generate (once) and cache the pages corpus as partitioned parquet.

    Returns the directory path. Files are written per id-shard so the
    corpus is itself a resumable, partitioned layout; generation fans
    out over Ray when a session is active and n is large.
    """
    out_dir = os.path.join(cache_root, f"n{n_rows}_s{seed}"
                           + (f"_f{files}" if files else ""))
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    if files is None:
        files = max(1, min(64, n_rows // 4000))
    shard = (n_rows + files - 1) // files
    if n_rows >= 50_000:
        import ray.data as rd

        fn = make_pages_batch_fn(seed)
        ds = rd.range(n_rows, override_num_blocks=files)
        # batch_size=None: one batch per block — a row-count batch_size
        # makes map_batches coalesce adjacent blocks (block = shard-1
        # rows due to integer split), silently halving the file count
        ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
        ds.write_parquet(out_dir, min_rows_per_file=1)
    else:
        for f in range(files):
            lo, hi = f * shard, min((f + 1) * shard, n_rows)
            tbl = _gen_rows(np.arange(lo, hi), seed, 0.10, DEFAULT_DELTA_US, BASE_TS_US)
            pq.write_table(tbl, os.path.join(out_dir, f"part-{f:05d}.parquet"))
    with open(done, "w") as fh:
        fh.write("ok")
    return out_dir


def lang_info_table(version: int = 1) -> pa.Table:
    """Enrichment table: one row per language (FIXTURES.md §3)."""
    return pa.Table.from_pydict(
        {
            "lang": LANGS,
            "lang_name": [LANG_NAMES[lg] for lg in LANGS],
            "script": [LANG_SCRIPTS[lg] for lg in LANGS],
            "version": [version] * len(LANGS),
        }
    )


def lang_updates_table(update_ts_us: int | None = None) -> pa.Table:
    """Version-2 update stream for the stateful last-write-wins join:
    a few languages get a renamed ``lang_name`` at ``update_ts_us``."""
    if update_ts_us is None:
        update_ts_us = BASE_TS_US + 30_000_000  # 30s into the stream
    updated = {"en": "English (v2)", "zh": "Mandarin Chinese", "de": "German (v2)"}
    langs = list(updated)
    return pa.Table.from_pydict(
        {
            "lang": langs,
            "lang_name": [updated[lg] for lg in langs],
            "script": [LANG_SCRIPTS[lg] for lg in langs],
            "version": [2] * len(langs),
            "update_ts": pa.array([update_ts_us] * len(langs), pa.timestamp("us", tz="UTC")),
        }
    )
