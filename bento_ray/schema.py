"""Authoritative schemas for the engine's logical streams.

The primary stream is the Common-Crawl-style ``pages`` table
(BASELINE.json ``input_hint``): one row per fetched web page.
"""

from __future__ import annotations

import pyarrow as pa

# The authoritative input table (BASELINE.json input_hint).
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Enrichment side table for the stateful stream-table join (FIXTURES.md §3).
LANG_INFO_SCHEMA = pa.schema(
    [
        pa.field("lang", pa.string()),
        pa.field("lang_name", pa.string()),
        pa.field("script", pa.string()),
        pa.field("version", pa.int64()),
    ]
)

LANGS = ["en", "de", "fr", "es", "pt", "zh", "ar", "hi"]
LANG_PROBS = [0.44, 0.12, 0.10, 0.10, 0.08, 0.07, 0.05, 0.04]
LANG_NAMES = {
    "en": "English",
    "de": "German",
    "fr": "French",
    "es": "Spanish",
    "pt": "Portuguese",
    "zh": "Chinese",
    "ar": "Arabic",
    "hi": "Hindi",
}
LANG_SCRIPTS = {
    "en": "latin",
    "de": "latin",
    "fr": "latin",
    "es": "latin",
    "pt": "latin",
    "zh": "han",
    "ar": "arabic",
    "hi": "devanagari",
}
