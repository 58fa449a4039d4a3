"""PII redaction for training-data pipelines: vectorized regex
scrubbing of emails / phone numbers / IPv4 addresses / SSN-shaped ids.

Everything runs as ``pyarrow.compute`` kernels (RE2) inside
``map_batches`` — zero Python row loops, zero-copy Arrow in/out. The
patterns deliberately avoid backreferences/lookarounds so the SAME
expressions run under DuckDB's RE2 ``regexp_replace`` for the oracle.

Order matters and is part of the contract: SSN before PHONE (both are
digit-dash shapes), EMAIL before either (an email may embed digits),
IP last. Ray and the SQL oracle apply the same order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (tag, RE2 pattern) in application order — keep in sync with
# PII_SQL_REPLACE below.
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("PHONE", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("IP", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
]


def redact_batch(texts: pa.ChunkedArray | pa.Array):
    """→ (redacted text array, {tag: per-row match-count arrays}).
    Counts are taken BEFORE redaction of that pattern (later patterns
    count on the partially-redacted text, mirroring sequential
    application in the oracle)."""
    counts = {}
    out = texts
    for tag, pattern in PII_PATTERNS:
        counts[tag] = pc.count_substring_regex(out, pattern).cast(pa.int64())
        out = pc.replace_substring_regex(out, pattern, f"<{tag}>")
    return out, counts


def redact_pii(ds, text_col: str = "text", keep_counts: bool = True):
    """Dataset stage: replace PII spans in ``text_col`` with
    ``<EMAIL>``/``<SSN>``/``<PHONE>``/``<IP>`` tags; optionally append
    per-category match-count columns (n_email, n_ssn, n_phone, n_ip)."""

    def _f(t: pa.Table) -> pa.Table:
        red, counts = redact_batch(t.column(text_col))
        t = t.set_column(t.column_names.index(text_col),
                         text_col, red)
        if keep_counts:
            for tag, arr in counts.items():
                t = t.append_column(f"n_{tag.lower()}", arr)
        return t

    return ds.map_batches(_f, batch_format="pyarrow")


def pii_sql_replace(col: str) -> str:
    """The DuckDB expression equivalent to redact_batch's replacement
    chain — same patterns, same order, same tags."""
    expr = col
    for tag, pattern in PII_PATTERNS:
        lit = pattern.replace("'", "''")  # SQL literals keep backslashes
        expr = f"regexp_replace({expr}, '{lit}', '<{tag}>', 'g')"
    return expr


def pii_sql_counts(col: str) -> dict[str, str]:
    """DuckDB count expressions matching redact_batch's sequential
    counting (each pattern counts on the text after earlier
    replacements)."""
    exprs = {}
    stage = col
    for tag, pattern in PII_PATTERNS:
        lit = pattern.replace("'", "''")  # SQL literals keep backslashes
        exprs[f"n_{tag.lower()}"] = \
            f"len(regexp_extract_all({stage}, '{lit}'))"
        stage = f"regexp_replace({stage}, '{lit}', '<{tag}>', 'g')"
    return exprs
