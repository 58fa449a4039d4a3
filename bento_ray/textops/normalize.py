"""Unicode text normalization for training-data pipelines:
NFC → lowercase → NFC → whitespace collapse → trim.

The double NFC brackets the case-fold because lowercasing can emit
decomposed sequences; running composition after guarantees the output
is NFC regardless. The same operator chain is expressible in DuckDB
(``nfc_normalize`` / ``lower`` / RE2 ``regexp_replace``), which powers
the oracle — cross-engine agreement over an accented/CJK/Cyrillic/
Greek/ligature/fullwidth repertoire is pinned in tests.

NFC runs through ``unicodedata.normalize`` (a CPython C call per
string, batched through pandas' ``.str`` accessor); the whitespace
pass is a vectorized Arrow RE2 kernel.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["normalize_text", "normalize_series", "normalize_sql_expr",
           "REPERTOIRE"]

# Mixed-script strings on which Python unicodedata+str.lower and
# DuckDB utf8proc provably agree under NFC→lower→NFC (pinned in
# tests) — used to lace the synthetic ASCII corpus so the oracle
# exercises real Unicode, not an identity map. Deliberately excludes
# the known engine divergences (Turkish İ, titlecase digraph edge
# cases under simple vs full case folding).
REPERTOIRE = [
    "éclair", "À LA CARTE", "über", "mañana", "ÇA VA", "smörgåsbord",
    "ÆØÅ norse", "Œuvre", "straße", "北京 city", "Привет МИР",
    "ΕΛΛΗΝΙΚΆ", "Ĳsselmeer", "é decomposed", "ﬁligree ﬂow",
    "ＦＵＬＬＷＩＤＴＨ", "№5 unit", "½ cup",
]


def normalize_series(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """One batch: → normalized string array."""
    s = texts.to_pandas()
    s = s.fillna("").str.normalize("NFC").str.lower().str.normalize("NFC")
    arr = pa.array(s, pa.string())
    arr = pc.replace_substring_regex(arr, r"\s+", " ")
    return pc.utf8_trim_whitespace(arr)


def normalize_text(ds, text_col: str = "text", out_col: str | None = None):
    """Dataset stage: normalize ``text_col`` (in place, or into
    ``out_col`` when given)."""

    def _f(t: pa.Table) -> pa.Table:
        norm = normalize_series(t.column(text_col))
        if out_col and out_col != text_col:
            return t.append_column(out_col, norm)
        return t.set_column(t.column_names.index(text_col), text_col, norm)

    return ds.map_batches(_f, batch_format="pyarrow")


def normalize_sql_expr(col: str) -> str:
    """The DuckDB expression equivalent to normalize_series."""
    return ("trim(regexp_replace(nfc_normalize(lower(nfc_normalize("
            f"{col}))), '\\s+', ' ', 'g'))")


def normalize_scalar(s: str) -> str:
    """Scalar reference implementation (used by tests)."""
    import re

    s = unicodedata.normalize("NFC", s)
    s = unicodedata.normalize("NFC", s.lower())
    return re.sub(r"\s+", " ", s).strip()
