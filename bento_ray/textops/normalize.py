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
    """One batch: → normalized string array. Null stays null — the
    DuckDB equivalent (``normalize_sql_expr``) propagates NULL through
    nfc_normalize/lower/regexp_replace, and silently coercing null to
    ``''`` would change downstream null semantics."""
    s = texts.to_pandas()
    null_mask = s.isna().to_numpy()
    s = s.fillna("").str.normalize("NFC").str.lower().str.normalize("NFC")
    arr = pa.array(s, pa.string())
    arr = pc.replace_substring_regex(arr, r"\s+", " ")
    arr = pc.utf8_trim_whitespace(arr)
    if null_mask.any():
        arr = pc.if_else(pa.array(null_mask),
                         pa.scalar(None, pa.string()), arr)
    return arr


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


_MOJIBAKE_MARKERS = ["Ã", "â€", "Â", "Ð", "Ñ\x82"]


def _sloppy_cp1252_errors(err):
    """ftfy's 'sloppy windows-1252': the five byte positions cp1252
    leaves undefined (0x81 8D 8F 90 9D) arrive as C1 control chars
    when misdecoded — map them back to their raw byte so the reverse
    roundtrip can reconstruct the original UTF-8."""
    chunk = err.object[err.start:err.end]
    out = bytearray()
    for c in chunk:
        if 0x80 <= ord(c) <= 0x9F:
            out.append(ord(c))
        else:
            raise err
    return bytes(out), err.end


def _ensure_sloppy_codec() -> None:
    """Idempotent error-handler registration — must run in every
    process that repairs (cloudpickled closures don't re-import this
    module on Ray workers, so module-import-time registration is not
    enough)."""
    import codecs

    try:
        codecs.lookup_error("bento_sloppy_cp1252")
    except LookupError:
        codecs.register_error("bento_sloppy_cp1252",
                              _sloppy_cp1252_errors)


_ensure_sloppy_codec()


def fix_mojibake(ds, col: str = "text", out_col: str = "fixed_text",
                 max_rounds: int = 2):
    """Repair UTF-8-bytes-misdecoded-as-cp1252 text (ftfy's core move:
    'café' crawled as 'cafÃ©', 'don’t' as 'donâ€™') — a standard web-
    corpus cleaning pass. Detection is one vectorized Arrow substring
    scan for mojibake marker bytes; only FLAGGED rows (a small
    fraction of a real crawl) pay the per-string
    cp1252-encode → utf-8-decode roundtrip, applied up to
    ``max_rounds`` times (double-encoded text exists) and only while
    it round-trips losslessly — rows that fail either codec are left
    untouched. Appends ``out_col`` and a ``was_mojibake`` flag."""

    def _fix_one(s: str) -> str:
        for _ in range(max_rounds):
            try:
                repaired = s.encode(
                    "cp1252", errors="bento_sloppy_cp1252").decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return s
            if repaired == s:
                return s
            s = repaired
            if not any(m in s for m in _MOJIBAKE_MARKERS):
                return s
        return s

    def _f(t: pa.Table) -> pa.Table:
        _ensure_sloppy_codec()
        txt = t.column(col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flagged = pc.fill_null(pc.match_substring(txt, "Ã"), False)
        for m in _MOJIBAKE_MARKERS[1:]:
            flagged = pc.or_(flagged, pc.fill_null(
                pc.match_substring(txt, m), False))
        mask = flagged.to_numpy(zero_copy_only=False)
        vals = txt.to_pylist()
        out = [(_fix_one(v) if (v is not None and hit) else v)
               for v, hit in zip(vals, mask)]
        t = t.append_column(out_col, pa.array(out, pa.string()))
        return t.append_column(
            "was_mojibake",
            pa.array([o != v for o, v in zip(out, vals)], pa.bool_()))

    return ds.map_batches(_f, batch_format="pyarrow")
