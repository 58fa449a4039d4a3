"""Golden-test harness — the reference's config-driven unit-test
machinery (``bento test``, SURVEY.md §3.3/§5) re-expressed for batch
pipelines.

The reference runs YAML cases: ``input_batches`` → target processors →
``output_batches`` with per-message predicates
(internal/config/test/output.go:30-66). Here a ``GoldenCase`` holds
input semantic batches (pyarrow Tables), a processor (table(s)→table(s)
callable), and expected outputs asserted with the same predicate
vocabulary:

- ``content_equals`` / ``content_matches`` (regex)
- ``json_equals`` / ``json_contains`` (recursive superset)
- ``metadata_equals`` (column value per row)
- table-level ``rows_equal`` (order-insensitive by sort key) and
  ``bytes_equal`` (exact string/bytes column equality — the strip_html
  invariant check)
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Callable, Sequence

import pandas as pd
import pyarrow as pa


def content_equals(t: pa.Table, row: int, want: str,
                   col: str = "content") -> None:
    got = t.column(col)[row].as_py()
    assert got == want, f"content_equals[{row}]: {got!r} != {want!r}"


def content_matches(t: pa.Table, row: int, pattern: str,
                    col: str = "content") -> None:
    got = t.column(col)[row].as_py()
    assert re.search(pattern, got), \
        f"content_matches[{row}]: {pattern!r} !~ {got!r}"


def _contains(sub, sup) -> bool:
    """Recursive superset check (json_contains semantics)."""
    if isinstance(sub, dict):
        return isinstance(sup, dict) and all(
            k in sup and _contains(v, sup[k]) for k, v in sub.items())
    if isinstance(sub, list):
        return isinstance(sup, list) and len(sub) == len(sup) and all(
            _contains(a, b) for a, b in zip(sub, sup))
    return sub == sup


def json_equals(t: pa.Table, row: int, want, col: str = "content") -> None:
    got = json.loads(t.column(col)[row].as_py())
    assert got == want, f"json_equals[{row}]: {got!r} != {want!r}"


def json_contains(t: pa.Table, row: int, want, col: str = "content") -> None:
    got = json.loads(t.column(col)[row].as_py())
    assert _contains(want, got), f"json_contains[{row}]: {want!r} ⊄ {got!r}"


def _strip_nulls(v):
    """Normalize Arrow's struct-type unification (heterogeneous structs
    in one list column gain null-valued fields) back to JSON-like
    shape before comparing."""
    if isinstance(v, dict):
        return {k: _strip_nulls(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_strip_nulls(x) for x in v]
    return v


def metadata_equals(t: pa.Table, row: int, col: str, want) -> None:
    got = _strip_nulls(t.column(col)[row].as_py())
    assert got == want, f"metadata_equals[{row}].{col}: {got!r} != {want!r}"


def rows_equal(got: pa.Table | pd.DataFrame, want: pa.Table | pd.DataFrame,
               sort_by: Sequence[str] | None = None) -> None:
    g = got.to_pandas() if isinstance(got, pa.Table) else got.copy()
    w = want.to_pandas() if isinstance(want, pa.Table) else want.copy()
    cols = sorted(g.columns)
    assert cols == sorted(w.columns), f"columns differ: {cols} vs {sorted(w.columns)}"
    key = list(sort_by) if sort_by else cols
    g = g[cols].sort_values(key, kind="stable").reset_index(drop=True)
    w = w[cols].sort_values(key, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def bytes_equal(got: pa.Table, want: pa.Table, col: str,
                key: str | None = None) -> None:
    """Byte-for-byte column equality (keyed when ``key`` given) — the
    strip_html per-url invariant predicate."""
    if key is not None:
        g = dict(zip(got.column(key).to_pylist(), got.column(col).to_pylist()))
        w = dict(zip(want.column(key).to_pylist(), want.column(col).to_pylist()))
        assert g.keys() == w.keys(), "key sets differ"
        for k in g:
            assert g[k] == w[k], f"bytes differ at {key}={k!r}"
    else:
        assert got.column(col).to_pylist() == want.column(col).to_pylist()


@dataclass
class GoldenCase:
    """One transcribed test case: semantic input batches → processor →
    expected output batches (+ optional per-row predicate thunks)."""

    name: str
    input_batches: list[pa.Table]
    processor: Callable[[list[pa.Table]], list[pa.Table]]
    expected_batches: list[pa.Table] | None = None
    predicates: list[Callable[[list[pa.Table]], None]] = field(
        default_factory=list)

    def run(self) -> list[pa.Table]:
        out = self.processor(self.input_batches)
        if self.expected_batches is not None:
            assert len(out) == len(self.expected_batches), (
                f"{self.name}: {len(out)} output batches, expected "
                f"{len(self.expected_batches)}")
            for i, (g, w) in enumerate(zip(out, self.expected_batches)):
                gl = g.to_pandas().reset_index(drop=True)
                wl = w.to_pandas().reset_index(drop=True)
                try:
                    pd.testing.assert_frame_equal(gl, wl, check_dtype=False)
                except AssertionError as exc:
                    raise AssertionError(
                        f"{self.name}: batch {i} differs: {exc}") from exc
        for pred in self.predicates:
            pred(out)
        return out
