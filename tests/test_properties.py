"""Property-based invariants (hypothesis) for the parity-critical
arithmetic: window assignment, RFC3339Nano, DuckDB-round emulation,
strip_html structural laws."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from bento_ray.html import strip_html
from bento_ray.stages.window import assign_sliding, tumbling_window_end
from bento_ray.util import duckdb_round, rfc3339nano


@given(st.integers(min_value=1, max_value=10**15),
       st.integers(min_value=1, max_value=10**9))
@settings(max_examples=200, deadline=None)
def test_tumbling_membership_invariant(ts, size):
    """Every ts lands in exactly the left-open right-closed window
    (end-size, end]."""
    end = int(tumbling_window_end(np.array([ts], np.int64), size)[0])
    assert end - size < ts <= end
    assert end % size == 0


@given(st.integers(min_value=1, max_value=10**14),
       st.integers(min_value=2, max_value=1000))
@settings(max_examples=100, deadline=None)
def test_sliding_pane_count_invariant(ts, slide):
    """With size = 3*slide, every row is duplicated into exactly 3
    panes, each containing the ts."""
    size = slide * 3
    t = pa.table({"ts": pa.array([ts], pa.timestamp("us", tz="UTC"))})
    out = assign_sliding(t, "ts", size, slide)
    ends = out.column("window_end").cast(pa.int64()).to_pylist()
    assert len(ends) == 3
    for e in ends:
        assert e - size < ts <= e


@given(st.integers(min_value=0, max_value=4 * 10**15))
@settings(max_examples=200, deadline=None)
def test_rfc3339nano_no_trailing_zeros(us):
    s = rfc3339nano(us)
    assert s.endswith("Z")
    if "." in s:
        frac = s.split(".")[1][:-1]
        assert frac and not frac.endswith("0")


@given(st.floats(min_value=-1e9, max_value=1e9,
                 allow_nan=False, allow_infinity=False))
@settings(max_examples=300, deadline=None)
def test_duckdb_round_matches_duckdb(v):
    import duckdb

    # Bind the value as a parameter: DuckDB v1.0's decimal-literal parser is
    # 1 ulp off Python's strtod for some values (e.g. 360287970.95315003),
    # which is a parsing difference, not a round-kernel difference. Oracle
    # comparisons read binary doubles from parquet, so only the kernel matters.
    want = duckdb.execute(
        "select round(CAST(? AS DOUBLE), 4)", [v]).fetchone()[0]
    got = float(duckdb_round(np.array([v]))[0])
    assert got == want, (v, got, want)


_word = st.text(alphabet="abcdefghij XYZ012", min_size=0, max_size=20)


@given(st.lists(st.tuples(st.sampled_from(["p", "div", "span", "em"]), _word),
                min_size=0, max_size=8))
@settings(max_examples=100, deadline=None)
def test_strip_html_concatenates_wrapped_text(parts):
    """Wrapping arbitrary plain text (no specials) in container tags
    strips to the exact concatenation."""
    html = "".join(f"<{tag}>{txt}</{tag}>" for tag, txt in parts)
    assert strip_html(html) == "".join(txt for _, txt in parts)


@given(_word, _word)
@settings(max_examples=100, deadline=None)
def test_strip_html_drops_skip_content(a, b):
    html = f"{a}<script>var x = 'junk';</script><style>.c{{}}</style>{b}"
    assert strip_html(html) == a + b
