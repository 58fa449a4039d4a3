"""Regenerate the generated-counts footer in COVERAGE.md.

Counts are DERIVED (never hand-maintained): queries/oracles from
__ray_entry__, tests collected from pytest. Run from the repo root:

    python tools/gen_counts.py        # rewrite COVERAGE.md footer
    python tools/gen_counts.py --check  # exit 1 if footer is stale
"""

import re
import subprocess
import sys

MARK = "## Counts (generated — `python tools/gen_counts.py`)"


def counts() -> str:
    sys.path.insert(0, ".")
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    missing = sorted(set(q) - set(o))
    tests = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True).stdout
    m = re.search(r"(\d+) tests collected", tests)
    ntests = m.group(1) if m else "?"
    return (f"{MARK}\n\n"
            f"- queries: **{len(q)}** · DuckDB oracles: **{len(o)}** · "
            f"rows-only (no oracle): **{len(missing)}**"
            + (f" ({', '.join(missing)})" if missing else "") + "\n"
            f"- pytest tests collected: **{ntests}**\n")


def main() -> int:
    with open("COVERAGE.md") as fh:
        body = fh.read()
    idx = body.find(MARK)
    base = body[:idx].rstrip() + "\n\n" if idx >= 0 else body.rstrip() + "\n\n"
    new = base + counts()
    if "--check" in sys.argv:
        return 0 if new == body else 1
    with open("COVERAGE.md", "w") as fh:
        fh.write(new)
    print(counts())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
