"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the bento_ray library) calls ``ray.init()`` /
``ray.shutdown()``.

- ``entry()``: flagship pipeline (strip_html extraction → dedupe →
  tumbling event-time windows → per-lang aggregate → versioned
  enrichment join) over a pages stream derived from
  /root/testdata/sf0.001/documents.parquet.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator
  family from SURVEY.md §2 plus the training-data ops; see
  bento_ray/pipelines/queries.py for the catalogue and the naming /
  rounding conventions shared with the DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from bento_ray.pipelines.flagship import flagship_batch, pages_from_documents

    pages = pages_from_documents("/root/testdata/sf0.001")
    return flagship_batch(pages)


def queries() -> dict[str, Callable[[str], Any]]:
    from bento_ray.pipelines.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from bento_ray.pipelines.queries import oracle_sql as _o

    return _o()
