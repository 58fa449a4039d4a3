"""Generate hash-pinned golden outputs for the non-SQL-expressible
queries (VERDICT r1 item 10): simhash / lang_id / fingerprints /
quality / minhash pairs / ann_lsh at sf0.001.

The goldens pin DETERMINISM and guard regressions: any change to the
algorithms (hash constants, shingling, banding, heuristics) shows up
as a golden diff that must be consciously regenerated with
``python tools/make_goldens.py``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")

QUERIES = ["q_simhash", "q_lang_id", "q_doc_fingerprints",
           "q_quality_scores", "q_minhash_near_dups", "q_ann_lsh",
           "q_ann_ivf", "q_cosine_near_dups_lsh"]

SORT_KEYS = {
    "q_simhash": ["doc_id"],
    "q_lang_id": ["doc_id"],
    "q_doc_fingerprints": ["doc_id"],
    "q_quality_scores": ["doc_id"],
    "q_minhash_near_dups": ["doc_a", "doc_b"],
    "q_ann_lsh": ["query_id", "doc_id"],
    "q_ann_ivf": ["query_id", "vec_id"],
    "q_cosine_near_dups_lsh": ["id_a", "id_b"],
}


def canon(res, name: str) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        df = res
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res.to_pandas()
    keys = [k for k in SORT_KEYS[name] if k in df.columns] or \
        list(df.columns)
    return (df[sorted(df.columns)]
            .sort_values(keys, kind="stable")
            .reset_index(drop=True))


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entrymod

    q = entrymod.queries()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in QUERIES:
        df = canon(q[name]("/root/testdata/sf0.001"), name)
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False)
            .replace_schema_metadata(None), path)
        print(f"wrote {path}: {len(df)} rows")
    ray.shutdown()


if __name__ == "__main__":
    main()
