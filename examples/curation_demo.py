"""Runnable tour of the training-data layer. Usage:

    cd /root/repo && python examples/curation_demo.py

Walks a synthetic documents table through the curation ops end-to-end:
URL dedup → paragraph dedup → quality gate → CCNet perplexity buckets
→ deterministic shuffle → BPE training → a trained quality classifier
— every stage the operator the driver gate hash-checks against DuckDB.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import ray

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    from bento_ray.pipelines.curation import curate_documents
    from bento_ray.sources.inputs import read_parquet
    from bento_ray.textops import (bpe_encode_word, bpe_train,
                                   ccnet_buckets, seeded_shuffle)
    from bento_ray.textops.classify import (logreg_fit_hashed,
                                            logreg_score_hashed)

    docs = read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text", "lang"])

    print("== curation chain (paragraph dedup → quality gate) ==")
    print(curate_documents(docs).to_pandas().to_string(index=False))

    print("\n== CCNet perplexity buckets per language ==")
    print(ccnet_buckets(docs).to_pandas()
          .sort_values(["lang", "bucket"]).to_string(index=False))

    print("\n== deterministic epoch shuffle (first 5 by seed 7) ==")
    print(seeded_shuffle(docs.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"), seed=7)
        .limit(5).to_pandas().to_string(index=False))

    print("\n== BPE: 8 merges learned from the corpus ==")
    merges = bpe_train(docs, num_merges=8)
    print(merges)
    print("encode('merge'):", bpe_encode_word("merge", merges))

    print("\n== quality classifier (spam lacing, 6 GD iterations, "
          "presence features) ==")

    def _lace(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        import pandas as pd
        txt = t.column("text").to_pandas()
        spam = ids % 3 == 0
        laced = (txt + " win free prize click now offer").where(spam, txt)
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(laced, pa.string()),
                         "y": pa.array(spam.astype(np.float64))})

    laced = docs.map_batches(_lace, batch_format="pyarrow")
    wn = logreg_fit_hashed(laced, label_col="y", n_buckets=64, iters=6,
                           binary=True)
    scored = logreg_score_hashed(laced, wn, binary=True).to_pandas()
    spam_mean = scored[scored["y"] == 1.0]["score"].mean()
    ham_mean = scored[scored["y"] == 0.0]["score"].mean()
    print(f"mean score — spam: {spam_mean:.3f}, ham: {ham_mean:.3f}")

    ray.shutdown()


if __name__ == "__main__":
    main()
