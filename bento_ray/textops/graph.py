"""Link-graph operators for web corpora.

PageRank is the canonical iterative wide-op over a crawl's outlink
graph (domain authority for quality weighting, crawl prioritization).
The implementation is the honest distributed shape at 10^12 nodes:

- the rank vector is a (node, rank) Dataset, never a driver array;
- each iteration is ONE shuffle join (ranks ⋈ edges on src) feeding
  ONE grouped sum (contributions by dst) — the same two exchanges a
  Pregel superstep costs, expressed as Dataset ops;
- edges are materialized once, pre-joined with out-degrees, so the
  per-iteration state is exactly the rank vector (narrow, 16 B/node).

Determinism: per-iteration float sums are associative-order dependent
at the last bits (~1e-16 relative); callers compare at a rounding
grain (the oracle rounds to 8 decimals). Dangling nodes (out-degree
0) simply emit no mass — the SQL oracle applies the same rule, and
the constructed gate graph has none.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Sum

__all__ = ["pagerank"]


def pagerank(edges, nodes, *, iters: int = 3, damping: float = 0.85,
             id_col: str = "node", src_col: str = "src",
             dst_col: str = "dst"):
    """Power-iteration PageRank. ``edges``: Dataset (src, dst);
    ``nodes``: Dataset with the node id column (defines the id space —
    isolated nodes keep the base rank). Returns (node, rank) after
    ``iters`` iterations from the uniform vector, with the standard
    update r' = (1-d)/N + d · Σ_in r/outdeg."""
    from bento_ray.stages.join import shuffle_join

    # pin the node-id projection once: `nodes` may carry an arbitrary
    # upstream lineage (parse/dedupe stages) that count(), the rank
    # initializer and the per-iteration join would otherwise each
    # re-execute from scratch
    nodes = nodes.map_batches(
        lambda t: t.select([id_col]), batch_format="pyarrow").materialize()
    n_total = nodes.count()
    base = (1.0 - damping) / n_total

    def _deg_partial(t: pa.Table) -> pa.Table:
        agg = (pa.table({"src": t.column(src_col)})
               .group_by("src").aggregate([("src", "count")]))
        return pa.table({"src": agg.column("src"),
                         "d": agg.column("src_count").cast(pa.int64())})

    outdeg = (edges.map_batches(_deg_partial, batch_format="pyarrow")
              .groupby("src").aggregate(Sum("d", alias_name="outdeg")))
    # one-time edge prep: (src, dst, outdeg) — iteration state is then
    # only the rank vector
    ew = shuffle_join(
        edges.map_batches(
            lambda t: pa.table({"src": t.column(src_col),
                                "dst": t.column(dst_col)}),
            batch_format="pyarrow").materialize(),
        outdeg.materialize(), on="src", how="left",
        force_fallback=True).materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table({"src": t.column(id_col),
                            "r": pa.array(np.full(len(t), 1.0 / n_total))}),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        joined = shuffle_join(ew, ranks, on="src", how="inner",
                              force_fallback=True)

        def _contrib(t: pa.Table) -> pa.Table:
            r = t.column("r").to_numpy()
            d = t.column("outdeg").to_numpy().astype(np.float64)
            agg = (pa.table({"dst": t.column("dst"),
                             "c": pa.array(r / d)})
                   .group_by("dst").aggregate([("c", "sum")]))
            return pa.table({"dst": agg.column("dst"),
                             "c": agg.column("c_sum")})

        inbound = (joined.map_batches(_contrib, batch_format="pyarrow")
                   .groupby("dst").aggregate(Sum("c", alias_name="s")))
        nodes_k = nodes.map_batches(
            lambda t: pa.table({"dst": t.column(id_col)}),
            batch_format="pyarrow")
        merged = shuffle_join(nodes_k.materialize(), inbound.materialize(),
                              on="dst", how="left", force_fallback=True)

        def _update(t: pa.Table) -> pa.Table:
            s = t.column("s").to_numpy(zero_copy_only=False)
            s = np.where(np.isnan(s.astype(np.float64)), 0.0,
                         s.astype(np.float64))
            return pa.table({"src": t.column("dst"),
                             "r": pa.array(base + damping * s)})

        ranks = merged.map_batches(_update,
                                   batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda t: pa.table({id_col: t.column("src"),
                            "rank": t.column("r")}),
        batch_format="pyarrow")
