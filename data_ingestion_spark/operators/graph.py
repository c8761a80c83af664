"""Iterative graph operators over edge DataFrames.

Companion to the connected-components labeler in dedup.py (the dedup
clustering pass): PageRank here serves corpus-graph analyses — node
importance over similarity graphs, link graphs, or bipartite entity graphs
(e.g. customer↔supplier) — with fully deterministic, oracle-replayable
iterations.

Scale notes: every iteration is one equi-join (contributions) plus one
partial-aggregated groupBy on the destination key; nothing materializes
beyond (node, rank). ``localCheckpoint`` truncates lineage each round so
unrolled iterations don't stack a deep plan tree (same pattern as
dedup.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
    every_node_has_out_edges: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    The classic simplified formulation (the one in the original Spark
    examples): ``pr'(v) = (1-d)/N + d * Σ pr(u)/outdeg(u)`` over in-edges
    ``u→v``; dangling-node mass is not redistributed. A FIXED iteration
    count (not convergence-tested) keeps the result bit-replayable by the
    SQL oracle — the same three join+agg rounds in chained CTEs.

    Bit-replayability is engineered, not assumed: each contribution is
    quantized to integer femto-units (``floor(pr/deg * 1e15 + 0.5)::long``)
    BEFORE the inflow sum, so the per-node aggregation is an exact,
    order-independent integer sum — a differently-ordered DOUBLE sum could
    drift by an ulp between Spark's shuffle order and the oracle's and flip
    the final nano rounding. The 1e-15 quantization grid sits six orders
    below the 1e-9 output grid (inflow error ≤ indeg·5e-16), and every
    remaining float op (divide, damping multiply-add) is a single IEEE
    operation on identical inputs in both engines.

    Output: (node, pr_nano) — rank scaled to integer nano-units via
    floor(pr*1e9 + 0.5), the engine-portable rounding used throughout this
    repo (IEEE floor/division are bit-exact where round()'s ties are not).
    """
    # Iterative algorithms MUST pin their loop-invariant inputs: without the
    # persists below, every iteration re-executes the upstream edge
    # derivation (often an expensive join+distinct), and the final action
    # replays the whole chain once more per reference. Eager localCheckpoint
    # on pr truncates the growing lineage each round — at cluster scale use
    # reliable checkpointing; the shape is identical.
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).persist()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    if every_node_has_out_edges:
        # symmetric / undirected-style edge lists (both directions present):
        # the source-key set IS the node set, so reuse outdeg's shuffle
        # instead of paying a second full-edge distinct
        nodes = outdeg.select(F.col("src").alias("node"))
    else:
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
    n = nodes.count()
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        # rank/outdeg emission rates: a node-count-sized join (tiny next to
        # the edge list). Joining the big edge list against this SMALL side
        # lets AQE broadcast it — the edges themselves are never re-keyed
        # or widened, which beats pinning a (src, dst, deg) copy of the
        # whole edge list.
        rate = (
            pr.withColumnRenamed("node", "src")
            .join(outdeg, "src")
            .select(
                "src",
                F.floor(
                    (F.col("pr") / F.col("deg")) * F.lit(1e15) + F.lit(0.5)
                )
                .cast("long")
                .alias("c_femto"),
            )
        )
        contrib = (
            e.join(rate, "src")
            .select(F.col("dst").alias("node"), "c_femto")
            .groupBy("node")
            .agg(F.sum("c_femto").alias("inflow_femto"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow_femto"), F.lit(0)).cast("double")
                        / F.lit(1e15)
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    out = pr.select(
        "node", F.floor(F.col("pr") * F.lit(1e9) + F.lit(0.5)).cast("long").alias("pr_nano")
    )
    e.unpersist()
    outdeg.unpersist()
    if not every_node_has_out_edges:
        nodes.unpersist()
    return out
