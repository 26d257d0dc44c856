"""Graph analytics over relationship tables: fixed-iteration PageRank
on the customer<->supplier trade graph (who transacts with whom, from
lineitem x orders).  The reference engine has no joins at all
(src/cdc/jdbc.clj:397-570), let alone iterative graph dataflow; here
each power iteration is one shuffle-on-node-id aggregation, unrolled a
fixed number of times — the same unrolled-iteration pattern as the
k-means and BPE operators, which makes a closed-form SQL oracle
possible (chained CTEs, one per iteration).

Determinism contract: ALL state is integer.  Ranks live in BIGINT
units of 1e-8; each per-edge contribution is floor(r*w/outw + 0.5)
(one double division of exact integers — identical expression tree on
both engines, unlike round(), whose half-way semantics differ), and
the damped update is floor(0.85*Σ + 0.5) on the exact BIGINT sum —
bit-identical across engines and partitionings.

Scale shape: edges shuffle once per iteration on the destination node
(map-side-combinable sum); rank vectors are one row per node.  Skewed
hub nodes are ordinary groupBy skew (AQE-splittable).  No driver-side
loops over data — only the fixed iteration count unrolls in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ITERS = 2


def trade_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Undirected bipartite edges customer<->supplier weighted by
    lineitem count (both directions materialized)."""
    e = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    cust = F.concat(F.lit("c"), F.col("o_custkey"))
    supp = F.concat(F.lit("s"), F.col("l_suppkey"))
    return (
        e.select(cust.alias("src"), supp.alias("dst"), "w")
        .unionByName(e.select(supp.alias("src"), cust.alias("dst"), "w"))
    )


UNIT = 100_000_000  # rank fixed-point: BIGINT units of 1e-8


def pagerank(edges: DataFrame, iters: int = ITERS, damping: float = DAMPING) -> DataFrame:
    """Fixed-iteration weighted PageRank from uniform rank 1.0
    (integer fixed-point; see module determinism contract).

    rank_{t+1}(v) = (1-d) + d * Σ_{u->v} rank_t(u) * w / outw(u)
    """
    outw = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("outw"))
    e = edges.join(outw, "src")
    ranks = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct().withColumn("r", F.lit(UNIT).cast("bigint"))
    base_units = round((1.0 - damping) * UNIT)
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .withColumn(
                "c",
                F.floor(
                    (F.col("r") * F.col("w")) / F.col("outw") + F.lit(0.5)
                ).cast("bigint"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("in_sum"))
        )
        ranks = (
            ranks.join(contrib, ranks.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base_units).cast("bigint")
                    + F.floor(
                        F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0))
                        + F.lit(0.5)
                    ).cast("bigint")
                ).alias("r"),
            )
        )
    return ranks.select(
        "node", (F.col("r").cast("double") / F.lit(float(UNIT))).alias("rank")
    )
