"""Graph operator tests (operators/graph.py)."""

from __future__ import annotations

from mysql_cdc_spark.operators import graph


def test_pagerank_mass_flows_to_hub(spark):
    # star: customers 1..4 each trade once with supplier 1; customer 1
    # also trades with supplier 2 heavily.
    edges_rows = [
        ("c1", "s1", 1), ("s1", "c1", 1),
        ("c2", "s1", 1), ("s1", "c2", 1),
        ("c3", "s1", 1), ("s1", "c3", 1),
        ("c4", "s1", 1), ("s1", "c4", 1),
        ("c1", "s2", 9), ("s2", "c1", 9),
    ]
    edges = spark.createDataFrame(edges_rows, "src string, dst string, w long")
    ranks = {r["node"]: r["rank"] for r in graph.pagerank(edges).collect()}
    assert ranks["s1"] > ranks["s2"]               # 4 spokes beat one feeder
    assert ranks["c1"] > ranks["c2"]               # s2 funnels its mass to c1
    assert ranks["c2"] == ranks["c3"] == ranks["c4"]  # symmetric spokes agree
    # total mass conserved up to damping leakage: every rank positive
    assert all(v > 0 for v in ranks.values())


def test_pagerank_deterministic_across_partitionings(spark):
    rows = [(f"c{i}", f"s{i % 3}", 1 + i % 5) for i in range(60)]
    rows += [(d, s, w) for (s, d, w) in rows]
    e1 = spark.createDataFrame(rows, "src string, dst string, w long")
    e2 = e1.repartition(7)
    r1 = sorted(map(tuple, graph.pagerank(e1).collect()))
    r2 = sorted(map(tuple, graph.pagerank(e2).collect()))
    assert r1 == r2
