"""Repro/bisect for the x100 semantic-dedup driver-side stall: a
single Catalyst sizeInBytes stats computation grinding in
BigInteger.multiply (Toom-Cook = operands with >100k digits) during a
localCheckpoint inside the CC loop.  Instruments each phase and each
CC round with wall time + logical-plan node count.

Usage: python tools/repro_semantic_x100.py [K]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def nodes(df) -> int:
    return df._jdf.queryExecution().analyzed().collectLeaves().size()


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    from pyspark.sql import functions as F

    from mysql_cdc_spark.operators import similarity
    from mysql_cdc_spark.session import get_spark
    from mysql_cdc_spark.sources.io import read_table

    spark = get_spark("repro-semantic")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = f"/root/repo/.stream_tmp/stress/organic_x{k}"
    emb = read_table(spark, sf_dir, "embeddings")
    print("emb rows:", emb.count(), flush=True)

    t0 = time.perf_counter()
    pairs = similarity.embedding_neardup_pairs(emb).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    n_pairs = pairs.count()
    print(f"pairs: {n_pairs} in {time.perf_counter()-t0:.1f}s", flush=True)

    docs = emb.select(F.col("vec_id").alias("doc_id"))

    # inline duplicate_components with per-round instrumentation
    p = pairs.select("doc_a", "doc_b")
    t0 = time.perf_counter()
    edges = (
        p.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(p.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    print(f"edges ckpt {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    labels = docs.select("doc_id", F.col("doc_id").alias("component")).localCheckpoint(
        eager=True
    )
    print(f"labels ckpt {time.perf_counter()-t0:.1f}s", flush=True)

    for r in range(25):
        t0 = time.perf_counter()
        nbr_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = labels.join(nbr_min, labels.doc_id == nbr_min.src, "left").select(
            "doc_id",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )
        parent = stepped.select(
            F.col("doc_id").alias("p_id"), F.col("component").alias("p_comp")
        )
        new_labels = (
            stepped.join(parent, stepped.component == parent.p_id, "left")
            .select(
                "doc_id",
                F.coalesce(F.col("p_comp"), F.col("component")).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        t_ck = time.perf_counter() - t0
        t0 = time.perf_counter()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        t_cnt = time.perf_counter() - t0
        labels = new_labels
        print(f"round {r}: ckpt {t_ck:.1f}s count {t_cnt:.1f}s changed {changed}", flush=True)
        if changed == 0:
            break


if __name__ == "__main__":
    main()
