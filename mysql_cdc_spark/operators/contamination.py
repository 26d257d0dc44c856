"""Benchmark-contamination detection: find training documents that
share n-gram content with a held-out evaluation set — the scrub every
serious pretraining pipeline runs so eval numbers stay meaningful.

Mechanism: both sides explode to word-3-gram shingles (the same
normalization as the dedup family, operators/dedup.py), high-frequency
shingles are dropped by the corpus-wide document-frequency cap (the
quadratic-join guard), and the remaining inverted indexes equi-join on
the shingle — never an all-pairs comparison.  At 100 TB the benchmark
side is small (broadcast) and the corpus side streams through the
join partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mysql_cdc_spark.operators.dedup import MAX_SHINGLE_DF, with_shingles

# A hit needs at least this many distinct shared shingles — one shared
# trigram is noise; several is copied text.
MIN_SHARED = 2


def benchmark_contamination(
    docs: DataFrame,
    is_benchmark: Column,
    min_shared: int = MIN_SHARED,
    max_shingle_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """(train_doc_id, bench_doc_id, n_shared) for every train/benchmark
    pair sharing ≥ `min_shared` distinct shingles (after the frequency
    cap).  `is_benchmark` is a boolean Column over `docs`."""
    # cache(): the exploded subtree is consumed three times (df cap,
    # train side, bench side) and Generate re-inlines the shingle
    # array chain per element without a materialization boundary
    # (the jaccard_pairs / dup_spans trap).
    shingled = with_shingles(docs).withColumn("__bench", is_benchmark).cache()
    inv = shingled.select(
        "doc_id", "__bench", F.explode("shingles").alias("shingle")
    )
    # Corpus-wide document frequency cap (counted over BOTH sides, so
    # the cap is independent of the benchmark split).
    dfok = (
        inv.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_shingle_df)
        .select("shingle")
    )
    capped = inv.join(dfok, "shingle")
    train = capped.filter(~F.col("__bench")).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    bench = capped.filter(F.col("__bench")).select(
        F.col("doc_id").alias("bench_doc_id"), "shingle"
    )
    return (
        train.join(bench, "shingle")
        .groupBy("train_doc_id", "bench_doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
