"""Data-layout operators: Z-order (Morton-curve) file clustering for
multi-dimensional scan pruning.

A 100-TB events table is usually laid out by time alone, so a query
filtering on (user, time window) still reads every file in the window.
Z-ordering interleaves the bits of both dimensions into one sort key;
range-partitioning files by that key gives every file a small
RECTANGLE in (user, time) space, so min/max footer stats prune on
BOTH columns — the same layout step Delta's OPTIMIZE ZORDER or an
Iceberg sort-order rewrite performs.  No reference analog (the
reference ends at the change stream); this is the sink-side layout
the decoded stream should be written into.

Spark shape: the z-value is a narrow per-row bit-interleave (pure
integer expressions, whole-stage codegen); file assignment is integer
division of the z key; the audit aggregate is one map-side-combined
groupBy on the tiny file-id key space.  In production the same z
column feeds `repartitionByRange(z).sortWithinPartitions(z)` before
the parquet write — the query form here emits the per-file min/max
stats a file-skipping scan would consult, so the oracle can verify
the whole layout algebra exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZBITS = 8  # bits per dimension -> 16-bit z space


def _interleave_sql(a: str, b: str, bits: int = ZBITS) -> str:
    """SQL for the Morton interleave of two `bits`-bit ints: a's bit j
    lands at position 2j, b's at 2j+1.  Plain &/shift arithmetic that
    Spark SQL and DuckDB evaluate identically on BIGINT."""
    terms = []
    for j in range(bits):
        terms.append(f"((({a} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({b} >> {j}) & 1) << {2 * j + 1})")
    return " + ".join(terms)


def zorder_file_stats(events: DataFrame, files: int = 64) -> DataFrame:
    """Assign every event to a z-ordered file and emit the per-file
    pruning stats (row count, min/max of each dimension bucket).

    Dimensions: user bucket = user_id mod 2^ZBITS, hour bucket =
    hours-since-epoch mod 2^ZBITS.  File id = z div (z-space /
    files).  The tighter each file's per-dimension span, the more
    files a two-predicate scan can skip on footer stats alone —
    `tests/test_layout.py` asserts the spans are rectangles far
    smaller than the full range, which a single-dimension sort cannot
    achieve for both columns at once.
    """
    side = 1 << ZBITS
    zspace = side * side
    per_file = zspace // files
    u = F.pmod(F.col("user_id"), F.lit(side)).cast("bigint")
    # integer div end-to-end: float division of epoch-micros would be
    # exact here (below 2^53) but `div` keeps both engines trivially
    # identical with no representability argument needed
    h = F.pmod(
        F.expr("unix_micros(ts) div 3600000000"), F.lit(side)
    ).cast("bigint")
    keyed = events.select(u.alias("u"), h.alias("h")).withColumn(
        "z", F.expr(_interleave_sql("u", "h")).cast("bigint")
    )
    return (
        keyed.withColumn("file_id", F.expr(f"z div {per_file}").cast("bigint"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("u").cast("bigint").alias("min_u"),
            F.max("u").cast("bigint").alias("max_u"),
            F.min("h").cast("bigint").alias("min_h"),
            F.max("h").cast("bigint").alias("max_h"),
        )
    )


def zorder_write(events: DataFrame, path: str, files: int = 64) -> None:
    """The actual layout step: compute the z key, range-partition into
    `files` partitions, sort within each, and write parquet.  Every
    output file then covers one contiguous z range = one small
    (user, time) rectangle, so parquet FOOTER min/max stats on the
    materialized u/h columns let any stats-aware reader skip files on
    two-predicate lookups (`tests/test_layout.py` asserts the footer
    stats of the written files directly via pyarrow).

    repartitionByRange samples the z key for balanced boundaries —
    the same mechanism a 1000-executor sort uses; no driver-side
    anything.
    """
    side = 1 << ZBITS
    u = F.pmod(F.col("user_id"), F.lit(side)).cast("bigint")
    h = F.pmod(
        F.expr("unix_micros(ts) div 3600000000"), F.lit(side)
    ).cast("bigint")
    keyed = (
        events.withColumn("u", u)
        .withColumn("h", h)
        .withColumn("z", F.expr(_interleave_sql("u", "h")).cast("bigint"))
    )
    (
        keyed.repartitionByRange(files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )
