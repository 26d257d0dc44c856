"""Entity resolution / record linkage: multi-pass blocking + edit-
distance verify — the structured-record counterpart of document dedup
(a training-data pipeline dedups user/author/source records as well as
text).  No reference analog (the reference has no join at all,
src/cdc/jdbc.clj:397-570); standard Fellegi-Sunter-style pipeline
re-expressed Spark-first.

Scale design: candidates come ONLY from block equi-joins — two passes
(name prefix, name suffix) so a single-character corruption anywhere
but both ends still lands in at least one shared block.  Each pass is
a bucketed equi-join on (nation, 3-char key); Levenshtein runs on
candidate pairs only.  Never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_LEV = 2        # verify threshold
DIRTY_EVERY = 10   # every Nth record gets a corrupted twin


def synth_records(customer: DataFrame) -> DataFrame:
    """Deterministic person-record corpus from `customer`: each record
    gets an md5-derived two-word name (unique-ish, unlike the uniform
    TPC-H name column); every 10th record also emits a DIRTY twin
    (rid + 10^7) whose name drops one mid-string character — the
    planted match target."""
    base = customer.select(
        F.col("c_custkey").alias("rid"),
        F.concat(
            F.substring(F.md5(F.concat(F.lit("n"), F.col("c_custkey"))), 1, 6),
            F.lit(" "),
            F.substring(F.md5(F.concat(F.lit("m"), F.col("c_custkey"))), 1, 8),
        ).alias("name"),
        F.col("c_nationkey").alias("nat"),
    )
    # drop position = rid % 8 + 3 (1-based, mid-string; never the
    # first two or last three chars, so one blocking pass always hits)
    dirty = base.filter(F.col("rid") % DIRTY_EVERY == 0).select(
        (F.col("rid") + 10_000_000).alias("rid"),
        F.concat(
            F.expr("substring(name, 1, cast(rid % 8 + 2 as int))"),
            F.expr("substring(name, cast(rid % 8 + 4 as int), 100)"),
        ).alias("name"),
        "nat",
    )
    return base.unionByName(dirty)


def record_matches(records: DataFrame, max_lev: int = MAX_LEV) -> DataFrame:
    """Match pairs via two blocking passes + Levenshtein verify.

    Returns (rid_a, rid_b, name_a, name_b, lev) with rid_a < rid_b.
    """
    r = records.select("rid", "name", "nat")
    passes = [
        r.select(
            "rid", "name",
            F.concat_ws("|", F.col("nat"), F.substring("name", 1, 3)).alias("bkey"),
        ),
        r.select(
            "rid", "name",
            F.concat_ws("|", F.col("nat"), F.expr("right(name, 3)")).alias("bkey"),
        ),
    ]
    blocked = passes[0].unionByName(passes[1])
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .select(
            F.col("a.rid").alias("rid_a"),
            F.col("b.rid").alias("rid_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .dropDuplicates(["rid_a", "rid_b"])
    )
    return (
        cand.withColumn("lev", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("lev") <= max_lev)
    )
