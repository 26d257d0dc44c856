"""The Spark-side conv() fast parses (r19 optimization) must be
value-identical to the engine-neutral instr-chain definitions the
DuckDB oracles evaluate — on every hex input shape: leading zeros,
all-zero, all-f, and real md5 output."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_cdc_spark.operators import sketches as sk


def _hex_corpus(spark):
    # md5 of a few hundred labels + adversarial literals
    rows = spark.range(300).selectExpr("md5(cast(id as string)) AS h")
    edge = spark.createDataFrame(
        [("0" * 32,), ("f" * 32,), ("0" * 31 + "1",), ("8" + "0" * 31,)],
        ["h"],
    )
    return rows.unionByName(edge)


def test_v52_and_bucket_conv_parity(spark):
    df = _hex_corpus(spark).select(
        F.expr(sk.bucket_expr("h")).cast("bigint").alias("b_instr"),
        F.expr(sk.bucket_expr_spark("h")).cast("bigint").alias("b_conv"),
        F.expr(sk.v52_expr("h")).cast("bigint").alias("v_instr"),
        F.expr(sk.v52_expr_spark("h")).cast("bigint").alias("v_conv"),
    )
    bad = df.filter(
        (F.col("b_instr") != F.col("b_conv")) | (F.col("v_instr") != F.col("v_conv"))
    ).count()
    assert bad == 0


def test_cms_and_bloom_conv_parity(spark):
    toks = spark.range(200).selectExpr("cast(id as string) AS token")
    cms = toks.select(
        *[
            (
                F.expr(sk._cms_bucket("token", j)).cast("bigint")
                != F.expr(sk._cms_bucket_spark("token", j)).cast("bigint")
            ).alias(f"d{j}")
            for j in range(sk.CMS_D)
        ]
    )
    assert cms.filter(" or ".join(f"d{j}" for j in range(sk.CMS_D))).count() == 0

    hexes = _hex_corpus(spark).select(
        (
            F.expr(sk._bloom_positions("h")) != F.expr(sk._bloom_positions_spark("h"))
        ).alias("diff")
    )
    assert hexes.filter("diff").count() == 0
