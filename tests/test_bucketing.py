"""Bucketed-sink tests: the co-located join actually eliminates the
exchange (the claim PLANS.md makes for the 100 TB replay pipeline)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from mysql_cdc_spark.functions.bucketing import bucketed_join, write_bucketed
from mysql_cdc_spark.operators.aggregates import latest_state
from mysql_cdc_spark.sources.events_cdc import changes, rows_delta_type
from mysql_cdc_spark.sources.io import read_table


@pytest.fixture()
def tables(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    state_t, dim_t = f"state_{suffix}", f"dim_{suffix}"
    state = latest_state(rows_delta_type(changes(spark, sf_dir))).select(
        "id", "db", "tbl", "value"
    )
    dim = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), "c_mktsegment"
    )
    write_bucketed(state, state_t, ["id"], n_buckets=4)
    write_bucketed(dim, dim_t, ["id"], n_buckets=4)
    yield state_t, dim_t, state, dim
    spark.sql(f"DROP TABLE IF EXISTS {state_t}")
    spark.sql(f"DROP TABLE IF EXISTS {dim_t}")


def test_bucketed_join_has_no_exchange(spark, tables):
    state_t, dim_t, state, dim = tables
    # Force a sort-merge join so the bucketed path (not a broadcast)
    # is what's being proven.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, state_t, dim_t, ["id"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan          # co-located: no shuffle
        expect = state.join(dim, "id").count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_needs_exchange(spark, tables):
    """Control: the same join on raw DataFrames shuffles — the bucket
    layout is what removed it."""
    _, _, state, dim = tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = state.join(dim, "id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
