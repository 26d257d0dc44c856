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


@pytest.fixture()
def state_sink(spark, sf_dir):
    from mysql_cdc_spark.operators.aggregates import write_state_sink_bucketed

    suffix = uuid.uuid4().hex[:8]
    sink_t = f"envelope_sink_{suffix}"
    rows_dt = rows_delta_type(changes(spark, sf_dir))
    write_state_sink_bucketed(rows_dt, sink_t, n_buckets=4)
    yield sink_t, rows_dt
    spark.sql(f"DROP TABLE IF EXISTS {sink_t}")


def test_latest_state_replay_from_bucketed_sink_no_exchange(spark, state_sink):
    """r13 VERDICT #7: latest_state over the bucketed envelope sink
    must be a pure scan + aggregate — NO Exchange anywhere in the
    executed plan — and row-identical to the replay over the raw
    stream."""
    from mysql_cdc_spark.operators.aggregates import latest_state_replay

    sink_t, rows_dt = state_sink
    replay = latest_state_replay(spark, sink_t)
    plan = replay._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed replay still shuffles:\n{plan}"

    expect = {
        tuple(r) for r in latest_state(rows_dt).collect()
    }
    got = {tuple(r) for r in replay.collect()}
    assert got == expect and got


def test_latest_state_unbucketed_replay_has_exchange(spark, state_sink):
    """Control: the same aggregation over the raw stream shuffles —
    the bucket layout is what removed it."""
    _, rows_dt = state_sink
    plan = latest_state(rows_dt)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
