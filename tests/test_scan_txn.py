"""Tests for the chunked distributed prefix scan and xid-boundary
transaction assembly (general form — variable-size transactions, not
the fixture's 4-events-per-statement shape)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mysql_cdc_spark.functions.scan import running_agg
from mysql_cdc_spark.model import ENVELOPE_SCHEMA
from mysql_cdc_spark.operators import transactions


def _env_row(off, op, xid=None, aid=None, aval=None):
    ts = datetime.datetime(2024, 1, 1)
    return (off, "binlog.000000", ts, 1, xid, "foo", "auto", op,
            None, None, aid, aval, None)


def _variable_txn_stream(spark):
    """3 transactions of different sizes:
    txn 0: query, table_map, write, write, write, xid(100)   (6 events)
    txn 1: query, table_map, write, xid(101)                 (4 events)
    txn 2: query, table_map, update, delete (3 rows), xid(102) (5 events)
    """
    rows = [
        _env_row(0, "query"), _env_row(1, "table_map"),
        _env_row(2, "write_rows", aid=1, aval=1.0),
        _env_row(3, "write_rows", aid=2, aval=2.0),
        _env_row(4, "write_rows", aid=3, aval=3.0),
        _env_row(5, "xid", xid=100),
        _env_row(6, "query"), _env_row(7, "table_map"),
        _env_row(8, "write_rows", aid=4, aval=4.0),
        _env_row(9, "xid", xid=101),
        _env_row(10, "query"), _env_row(11, "table_map"),
        _env_row(12, "update_rows", aid=1, aval=9.0),
        _env_row(13, "delete_rows", aid=None, aval=None),
        _env_row(14, "xid", xid=102),
    ]
    return spark.createDataFrame(rows, ENVELOPE_SCHEMA)


def test_with_txn_variable_sizes(spark):
    env = _variable_txn_stream(spark)
    got = {r["offset"]: r["txn"] for r in transactions.with_txn(env).collect()}
    expect = {o: 0 for o in range(6)} | {o: 1 for o in range(6, 10)} | {o: 2 for o in range(10, 15)}
    assert got == expect


def test_events_per_transaction_variable_sizes(spark):
    env = _variable_txn_stream(spark)
    got = {r["txn"]: (r["n_events"], r["xid"]) for r in
           transactions.events_per_transaction(env).collect()}
    assert got == {0: (6, 100), 1: (4, 101), 2: (5, 102)}


def test_committed_rows_attaches_xid_and_drops_uncommitted(spark):
    # Truncate the stream before the last commit: txn 2's rows have no
    # xid yet and must be held back.
    env = _variable_txn_stream(spark).filter(F.col("offset") <= 13)
    got = transactions.committed_rows(env).collect()
    by_offset = {r["offset"]: r["commit_xid"] for r in got}
    assert by_offset == {2: 100, 3: 100, 4: 100, 8: 101}


def test_running_agg_matches_single_window_across_chunks(spark):
    # chunk_span=4 forces many chunks; result must equal the
    # sequential cumsum regardless of chunking.
    df = spark.range(0, 100).select(
        F.col("id").alias("offset"),
        (F.col("id") % 7).cast("decimal(18,2)").alias("v"),
    )
    got = {
        r["offset"]: float(r["rs"])
        for r in running_agg(df, "offset", F.col("v"), "rs", chunk_span=4).collect()
    }
    acc, expect = 0.0, {}
    for i in range(100):
        acc += i % 7
        expect[i] = acc
    assert got == expect


def test_running_agg_exclusive_counts_prior_rows(spark):
    df = spark.range(0, 20).select(F.col("id").alias("offset"), F.lit(1).alias("one"))
    got = {
        r["offset"]: int(r["cnt"])
        for r in running_agg(df, "offset", F.col("one"), "cnt",
                             inclusive=False, chunk_span=3).collect()
    }
    assert got == {i: i for i in range(20)}


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salted equi-join is row-identical to the plain join, with the
    hot key spread across salt partitions."""
    from mysql_cdc_spark.functions.skew import salted_join
    from mysql_cdc_spark.sources.events_cdc import changes, rows_delta_type
    from mysql_cdc_spark.sources.io import read_table

    rows = rows_delta_type(changes(spark, sf_dir)).select("offset", "id", "value")
    dim = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), "c_mktsegment"
    )
    plain = rows.join(dim, "id").collect()
    salted = salted_join(rows, dim, ["id"], n_salts=8).collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))
    left = salted_join(rows, dim, ["id"], n_salts=4, how="left").collect()
    assert len(left) >= len(plain)


def test_txn_summary_matches_general_operator(spark):
    """The r19 direct txn derivation (no explode / prefix scan /
    groupBy) must be ROW-identical to the xid-boundary-general
    operator over the derived envelope stream."""
    from mysql_cdc_spark.sources.events_cdc import changes, txn_summary

    sf = "/root/testdata/sf0.001"
    direct = txn_summary(spark, sf)
    general = transactions.events_per_transaction(
        changes(spark, sf, rebalance=False)
    )
    assert direct.columns == general.columns
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, general.collect())
    )


def test_committed_rows_direct_matches_general_operator(spark):
    """Same pin for the direct committed-rows derivation (no explode,
    no per-txn window)."""
    from mysql_cdc_spark.sources.events_cdc import (
        changes,
        committed_rows_direct,
    )

    sf = "/root/testdata/sf0.001"
    direct = committed_rows_direct(spark, sf)
    general = transactions.committed_rows(changes(spark, sf, rebalance=False))
    assert direct.columns == general.columns
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, general.collect())
    )
