"""Unit tests for the change-event model and the reference query
surface (SURVEY §5 rebuild test plan: delta-type explode, update-pair
ordering, 4-events-per-statement, table filters, parser)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_cdc_spark.model import DELTA_TYPES, ENVELOPE_SCHEMA, OPS
from mysql_cdc_spark.operators import aggregates, query, transactions
from mysql_cdc_spark.sources.events_cdc import changes, rows_delta_type


@pytest.fixture(scope="module")
def env(spark, sf_dir):
    return changes(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def rows(env):
    return rows_delta_type(env).cache()


def test_envelope_schema(env):
    assert [f.name for f in env.schema.fields] == [f.name for f in ENVELOPE_SCHEMA.fields]
    assert [f.dataType for f in env.schema.fields] == [f.dataType for f in ENVELOPE_SCHEMA.fields]


def test_envelope_ops_and_counts(env):
    ops = {r["op"] for r in env.select("op").distinct().collect()}
    assert ops <= set(OPS)
    n_events = env.count()
    # 4 envelope events per source event (1000 at sf0.001)
    assert n_events == 4000


def test_offsets_strictly_increasing_and_unique(env):
    assert env.select("offset").distinct().count() == env.count()
    lo, hi = env.agg(F.min("offset"), F.max("offset")).first()
    assert lo == 0 and hi == env.count() - 1  # dense block per event


def test_xid_only_on_commit(env):
    assert env.filter((F.col("op") != "xid") & F.col("xid").isNotNull()).count() == 0
    assert env.filter((F.col("op") == "xid") & F.col("xid").isNull()).count() == 0


def test_delta_types(rows):
    tags = {r["_delta_type"] for r in rows.select("_delta_type").distinct().collect()}
    assert tags == set(DELTA_TYPES)


def test_update_pair_adjacency(rows):
    """update-before and update share the parent offset; each update
    event yields exactly one of each (reference jdbc.clj:111-112)."""
    pairs = (
        rows.filter(F.col("_delta_type").isin("update-before", "update"))
        .groupBy("offset")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("_delta_type") == "update-before", 1).otherwise(0)).alias("nb"),
        )
    )
    bad = pairs.filter((F.col("n") != 2) | (F.col("nb") != 1)).count()
    assert bad == 0


def test_four_events_per_transaction(env):
    """The reference's binlog4 invariant (mysql_bench.clj:252-258)."""
    hist = transactions.transaction_size_histogram(env).collect()
    assert len(hist) == 1
    assert hist[0]["n_events"] == 4


def test_table_filter_partitions_stream(env):
    total = rows_delta_type(env).count()
    foo = query.select_changes(env, "foo", "auto").count()
    bench = query.select_changes(env, "bench", "big").count()
    assert foo + bench == total
    assert foo > 0 and bench > 0


def test_execute_statement_matches_manual(env):
    via_sql = query.execute_statement(
        env, "select * from \"foo\".\"auto\" where _delta_type = 'insert'"
    )
    manual = query.select_changes(env, "foo", "auto", "insert")
    assert via_sql.exceptAll(manual).count() == 0
    assert manual.exceptAll(via_sql).count() == 0


def test_parse_statement_rejects_unknown_grammar():
    for bad in ["insert into t values (1)", "select * from t join u", "delete from x.y"]:
        with pytest.raises(ValueError):
            query.parse_statement(bad)


def test_latest_state_replay(spark):
    """Hand-built stream: insert → update → (delete for one key)."""
    from mysql_cdc_spark.model import ENVELOPE_SCHEMA

    import datetime

    ts = datetime.datetime(2024, 1, 1)
    mk = lambda off, op, bid, bval, aid, aval: (  # noqa: E731
        off, "binlog.000000", ts, 1, None, "foo", "auto", op, bid, bval, aid, aval, None,
    )
    data = [
        mk(0, "write_rows", None, None, 1, 10.0),
        mk(1, "write_rows", None, None, 2, 20.0),
        mk(2, "update_rows", 1, 10.0, 1, 11.0),
        mk(3, "delete_rows", 2, 20.0, None, None),
    ]
    env = spark.createDataFrame(data, ENVELOPE_SCHEMA)
    state = {r["id"]: r["value"] for r in aggregates.latest_state(rows_delta_type(env)).collect()}
    assert state == {1: 11.0}


def test_running_sum_matches_python(env):
    rows = rows_delta_type(env)
    got = aggregates.running_sum(rows).orderBy("offset").collect()
    expected = 0.0
    for r in got[:50]:
        expected = round(expected + round(r["value"], 2), 2)
        assert abs(r["running_sum"] - expected) < 1e-9


def test_parse_statement_strips_padded_delta_type():
    """The reference's own example uses a whitespace-padded literal
    `'  insert'` (jdbc.clj:117) — the tokenizer preserves it and the
    filter still matches after normalization."""
    q = query.parse_statement("select * from \"foo\".\"auto\" where _delta_type = '  insert'")
    assert q["delta_type"] == "insert"


def test_apply_changes_delete_and_null_semantics(spark):
    """Incremental merge edge cases: a batch delete drops a snapshot
    row; a batch update that sets NULL must NOT resurrect the snapshot
    value; untouched snapshot rows pass through."""
    from mysql_cdc_spark.operators.aggregates import apply_changes

    snapshot = spark.createDataFrame(
        [("foo", "auto", 1, 10.0, 100), ("foo", "auto", 2, 20.0, 104),
         ("foo", "auto", 3, 30.0, 108)],
        "db string, tbl string, id long, value double, as_of_offset long",
    )
    batch = spark.createDataFrame(
        [(200, "foo", "auto", 1, None, "delete"),       # delete key 1
         (204, "foo", "auto", 2, None, "update"),       # NULL-valued update
         (208, "foo", "auto", 9, 90.0, "insert")],      # brand-new key
        "offset long, db string, tbl string, id long, value double, _delta_type string",
    )
    got = {r["id"]: (r["value"], r["as_of_offset"])
           for r in apply_changes(snapshot, batch).collect()}
    assert 1 not in got                                # tombstone applied
    assert got[2] == (None, 204)                       # NULL survives, not 20.0
    assert got[3] == (30.0, 108)                       # untouched passthrough
    assert got[9] == (90.0, 208)                       # new key inserted


def test_state_asof_midpoint_vs_full(spark):
    """Time travel: cutoff = max_offset * num div den.  At the
    midpoint only offsets 0..1 are visible; at den=den the replay
    equals latest_state."""
    from mysql_cdc_spark.model import ENVELOPE_SCHEMA

    import datetime

    ts = datetime.datetime(2024, 1, 1)
    mk = lambda off, op, bid, bval, aid, aval: (  # noqa: E731
        off, "binlog.000000", ts, 1, None, "foo", "auto", op, bid, bval, aid, aval, None,
    )
    data = [
        mk(0, "write_rows", None, None, 1, 10.0),
        mk(1, "write_rows", None, None, 2, 20.0),
        mk(2, "update_rows", 1, 10.0, 1, 11.0),
        mk(3, "delete_rows", 2, 20.0, None, None),
    ]
    rows = rows_delta_type(spark.createDataFrame(data, ENVELOPE_SCHEMA))
    # cutoff = 3 * 1 div 2 = 1 → inserts only
    mid = {r["id"]: r["value"] for r in aggregates.state_asof(rows, 1, 2).collect()}
    assert mid == {1: 10.0, 2: 20.0}
    # cutoff = 3 → identical to latest_state
    full = {r["id"]: r["value"] for r in aggregates.state_asof(rows, 1, 1).collect()}
    assert full == {1: 11.0}


class TestIvmJoinView:
    """Bilinear delta-rule join maintenance (aggregates.ivm_join_view)."""

    def test_incremental_equals_recompute(self, spark):
        from mysql_cdc_spark.operators import aggregates

        # offsets 0-3 = base, 4+ = delta batch
        rows = [
            # A side (foo.auto)
            (0, "foo", "auto", 1, 10.0, "insert"),
            (1, "foo", "auto", 2, 20.0, "insert"),
            (5, "foo", "auto", 1, 10.0, "update-before"),   # 10 -> 11
            (5, "foo", "auto", 1, 11.0, "update"),
            (6, "foo", "auto", 2, 20.0, "delete"),
            # B side (bench.big)
            (2, "bench", "big", 1, 100.0, "insert"),
            (3, "bench", "big", 2, 200.0, "insert"),
            (7, "bench", "big", 1, 101.0, "insert"),
        ]
        df = spark.createDataFrame(
            rows,
            "offset long, db string, tbl string, id long, value double, _delta_type string",
        )
        got = {r["id"]: (r["n_pairs"], r["sum_ab"])
               for r in aggregates.ivm_join_view(df, mid=4).collect()}
        # final states: A = {1:11.0}, B = {1:[100.0, 101.0]} ->
        # 2 pairs, 11*100 + 11*101 = 2211.0
        assert got == {1: (2, 2211.0)}

    def test_duplicate_inserts_multiply(self, spark):
        from mysql_cdc_spark.operators import aggregates

        rows = [
            (0, "foo", "auto", 1, 5.0, "insert"),
            (5, "foo", "auto", 1, 5.0, "insert"),     # second copy via delta
            (1, "bench", "big", 1, 7.0, "insert"),
        ]
        df = spark.createDataFrame(
            rows,
            "offset long, db string, tbl string, id long, value double, _delta_type string",
        )
        got = aggregates.ivm_join_view(df, mid=4).collect()
        # bag semantics: 2 copies x 1 -> n_pairs 2, sum 2 * (5*7)
        assert len(got) == 1
        assert got[0]["n_pairs"] == 2 and got[0]["sum_ab"] == 70.0


def test_rows_changes_matches_explode_form(spark):
    """The r19 direct row-delta derivation (no 4-way envelope explode)
    must be ROW-identical — every column, including log_file/ts — to
    the envelope form it replaces in _rows_dt."""
    from mysql_cdc_spark.sources.events_cdc import (
        changes,
        rows_changes,
        rows_delta_type,
    )

    sf = "/root/testdata/sf0.001"
    via_env = sorted(map(tuple, rows_delta_type(changes(spark, sf)).collect()))
    direct = sorted(map(tuple, rows_changes(spark, sf).collect()))
    assert direct == via_env
    assert rows_changes(spark, sf).columns == rows_delta_type(changes(spark, sf)).columns


def test_rows_after_matches_filtered_pair_form(spark):
    """The r19 after-images-only derivation (update_pairs=False; no
    inline Generate) must be ROW-identical to the pair form with
    update-before rows filtered out."""
    from mysql_cdc_spark.sources.events_cdc import rows_changes

    sf = "/root/testdata/sf0.001"
    direct = rows_changes(spark, sf, update_pairs=False)
    filtered = rows_changes(spark, sf).filter(
        F.col("_delta_type") != "update-before"
    )
    assert direct.columns == filtered.columns
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, filtered.collect())
    )
