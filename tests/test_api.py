"""Driver/connection/statement surface tests (R10/R12 parity)."""

from __future__ import annotations

import pytest

from mysql_cdc_spark import api


@pytest.fixture(autouse=True)
def reset_singleton():
    api.CDCConnection._instance = None
    yield
    api.CDCConnection._instance = None


def test_accepts_url():
    assert api.accepts_url("jdbc:mysql-cdc:/root/testdata/sf0.001")
    assert not api.accepts_url("jdbc:mysql://host/db")
    with pytest.raises(ValueError):
        api.CDCConnection.connect("jdbc:postgres:x", None)


def test_singleton_connection(spark, sf_dir):
    url = f"jdbc:mysql-cdc:{sf_dir}"
    c1 = api.connect(url, spark)
    c2 = api.connect(url, spark)
    assert c1 is c2                    # CDCDriver.clj:54-59
    c1.close()
    c3 = api.connect(url, spark)
    assert c3 is not c1                # closed → a fresh connection


def test_one_statement_per_connection(spark, sf_dir):
    conn = api.connect(f"jdbc:mysql-cdc:{sf_dir}", spark)
    st = conn.create_statement()
    with pytest.raises(RuntimeError, match="one open statement"):
        conn.create_statement()
    st.close()
    assert conn.create_statement() is not st


def test_execute_query_end_to_end(spark, sf_dir):
    """The reference client flow (JdbcClient.java:39-58): connect →
    statement → executeQuery → iterate rows."""
    conn = api.connect(f"jdbc:mysql-cdc:{sf_dir}", spark)
    cur = conn.create_statement().execute_query(
        "select * from \"foo\".\"auto\" where _delta_type = 'insert'"
    )
    n = 0
    while cur.next():
        assert cur.get_string("_delta_type") == "insert"
        n += 1
    assert n == 224  # sf0.001 insert count (matches entry() smoke)


def test_execute_update_unsupported(spark, sf_dir):
    conn = api.connect(f"jdbc:mysql-cdc:{sf_dir}", spark)
    with pytest.raises(api.UnsupportedOperation):
        conn.create_statement().execute_update("INSERT INTO t VALUES (1)")


def test_read_only_and_catalog(spark, sf_dir):
    conn = api.connect(f"jdbc:mysql-cdc:{sf_dir}", spark)
    assert conn.read_only
    conn.register_views()
    tables = conn.list_tables()
    assert "changes" in tables and "rows_dt" in tables
    got = spark.sql("SELECT count(*) AS n FROM rows_dt").first()["n"]
    assert got > 0


def test_closed_connection_rejects_work(spark, sf_dir):
    conn = api.connect(f"jdbc:mysql-cdc:{sf_dir}", spark)
    st = conn.create_statement()
    conn.close()
    with pytest.raises(RuntimeError):
        st.execute_query('select * from "foo"."auto"')
    with pytest.raises(RuntimeError):
        conn.create_statement()
