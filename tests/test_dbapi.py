"""PEP 249 (DB-API 2.0) conformance-style tests for mysql_cdc_spark.dbapi
(r13 VERDICT #5) — module globals, exception hierarchy, connection and
cursor lifecycles, parameter binding, read-only walls, and both the
batch and the CONTINUOUS (executestream) forms, driven the way a
third-party DB-API consumer would."""

from __future__ import annotations

import pytest

import mysql_cdc_spark.dbapi as db
from tests.conftest import SF_SMOKE


@pytest.fixture()
def conn(spark):
    c = db.connect(SF_SMOKE, spark=spark)
    yield c
    if not c._closed:
        c.close()


# ---------------------------------------------------------------------------
# module-level conformance
# ---------------------------------------------------------------------------


def test_module_globals():
    assert db.apilevel == "2.0"
    assert db.threadsafety in (0, 1, 2, 3)
    assert db.paramstyle == "qmark"


def test_exception_hierarchy():
    assert issubclass(db.Error, Exception)
    assert issubclass(db.Warning, Exception)
    for exc in (db.InterfaceError, db.DatabaseError):
        assert issubclass(exc, db.Error)
    for exc in (db.DataError, db.OperationalError, db.IntegrityError,
                db.InternalError, db.ProgrammingError, db.NotSupportedError):
        assert issubclass(exc, db.DatabaseError)


# ---------------------------------------------------------------------------
# connection lifecycle
# ---------------------------------------------------------------------------


def test_connect_accepts_dir_and_url(spark):
    c1 = db.connect(SF_SMOKE, spark=spark)
    try:
        assert c1._source == SF_SMOKE
    finally:
        c1.close()
    c2 = db.connect(f"jdbc:mysql-cdc:{SF_SMOKE}", spark=spark)
    try:
        assert c2._source == SF_SMOKE
    finally:
        c2.close()


def test_connection_context_manager_and_closed_errors(spark):
    with db.connect(SF_SMOKE, spark=spark) as c:
        cur = c.cursor()
    with pytest.raises(db.InterfaceError):
        c.cursor()
    with pytest.raises(db.InterfaceError):
        cur.execute('select * from "foo"."auto"')
    with pytest.raises(db.InterfaceError):
        c.commit()


def test_commit_noop_rollback_unsupported(conn):
    conn.commit()                 # read-only stream: required no-op
    with pytest.raises(db.NotSupportedError):
        conn.rollback()           # jdbc.clj:613 read-only wall


# ---------------------------------------------------------------------------
# batch cursor
# ---------------------------------------------------------------------------


def test_execute_reference_grammar_with_qmark_params(conn):
    cur = conn.cursor()
    ret = cur.execute(
        'select * from "foo"."auto" where _delta_type = ?', ("insert",)
    )
    assert ret is cur
    names = [d[0] for d in cur.description]
    assert names == ["offset", "log_file", "ts", "db", "tbl",
                     "id", "value", "_delta_type"]
    # 7-tuples with a PEP type_code comparable to the engine type
    d = dict(zip(names, cur.description))
    assert d["offset"][1] == db.NUMBER
    assert d["_delta_type"][1] == db.STRING
    assert cur.rowcount == -1     # unknown until drained (forward-only)
    rows = cur.fetchall()
    assert rows and all(r[-1] == "insert" for r in rows)
    assert all(r[3] == "foo" and r[4] == "auto" for r in rows)
    assert cur.rowcount == len(rows)
    assert cur.fetchone() is None


def test_fetchone_fetchmany_iteration(conn):
    cur = conn.cursor()
    cur.execute('select * from "foo"."auto"')
    first = cur.fetchone()
    assert isinstance(first, tuple) and len(first) == 8
    some = cur.fetchmany(5)
    assert len(some) == 5
    cur.arraysize = 3
    assert len(cur.fetchmany()) == 3
    rest = list(cur)
    assert rest  # iteration drains the remainder
    total = 1 + 5 + 3 + len(rest)
    cur2 = conn.cursor()
    cur2.execute('select * from "foo"."auto"')
    assert len(cur2.fetchall()) == total


def test_full_spark_sql_fallback(conn):
    """Anything past the reference grammar runs as full Spark SQL over
    the registered views — the rebuilt engine's superset surface."""
    cur = conn.cursor()
    cur.execute(
        "SELECT op, COUNT(*) AS n FROM changes GROUP BY op ORDER BY op"
    )
    rows = cur.fetchall()
    ops = [r[0] for r in rows]
    assert "query" in ops and "table_map" in ops and "xid" in ops
    assert sum(r[1] for r in rows) > 0


def test_write_statements_raise_not_supported(conn):
    cur = conn.cursor()
    for stmt in (
        "INSERT INTO foo.auto VALUES (1, 2)",
        "update foo.auto set value = 0",
        "DELETE FROM foo.auto",
        "CREATE TABLE t (x INT)",
        "drop table changes",
    ):
        with pytest.raises(db.NotSupportedError):
            cur.execute(stmt)
    with pytest.raises(db.NotSupportedError):
        cur.executemany('select * from "foo"."auto"', [()])


def test_parameter_count_mismatch(conn):
    cur = conn.cursor()
    with pytest.raises(db.ProgrammingError):
        cur.execute('select * from "foo"."auto" where _delta_type = ?', ())
    with pytest.raises(db.ProgrammingError):
        cur.execute('select * from "foo"."auto"', ("spare",))


def test_bad_sql_raises_programming_error(conn):
    cur = conn.cursor()
    with pytest.raises(db.ProgrammingError):
        cur.execute("SELECT definitely_not_a_column FROM changes")


def test_literal_binding_escapes_quotes():
    assert db._literal("o'brien") == "'o''brien'"
    assert db._literal(None) == "NULL"
    assert db._literal(3) == "3"
    assert db._literal(True) == "TRUE"
    assert db._literal(b"\x01\xff") == "X'01ff'"


def test_cursor_close_then_use(conn):
    cur = conn.cursor()
    cur.execute('select * from "foo"."auto"')
    cur.close()
    with pytest.raises(db.InterfaceError):
        cur.fetchone()
    with pytest.raises(db.InterfaceError):
        cur.execute('select * from "foo"."auto"')


def test_fetch_before_execute(conn):
    cur = conn.cursor()
    with pytest.raises(db.InterfaceError):
        cur.fetchone()


# ---------------------------------------------------------------------------
# continuous form (PEP 249 extension)
# ---------------------------------------------------------------------------


def test_executestream_continuous(conn):
    """The reference's defining executeQuery behavior through the shim:
    a continuous query whose fetchone() blocks for data and returns
    None only on timeout — never 'end of results'."""
    cur = conn.cursor()
    cur.executestream(
        'select * from "foo"."auto" where _delta_type = ?', ("insert",),
        trigger_seconds=0.2,
    )
    assert cur.description is not None
    names = [d[0] for d in cur.description]
    assert "offset" in names and "_delta_type" in names
    rows = []
    for _ in range(5):
        row = cur.fetchone(timeout=30.0)
        if row is None:
            break
        rows.append(row)
    assert rows, "continuous cursor delivered no rows"
    dt_i = names.index("_delta_type")
    assert all(r[dt_i] == "insert" for r in rows)
    # the stream has no natural end: a short timeout returns None once
    # the existing log is drained, rather than raising
    cur.close()


# ---------------------------------------------------------------------------
# r14 ADVICE regressions: binding tokenizer, literal escaping, write wall
# ---------------------------------------------------------------------------


def test_placeholder_split_ignores_quoted_and_commented_qmarks():
    """'?' inside string literals / comments is statement text, not a
    placeholder (r14 ADVICE medium #1)."""
    sql = db._bind(
        "select * from v where s like '%?%' and id = ?", (5,)
    )
    assert sql == "select * from v where s like '%?%' and id = 5"
    sql = db._bind(
        'select "?" AS q, * from v -- trailing ? comment\n where id = ?',
        (7,),
    )
    assert sql.endswith("where id = 7") and '"?"' in sql
    sql = db._bind("select /* ? */ ? from v", (1,))
    assert sql == "select /* ? */ 1 from v"
    # doubled-quote escape keeps the literal open across ''
    sql = db._bind("select 'it''s a ?' AS s, ? AS x", (2,))
    assert sql == "select 'it''s a ?' AS s, 2 AS x"
    # backslash escape inside a single-quoted literal
    sql = db._bind(r"select 'a\'? still literal' AS s, ? AS x", (3,))
    assert sql == r"select 'a\'? still literal' AS s, 3 AS x"


def test_literal_escapes_backslash_and_nonfinite(conn):
    """Backslash doubling + non-finite float spelling (r14 ADVICE
    medium #2), proven end-to-end through spark.sql round-trips."""
    assert db._literal("back\\slash") == "'back\\\\slash'"
    assert db._literal("trail\\") == "'trail\\\\'"
    assert db._literal(float("nan")) == "CAST('NaN' AS DOUBLE)"
    assert db._literal(float("inf")) == "CAST('Infinity' AS DOUBLE)"
    assert db._literal(float("-inf")) == "CAST('-Infinity' AS DOUBLE)"
    cur = conn.cursor()
    cur.execute("SELECT ? AS s, ? AS t", ("trail\\", "o'brien"))
    assert cur.fetchone() == ("trail\\", "o'brien")
    cur.execute("SELECT isnan(?) AS a, ? = double('inf') AS b",
                (float("nan"), float("inf")))
    assert cur.fetchone() == (True, True)


def test_write_wall_survives_comments_and_ctes(conn):
    """A leading comment or WITH clause must not smuggle a write past
    the read-only wall (r14 ADVICE medium #3)."""
    cur = conn.cursor()
    for stmt in (
        "/* hi */ INSERT INTO t VALUES (1)",
        "-- note\nDELETE FROM t",
        "/* a */ /* b */\n  -- c\nDROP TABLE t",
        "WITH c AS (SELECT 1 AS x) INSERT INTO t SELECT * FROM c",
        "WITH a AS (SELECT 1), b AS (SELECT ')' AS s) UPDATE t SET x = 1",
        "with c as (select '?)' as tricky) merge into t using c on 1=1",
    ):
        with pytest.raises(db.NotSupportedError):
            cur.execute(stmt)
    # ...while comment-led and CTE-led READS still run
    cur.execute("/* lead */ WITH c AS (SELECT 42 AS x) SELECT x FROM c")
    assert cur.fetchone() == (42,)
    cur.execute("-- lead\nSELECT 1 AS one")
    assert cur.fetchone() == (1,)


def test_leading_verb_classifier():
    assert db._leading_verb("  SELECT 1") == "select"
    assert db._leading_verb("/*x*/ insert into t values (1)") == "insert"
    assert db._leading_verb("WITH c AS (insert) SELECT 1") == "select"
    assert db._leading_verb(
        "WITH c AS (SELECT 'with insert' AS s) SELECT * FROM c"
    ) == "select"
    assert db._leading_verb("with c as (select 1) table c") == "table"
    assert db._leading_verb("/* unterminated") == ""
