"""The reference's query surface as DataFrame operators.

The entire grammar of the reference's streaming-SQL driver is
``select <collist> from "<db>"."<table>" [where _delta_type = 'X']``
(parse-statement, reference src/cdc/jdbc.clj:135-147; example :117).
Execution is scan → table/db filter (:176-177) → delta-type explode
(:104-115) → delta-type filter (:180-182) → projection (select * only,
:164-185).  Those map 1:1 onto narrow DataFrame ops — one
whole-stage-codegen'd stage, no shuffle, filters pushed to the scan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_cdc_spark.sources.events_cdc import rows_delta_type


def filter_table(env: DataFrame, db: str, table: str) -> DataFrame:
    """R3 (jdbc.clj:176-177): keep events of one (db, table)."""
    return env.filter((F.col("db") == db) & (F.col("tbl") == table))


def filter_delta_type(rows: DataFrame, delta_type: str) -> DataFrame:
    """R5 (jdbc.clj:180-182): `where _delta_type = 'X'`."""
    return rows.filter(F.col("_delta_type") == delta_type)


def select_changes(env: DataFrame, db: str, table: str, delta_type: str | None = None,
                   columns: list[str] | None = None) -> DataFrame:
    """The full reference pipeline R3→R4→R5→R6 for one query.

    `columns=None` reproduces the reference's `select *` (its parsed
    select-list is never applied, jdbc.clj:140-141); passing columns
    generalizes to real projection, which Catalyst prunes to the scan.
    """
    out = rows_delta_type(filter_table(env, db, table))
    if delta_type is not None:
        out = filter_delta_type(out, delta_type)
    if columns is not None:
        out = out.select(*columns)
    return out


_STMT_RE = re.compile(
    r"""^\s*select\s+(?P<select>.+?)\s+from\s+
        "?(?P<db>[\w]+)"?\s*\.\s*"?(?P<table>[\w]+)"?
        (?:\s+where\s+_delta_type\s*=\s*'(?P<dt>[^']*)')?\s*;?\s*$""",
    re.IGNORECASE | re.VERBOSE,
)


def parse_statement(sql: str) -> dict:
    """R1+R2 (jdbc.clj:119-147): the reference's entire SQL grammar.

    The reference tokenizer preserves whitespace inside the quoted
    delta-type literal (its own example statement uses `'  insert'`,
    jdbc.clj:117) — we accept any quoted content and strip it, so both
    `'insert'` and `'  insert'` select inserts.  Anything richer goes
    straight to ``spark.sql`` (the rebuilt engine exposes full Spark
    SQL — see operators/relational.py).
    """
    m = _STMT_RE.match(sql)
    if m is None:
        raise ValueError(f"cannot parse statement (reference grammar): {sql!r}")
    cols = [c.strip() for c in m.group("select").split(",")]
    dt = m.group("dt")
    return {
        "select": cols,
        "db": m.group("db"),
        "table": m.group("table"),
        "delta_type": dt.strip() if dt is not None else None,
    }


def execute_statement(env: DataFrame, sql: str) -> DataFrame:
    """Parse a reference-grammar statement and run it over the stream."""
    q = parse_statement(sql)
    cols = None if q["select"] == ["*"] else q["select"]
    return select_changes(env, q["db"], q["table"], q["delta_type"], cols)
