"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in ``mysql_cdc_spark.queries`` (and the
modules it imports); this file is the thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    canonical statement `select * from "foo"."auto" where
    _delta_type = 'insert'` (reference src/cdc/jdbc.clj:117) over the
    derived change stream."""
    from mysql_cdc_spark.queries import QUERIES

    return QUERIES["cdc_insert_only"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mysql_cdc_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mysql_cdc_spark.queries import ORACLES

    return dict(ORACLES)
