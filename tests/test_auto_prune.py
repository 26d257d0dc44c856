"""Plan-derived projection pruning (sources/reader.py, r17 VERDICT #4):
read_binlog_pruned must (a) return results identical to the unpruned
query, (b) land on exactly the columns a manual ``columns=`` user
would pass, and (c) actually narrow the scan (ReadSchema / scan output
shrinks — the codec-side image skip is pinned separately by
tests/test_binlog_datasource.py's columns= tests)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_cdc_spark.sources import binlog_source as bs
from mysql_cdc_spark.sources.binlog_datasource import register_binlog_source
from mysql_cdc_spark.sources.reader import (
    read_binlog,
    read_binlog_pruned,
    required_scan_columns,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("autoprune") / "log")
    bs.generate_binlog_from_events(SF, d, checksum="crc32")
    return d


@pytest.fixture(autouse=True)
def _register(spark):
    register_binlog_source(spark)


def _rows(df):
    return sorted(str(r) for r in df.collect())


BUILDS = {
    # narrow select: the shape the helper exists for
    "select": lambda env: env.filter("op = 'xid'").select("offset", "xid"),
    # aggregate referencing a non-output column in the filter
    "agg": lambda env: env.filter(F.col("db") == "foo")
    .groupBy("op")
    .agg(F.count(F.lit(1)).alias("n")),
    # alias: the underlying envelope column must still be detected
    "alias": lambda env: env.filter("op = 'query'").select(
        F.col("sql").alias("stmt"), F.col("thread_id").alias("sess")
    ),
    # pass-through: select * keeps the full schema (no pruning)
    "star": lambda env: env,
}

EXPECT_COLS = {
    "select": ["offset", "xid", "op"],  # canonical envelope order
    "agg": ["db", "op"],
    "alias": ["op", "sql", "thread_id"],
}


@pytest.mark.parametrize("shape", list(BUILDS))
def test_pruned_equals_unpruned(spark, log_dir, shape):
    build = BUILDS[shape]
    want = _rows(build(read_binlog(spark, log_dir)))
    got = _rows(read_binlog_pruned(spark, log_dir, build))
    assert got == want and want


@pytest.mark.parametrize("shape", list(EXPECT_COLS))
def test_derived_columns_match_manual(spark, log_dir, shape):
    probe = BUILDS[shape](read_binlog(spark, log_dir))
    assert required_scan_columns(probe) == EXPECT_COLS[shape]


def test_auto_plan_matches_manual_option(spark, log_dir):
    """The automatic path must produce the same narrowed scan a manual
    .option("columns", ...) user gets — scan output shrinks to the
    projected set, image maps gone."""
    build = BUILDS["select"]
    auto = read_binlog_pruned(spark, log_dir, build)
    manual = build(read_binlog(spark, log_dir, columns=["offset", "op", "xid"]))
    p_auto = auto._jdf.queryExecution().executedPlan().toString()
    p_manual = manual._jdf.queryExecution().executedPlan().toString()
    for plan in (p_auto, p_manual):
        assert "before" not in plan and "after#" not in plan
    assert _rows(auto) == _rows(manual)


def test_count_star_prunes_to_one_column(spark, log_dir):
    env = read_binlog(spark, log_dir)
    probe = env.groupBy().count()
    assert required_scan_columns(probe) == ["offset"]
    got = read_binlog_pruned(spark, log_dir, lambda e: e.groupBy().count())
    assert got.collect()[0][0] == env.count()


def test_star_passthrough_skips_reread(spark, log_dir):
    env = read_binlog(spark, log_dir)
    assert required_scan_columns(env) == list(env.columns)


def test_explicit_columns_option_is_rejected(spark, log_dir):
    """A user-supplied columns= inside read_binlog_pruned would be
    silently overridden by the derived set in the rebuild — explicit
    projection belongs to read_binlog."""
    with pytest.raises(ValueError, match="derives columns"):
        read_binlog_pruned(
            spark, log_dir, lambda e: e, columns="offset,op"
        )


def test_wide_projection_survives_tostring_truncation(spark, log_dir):
    """r18 ADVICE: the analyzed plan's toString elides operator fields
    past spark.sql.debug.maxToStringFields (default 25) — a WIDE query
    whose only reference to an envelope column sits past the ellipsis
    must still derive it (the probe raises the conf), and the rebuild
    must equal the unpruned query."""

    def build(env):
        # >25 projected fields; the LAST expressions are the only
        # references to `after` and `before` — exactly the fields the
        # default toString would elide
        wide = [F.lit(i).alias(f"pad{i}") for i in range(26)]
        return env.filter("op = 'update_rows'").select(
            "offset",
            *wide,
            F.element_at("after", "id").alias("aid"),
            F.element_at("before", "id").alias("bid"),
        )

    cols = required_scan_columns(build(read_binlog(spark, log_dir)))
    assert "after" in cols and "before" in cols
    pruned = read_binlog_pruned(spark, log_dir, build)
    full = build(read_binlog(spark, log_dir))
    assert _rows(pruned) == _rows(full)
    # the conf is restored after the probe
    assert spark.conf.get("spark.sql.debug.maxToStringFields") != "100000"
