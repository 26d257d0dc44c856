"""Regression tests for the read_table memo (sources/io.py).

r14 ADVICE low #1: the memo keyed staleness on os.stat of the TABLE
PATH only; for a directory-style parquet table, rewriting a part file
in place does not bump the directory mtime, so a stale DataFrame was
served.  The key now folds the newest part file's (mtime_ns, size) in.
A memo hit must also not skip the defensive nanosAsLong conf set.
"""

from __future__ import annotations

import os

import pytest

from mysql_cdc_spark.sources import io as tio


@pytest.fixture()
def scratch_table(tmp_path):
    d = tmp_path / "tbl.parquet"
    d.mkdir()
    return tmp_path, d


def _write_part(spark, part_path, values):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"v": pa.array(values, pa.int64())}), part_path)


def test_in_place_part_rewrite_misses_memo(spark, scratch_table):
    sf_dir, d = scratch_table
    part = d / "part-000.parquet"
    _write_part(spark, str(part), [1, 2, 3])
    tio.clear_read_memo()
    df1 = tio.read_table(spark, str(sf_dir), "tbl")
    assert df1.count() == 3
    dir_mtime_before = os.stat(d).st_mtime_ns
    # rewrite the part IN PLACE with different length (no create/delete
    # in the directory -> directory mtime unchanged on most filesystems)
    _write_part(spark, str(part), [10, 20, 30, 40])
    if os.stat(d).st_mtime_ns != dir_mtime_before:
        os.utime(d, ns=(dir_mtime_before, dir_mtime_before))
    df2 = tio.read_table(spark, str(sf_dir), "tbl")
    assert df2.count() == 4, "stale memoized DataFrame served"


def test_same_content_hits_memo(spark, scratch_table):
    sf_dir, d = scratch_table
    _write_part(spark, str(d / "part-000.parquet"), [1, 2])
    tio.clear_read_memo()
    df1 = tio.read_table(spark, str(sf_dir), "tbl")
    df2 = tio.read_table(spark, str(sf_dir), "tbl")
    assert df1 is df2, "unchanged directory table should hit the memo"


def test_memo_hit_still_sets_nanos_conf(spark, scratch_table):
    sf_dir, d = scratch_table
    _write_part(spark, str(d / "part-000.parquet"), [5])
    tio.clear_read_memo()
    tio.read_table(spark, str(sf_dir), "tbl")
    # simulate an externally-reset session conf, then a memo hit
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    tio.read_table(spark, str(sf_dir), "tbl")
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
