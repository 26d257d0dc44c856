"""Composition of the r18 pillars: a StateTable maintained ACROSS a
primary failover — drain the old primary, hand off the executed GTID
set, resume the new primary's (renamed, overlapping, multi-UUID)
directory, keep merging into the same state table.  Final state must
equal a latest-state replay of the logical full history.

The ordering subtlety this pins: byte offsets do NOT order across
directories (the new primary's file numbering restarts at
binlog.000000, so its early files' offsets compare BELOW the old
primary's late files).  A cross-failover consumer must version images
by a (generation, local_order) pair — generation bumps at each
failover, exactly an LSN epoch.  The offset-aware merge then stays
correct; without the generation prefix the overlap keys keep stale
old-primary images (asserted below as the control)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from mysql_cdc_spark.operators.aggregates import latest_state
from mysql_cdc_spark.operators.state_table import StateTable
from mysql_cdc_spark.sources import binlog_source as bs
from mysql_cdc_spark.sources.binlog_codec import gtid_set_text
from mysql_cdc_spark.sources.binlog_datasource import register_binlog_source

SF = "/root/testdata/sf0.001"
N, E40, E60 = 1000, 400, 600


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("fo_state")
    a, b, full = str(root / "a"), str(root / "b"), str(root / "full")
    kw = dict(rotate_every=200, gtid=True, prev_gtids=True, checksum="crc32")
    bs.generate_binlog_from_events(SF, a, event_range=(0, E60), **kw)
    bs.generate_binlog_from_events(
        SF, b, event_range=(E40, N), renumber_files=True, promote_at=E60, **kw
    )
    bs.generate_binlog_from_events(SF, full, **kw)
    return a, b, full


def _rows(env, generation: int):
    from mysql_cdc_spark.operators.state_table import envelope_to_rows

    return envelope_to_rows(env, generation=generation)


def _live(df):
    return {(r.db, r.tbl, r.id, r.value) for r in df.select("db", "tbl", "id", "value").collect()}


def test_state_table_survives_failover(spark, dirs, tmp_path):
    a, b, full = dirs
    register_binlog_source(spark)
    st = StateTable(str(tmp_path / "st"), f"fo_{uuid.uuid4().hex[:8]}", n_buckets=4)

    # generation 0: drain the old primary, record the handoff set
    env_a = spark.read.format("mysql_binlog").load(a)
    st.merge_batch(_rows(env_a, generation=0), 0)
    executed = gtid_set_text(bs.executed_gtid_set(a))

    # generation 1: resume the new primary exactly-once
    env_b = (
        spark.read.format("mysql_binlog")
        .option("since_gtid", executed)
        .load(b)
    )
    st.merge_batch(_rows(env_b, generation=1), 1)

    want = _live(latest_state(_rows(
        spark.read.format("mysql_binlog").load(full), generation=0
    )))
    got = _live(st.current(spark))
    assert got == want and got


def test_without_generation_prefix_overlap_keys_go_stale(spark, dirs, tmp_path):
    """Control: merging the resumed directory WITHOUT the generation
    epoch lets old-primary images (late files, high file index) beat
    the new primary's newer writes (early files, low file index) — the
    failure mode the epoch prefix exists to prevent."""
    a, b, full = dirs
    register_binlog_source(spark)
    st = StateTable(str(tmp_path / "st0"), f"fo0_{uuid.uuid4().hex[:8]}", n_buckets=4)
    env_a = spark.read.format("mysql_binlog").load(a)
    st.merge_batch(_rows(env_a, generation=0), 0)
    executed = gtid_set_text(bs.executed_gtid_set(a))
    env_b = (
        spark.read.format("mysql_binlog")
        .option("since_gtid", executed)
        .load(b)
    )
    st.merge_batch(_rows(env_b, generation=0), 1)  # NO epoch bump
    want = _live(latest_state(_rows(
        spark.read.format("mysql_binlog").load(full), generation=0
    )))
    assert _live(st.current(spark)) != want


def test_envelope_to_rows_basename_handling(spark):
    """r18 review fixes pinned: any numeric-suffixed log basename works
    (mysql-bin.000007 — the classic log_bin name), and a name without a
    numeric suffix raises instead of silently producing NULL versions;
    file index 1024 no longer bleeds into the generation field."""
    from mysql_cdc_spark.operators.state_table import envelope_to_rows

    schema = (
        "log_file string, offset bigint, op string, db string, tbl string, "
        "before map<string,string>, after map<string,string>"
    )
    good = spark.createDataFrame(
        [
            ("mysql-bin.000007", 99, "write_rows", "d", "t", None, {"id": "1", "val": "x"}),
            ("mysql-bin.001024", 5, "write_rows", "d", "t", None, {"id": "2", "val": "y"}),
        ],
        schema,
    )
    rows = {r.id: r.offset for r in envelope_to_rows(good, generation=0).collect()}
    assert rows[1] == 7 * (1 << 34) + 99
    assert rows[2] == 1024 * (1 << 34) + 5
    # generation 1's floor sits ABOVE any generation-0 file index —
    # the pre-fix <<40 layout collided exactly here (file 1024)
    gen1 = {r.id: r.offset for r in envelope_to_rows(good, generation=1).collect()}
    assert min(gen1.values()) > max(rows.values())

    bad = spark.createDataFrame(
        [("binlog-without-number", 4, "write_rows", "d", "t", None, {"id": "1", "val": "x"})],
        schema,
    )
    with pytest.raises(Exception, match="no numeric suffix"):
        envelope_to_rows(bad).collect()
