"""Cross-directory GTID failover (r17 VERDICT #2): the executed-set
handshake must survive a primary swap — file names reset, content
overlaps — and the purged-history guard must fire when the new
primary's history no longer covers the consumer's position.

Fixture geometry (sf0.001 events, rotate_every=200 → multi-file dirs):
  old primary  A: events [0, 600)   files binlog.000000-000002
  new primary  B: events [400, 1000) files binlog.000000-000002 (reset!)
B's first PREVIOUS_GTIDS snapshots 1..400 — the replica's executed set
at promotion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_cdc_spark.sources import binlog_source as bs
from mysql_cdc_spark.sources.binlog_codec import gtid_set_text, parse_gtid_set

SF = "/root/testdata/sf0.001"
N, E40, E60 = 1000, 400, 600


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("failover")
    a, b = str(root / "a"), str(root / "b")
    bs.generate_binlog_from_events(
        SF, a, rotate_every=200, gtid=True, prev_gtids=True, checksum="crc32",
        event_range=(0, E60),
    )
    bs.generate_binlog_from_events(
        SF, b, rotate_every=200, gtid=True, prev_gtids=True, checksum="crc32",
        event_range=(E40, N), renumber_files=True,
    )
    return a, b


def test_new_primary_file_names_reset(dirs):
    import os

    _, b = dirs
    names = sorted(f for f in os.listdir(b) if f.startswith("binlog."))
    assert names[0] == "binlog.000000", names
    assert len(names) == 3  # 600 events / 200 per file


def test_resume_is_exactly_the_unapplied_suffix(spark, dirs):
    """since_gtid = A's full executed set against B delivers events
    E60..N-1 exactly once — the 40-60% overlap is skipped, nothing
    after it is lost."""
    from mysql_cdc_spark.sources.binlog_datasource import register_binlog_source

    a, b = dirs
    executed = gtid_set_text(bs.executed_gtid_set(a))
    assert executed == f"{bs.GTID_SID}:1-{E60}"

    register_binlog_source(spark)
    resumed = (
        spark.read.format("mysql_binlog").option("since_gtid", executed).load(b)
    )
    xids = sorted(
        r.xid for r in resumed.filter(F.col("op") == "xid").select("xid").collect()
    )
    assert xids == list(range(E60, N)), (
        f"resume delivered {len(xids)} txns, first={xids[:3]}, last={xids[-3:]}"
    )
    gnos = sorted(
        int(r.sql.rsplit(":", 1)[1])
        for r in resumed.filter(F.col("op") == "gtid").select("sql").collect()
    )
    assert gnos == list(range(E60 + 1, N + 1))


def test_resume_lands_mid_file(dirs):
    """E60=600 sits inside B's second file (400..599 is file 0,
    600..799 file 1 — boundary case: resume at ITS FIRST frame) and a
    set ending mid-file resumes mid-file."""
    _, b = dirs
    hit = bs.resolve_gtid_resume(b, parse_gtid_set(f"{bs.GTID_SID}:1-650"))
    assert hit is not None
    fname, off = hit
    assert fname == "binlog.000001" and off > 4


def test_purged_history_raises(dirs):
    """A consumer that only reached 20% cannot resume on B — B's first
    snapshot (1..400) already contains transactions the consumer never
    applied.  MySQL error 1236's condition."""
    _, b = dirs
    with pytest.raises(ValueError, match="purged"):
        bs.resolve_gtid_resume(b, parse_gtid_set(f"{bs.GTID_SID}:1-200"))


def test_fully_applied_set_resumes_past_end(dirs):
    _, b = dirs
    fname, off = bs.resolve_gtid_resume(b, parse_gtid_set(f"{bs.GTID_SID}:1-{N}"))
    import os

    assert fname == "binlog.000002"
    assert off == os.path.getsize(os.path.join(b, fname))


class TestMultiUuidPromotion:
    """The full failover shape: after promotion the new primary tags
    its OWN writes with its own server UUID (gno restarting at 1)
    while replicated history keeps the old primary's sid — executed
    sets, PREVIOUS_GTIDS snapshots and resume all go multi-UUID."""

    @pytest.fixture(scope="class")
    def dir_b2(self, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("promo") / "b2")
        # new primary: replicated events [400, 600) under the OLD sid,
        # own writes [600, 1000) under ITS sid (gno 1..400)
        bs.generate_binlog_from_events(
            SF, d, rotate_every=200, gtid=True, prev_gtids=True,
            checksum="crc32", event_range=(E40, N), renumber_files=True,
            promote_at=E60,
        )
        return d

    def test_snapshots_carry_both_sids(self, dir_b2):
        import os

        last = sorted(
            f for f in os.listdir(dir_b2) if f.startswith("binlog.")
        )[-1]
        snap = bs._peek_previous_gtids(os.path.join(dir_b2, last))
        # last file starts at event 800: old sid capped at the
        # promotion point, new sid counted from 1
        assert snap == {
            bs.GTID_SID: [(1, E60)],
            bs.GTID_SID_B: [(1, 800 - E60)],
        }

    def test_resume_delivers_only_new_primary_writes(self, spark, dir_b2):
        from mysql_cdc_spark.sources.binlog_datasource import (
            register_binlog_source,
        )

        register_binlog_source(spark)
        resumed = (
            spark.read.format("mysql_binlog")
            .option("since_gtid", f"{bs.GTID_SID}:1-{E60}")
            .load(dir_b2)
        )
        xids = sorted(
            r.xid for r in resumed.filter(F.col("op") == "xid").collect()
        )
        assert xids == list(range(E60, N))
        gtids = sorted(
            r.sql for r in resumed.filter(F.col("op") == "gtid").collect()
        )
        # every delivered transaction carries the NEW primary's sid
        assert all(g.startswith(bs.GTID_SID_B + ":") for g in gtids)
        gnos = sorted(int(g.rsplit(":", 1)[1]) for g in gtids)
        assert gnos == list(range(1, N - E60 + 1))

    def test_executed_set_round_trip(self, dir_b2):
        import os

        executed = bs.executed_gtid_set(dir_b2)
        assert gtid_set_text(executed) == (
            f"{bs.GTID_SID}:1-{E60},{bs.GTID_SID_B}:1-{N - E60}"
        )
        # a consumer that drained everything resumes past the end
        fname, off = bs.resolve_gtid_resume(dir_b2, executed)
        assert fname == "binlog.000002"
        assert off == os.path.getsize(os.path.join(dir_b2, fname))

    def test_partial_new_sid_resume_lands_mid_new_writes(self, dir_b2):
        """Consumer applied the old history AND the first 150 of the
        new primary's own writes: resume lands at new-sid gno 151."""
        hit = bs.resolve_gtid_resume(
            dir_b2,
            parse_gtid_set(f"{bs.GTID_SID}:1-{E60},{bs.GTID_SID_B}:1-150"),
        )
        assert hit is not None
        fname, _ = hit
        # gno 151 = event 750, in the file covering [600, 800)
        assert fname == "binlog.000001"

    def test_old_history_purged_still_raises(self, dir_b2):
        with pytest.raises(ValueError, match="purged"):
            bs.resolve_gtid_resume(
                dir_b2, parse_gtid_set(f"{bs.GTID_SID}:1-200")
            )
