"""CDC → lakehouse MERGE crash test (r17 VERDICT #1): a REAL
subprocess runs DataSource binlog stream → foreachBatch → StateTable
MERGE; the parent paces the producer (appends + a live rotation),
SIGKILLs the whole consumer process group mid-stream (driver JVM dies
too — no cleanup code runs), appends post-crash transactions, restarts
the same checkpoint in-process, and asserts the maintained state table
EXACTLY equals a batch latest-state replay of the full source — no
lost keys, no duplicates, no resurrected deletes.

The crash windows this covers (operators/state_table.py):
  - killed mid-saveAsTable → partial version dir, pointer unmoved →
    replay rebuilds the version from scratch;
  - killed between version write and pointer swap → same;
  - killed after pointer swap, before Spark's epoch commit → the
    replayed epoch hits the batch_id guard and is a no-op.
"""

from __future__ import annotations

import json
import os
import pathlib
import signal
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

from mysql_cdc_spark.sources.binlog_codec import (
    DELETE_ROWS_EVENT,
    TYPE_LONG,
    TYPE_VARCHAR,
    UPDATE_ROWS_EVENT,
    WRITE_ROWS_EVENT,
    BinlogWriter,
    TableDef,
)

_T = TableDef("foo", "auto", [(TYPE_LONG, None), (TYPE_VARCHAR, 50)], table_id=7)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# envelope → rows_dt bridge: the LIBRARY entry point, used by both the
# child script and the parent's restart/oracle — the SIGKILL run
# exercises the real consumer API end-to-end.
_ROWS_SRC = """
from mysql_cdc_spark.operators.state_table import envelope_to_rows as _to_rows
"""
from mysql_cdc_spark.operators.state_table import envelope_to_rows as _to_rows


def _txn(w: BinlogWriter, i: int) -> None:
    """Transaction i: insert key i; every 3rd txn also updates key i-3;
    every 5th deletes key i-5 — the state table sees all three ops."""
    w.write_query("foo", "BEGIN")
    w.write_table_map(_T)
    w.write_rows(WRITE_ROWS_EVENT, _T, [[i, f"v{i}"]])
    if i % 3 == 0 and i >= 3:
        w.write_table_map(_T)
        w.write_rows(
            UPDATE_ROWS_EVENT, _T, [([i - 3, f"v{i-3}"], [i - 3, f"u{i}"])]
        )
    if i % 5 == 0 and i >= 5:
        w.write_table_map(_T)
        w.write_rows(DELETE_ROWS_EVENT, _T, [[i - 5, None]])
    w.write_xid(100 + i)


_CHILD_SRC = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from mysql_cdc_spark.sources.binlog_datasource import register_binlog_source
from mysql_cdc_spark.operators.state_table import StateTable

{rows_src}

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
register_binlog_source(spark)
state = StateTable({root!r}, {name!r}, n_buckets=2)
env = (
    spark.readStream.format("mysql_binlog")
    .option("catalog", '{{"foo.auto": ["id", "val"]}}')
    .option("max_bytes_per_batch", "1024")
    .load({src!r})
)
q = (
    _to_rows(env)
    .writeStream.foreachBatch(state.merger())
    .option("checkpointLocation", {cp!r})
    .trigger(processingTime="0 seconds")
    .start()
)
q.awaitTermination()
"""


@pytest.mark.timeout(600)
def test_sigkill_mid_stream_state_table_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    root = str(tmp_path / "state")
    cp = str(tmp_path / "cp")
    os.makedirs(src)
    name = "sigkill_state"
    pointer = pathlib.Path(root) / "_state_pointer.json"

    w = BinlogWriter(checksum="crc32")
    for i in range(40):
        _txn(w, i)
    (pathlib.Path(src) / "binlog.000000").write_bytes(bytes(w.buf))

    child = tmp_path / "consumer.py"
    child.write_text(
        _CHILD_SRC.format(
            repo=_REPO, rows_src=_ROWS_SRC, root=root, name=name, src=src, cp=cp
        )
    )
    proc = subprocess.Popen(
        [sys.executable, str(child)],
        start_new_session=True,  # own process group: the kill takes the JVM too
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )

    def _committed_batch() -> int:
        try:
            return json.loads(pointer.read_text())["batch_id"]
        except (OSError, json.JSONDecodeError, KeyError):
            return -1  # racing the atomic replace

    def _wait_batch(k: int, deadline_s: float = 180) -> None:
        deadline = time.monotonic() + deadline_s
        while _committed_batch() < k and time.monotonic() < deadline:
            assert proc.poll() is None, "consumer child died early"
            time.sleep(0.1)
        assert _committed_batch() >= k

    try:
        _wait_batch(0)  # the uncapped first batch committed
        # live appends + a mid-stream rotation while the child runs
        for i in range(40, 70):
            _txn(w, i)
        w.write_rotate("binlog.000001")
        (pathlib.Path(src) / "binlog.000000").write_bytes(bytes(w.buf))
        w2 = BinlogWriter(checksum="crc32")
        for i in range(70, 100):
            _txn(w2, i)
        (pathlib.Path(src) / "binlog.000001").write_bytes(bytes(w2.buf))
        _wait_batch(2)  # capped triggers are merging the appends
    finally:
        # SIGKILL the whole group mid-merge: python driver AND JVM,
        # no atexit/abort/finally runs anywhere
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        proc.wait(timeout=30)

    # post-crash data: the restart must pick up where the WAL says
    w3 = BinlogWriter(checksum="crc32")
    for i in range(100, 120):
        _txn(w3, i)
    w2.write_rotate("binlog.000002")
    (pathlib.Path(src) / "binlog.000001").write_bytes(bytes(w2.buf))
    (pathlib.Path(src) / "binlog.000002").write_bytes(bytes(w3.buf))

    from mysql_cdc_spark.operators.state_table import StateTable
    from mysql_cdc_spark.sources.binlog_datasource import register_binlog_source

    register_binlog_source(spark)
    state = StateTable(root, name, n_buckets=2)
    env = (
        spark.readStream.format("mysql_binlog")
        .option("catalog", '{"foo.auto": ["id", "val"]}')
        .option("max_bytes_per_batch", "1024")
        .load(src)
    )
    q = (
        _to_rows(env)
        .writeStream.foreachBatch(state.merger())
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    assert q.exception() is None, f"restart stream failed: {q.exception()}"
    assert finished, "availableNow drain did not terminate in time"

    ref_env = (
        spark.read.format("mysql_binlog")
        .option("catalog", '{"foo.auto": ["id", "val"]}')
        .load(src)
    )
    from mysql_cdc_spark.operators.aggregates import latest_state

    want = {
        (r.db, r.tbl, r.id, r.value, r.as_of_offset)
        for r in latest_state(_to_rows(ref_env)).collect()
    }
    got = {
        (r.db, r.tbl, r.id, r.value, r.as_of_offset)
        for r in state.current(spark).collect()
    }
    assert len(got) == len(want), (
        f"state has {len(got)} keys, full replay has {len(want)} — "
        "lost or duplicated keys across the SIGKILL"
    )
    assert got == want
    # deletes actually exercised: keys 0,5,...,110 minus re-inserts stay gone
    live_ids = {t[2] for t in got}
    assert 110 not in live_ids and 119 in live_ids
