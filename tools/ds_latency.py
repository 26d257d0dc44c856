"""End-to-end append→visible latency of the mysql_binlog STREAMING
DataSource, measured the same way streaming/latency.py measures the
push tailer: append one committed transaction to a live log, stamp the
wall clock, and record when a foreachBatch sink first sees its xid.

This quantifies the honest trade against the push path
(`execute_query_push`, inotify tailer → bounded queue, ~ms): the
DataSource rides Structured Streaming's micro-batch loop, so its floor
is the trigger interval + batch planning (driver state walk) + task
launch.  The push path stays the low-latency surface (the reference's
contract); the DataSource is the throughput / exactly-once / SQL
surface.  Usage: python tools/ds_latency.py [turns]  → one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import shutil
import statistics
import sys
import threading
import time
import uuid

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mysql_cdc_spark.queries._shared import _STREAM_TMP


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from mysql_cdc_spark.session import get_spark
    from mysql_cdc_spark.sources.binlog_codec import (
        TYPE_LONG,
        TYPE_VARCHAR,
        WRITE_ROWS_EVENT,
        BinlogWriter,
        TableDef,
    )
    from mysql_cdc_spark.sources.binlog_datasource import (
        register_binlog_source,
    )

    spark = get_spark("ds-latency")
    spark.sparkContext.setLogLevel("ERROR")
    register_binlog_source(spark)

    tag = uuid.uuid4().hex[:6]
    live = pathlib.Path(_STREAM_TMP) / f"ds_lat_{tag}"
    live.mkdir(parents=True)
    cp = f"{_STREAM_TMP}/cp_ds_lat_{tag}"
    t = TableDef("foo", "auto", [(TYPE_LONG, None), (TYPE_VARCHAR, 50)])
    w = BinlogWriter(checksum="crc32")
    log = live / "binlog.000000"
    log.write_bytes(bytes(w.buf))

    seen: dict[int, float] = {}
    lock = threading.Lock()

    def on_batch(df, _id) -> None:
        now = time.perf_counter()
        for r in df.filter("op = 'xid'").select("xid").collect():
            with lock:
                seen.setdefault(int(r.xid), now)

    q = (
        spark.readStream.format("mysql_binlog")
        .option("catalog", '{"foo.auto": ["id", "val"]}')
        .load(str(live))
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", cp)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        time.sleep(3)  # let the first (empty) micro-batches settle
        lats: list[float] = []
        for i in range(turns):
            w.write_query("foo", "BEGIN", ts=i + 1)
            w.write_table_map(t, ts=i + 1)
            w.write_rows(WRITE_ROWS_EVENT, t, [[i, f"v{i}"]], ts=i + 1)
            w.write_xid(1000 + i, ts=i + 1)
            t0 = time.perf_counter()
            log.write_bytes(bytes(w.buf))  # atomic-enough append for local fs
            while True:
                with lock:
                    t1 = seen.get(1000 + i)
                if t1 is not None:
                    lats.append(t1 - t0)
                    break
                if time.perf_counter() - t0 > 60:
                    raise TimeoutError(f"turn {i} never arrived")
                time.sleep(0.005)
        print(
            json.dumps(
                {
                    "metric": "ds_stream_latency",
                    "turns": turns,
                    "p50_sec": round(statistics.median(lats), 4),
                    "min_sec": round(min(lats), 4),
                    "max_sec": round(max(lats), 4),
                }
            )
        )
    finally:
        q.stop()
        shutil.rmtree(cp, ignore_errors=True)
        shutil.rmtree(live, ignore_errors=True)


if __name__ == "__main__":
    main()
