"""Oversized-single-file decode: whole-file (one task) vs frame-aligned
intra-file splits (split_bytes planning walk + parallel slice decode).

Real binlogs rotate at max_binlog_size (~1 GB), but an operator who
raised it — or a compacted archive — should not serialize onto one
core.  This measures the trade on ONE large log: the driver pays a
serial state-only planning walk (headers + CRC + non-row bodies; row
images skipped), the executors decode slices in parallel.

Usage: python tools/split_bench.py [target_mb] [split_mb]
Output: one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mysql_cdc_spark.queries._shared import _STREAM_TMP


def main() -> None:
    target_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    split_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from mysql_cdc_spark.session import get_spark
    from mysql_cdc_spark.sources.binlog_codec import (
        TYPE_LONG,
        TYPE_NEWDECIMAL,
        TYPE_VARCHAR,
        WRITE_ROWS_EVENT,
        BinlogWriter,
        TableDef,
    )
    from mysql_cdc_spark.sources.binlog_datasource import (
        _split_file,
        register_binlog_source,
    )

    out = pathlib.Path(_STREAM_TMP) / f"bigfile_{target_mb}mb"
    log = out / "binlog.000000"
    if not log.exists():
        out.mkdir(parents=True, exist_ok=True)
        t = TableDef(
            "bench", "big",
            [(TYPE_LONG, None), (TYPE_NEWDECIMAL, (12, 4)), (TYPE_VARCHAR, 50)],
            table_id=1,
        )
        w = BinlogWriter(checksum="crc32")
        batch = 0
        while len(w.buf) < target_mb * 1_000_000:
            w.write_table_map(t, ts=batch)
            w.write_rows(
                WRITE_ROWS_EVENT, t,
                [[batch * 100 + i, f"{i}.5000", f"word{i}"] for i in range(100)],
                ts=batch,
            )
            w.write_xid(batch, ts=batch)
            batch += 1
        log.write_bytes(bytes(w.buf))

    size = log.stat().st_size
    spark = get_spark("split-bench")
    spark.sparkContext.setLogLevel("ERROR")
    register_binlog_source(spark)
    cat = '{"bench.big": ["id", "val", "word"]}'

    # planning walk alone (driver-serial cost of the split)
    t0 = time.time()
    slices = _split_file(str(log), {("bench", "big"): ["id", "val", "word"]},
                         split_mb * 1_000_000)
    walk_sec = round(time.time() - t0, 3)

    def timed(reader):
        best = None
        for i in range(3):  # warm + best-of-2
            t0 = time.time()
            n = reader().count()
            dt = time.time() - t0
            if i:
                best = dt if best is None else min(best, dt)
        return round(best, 3), n

    whole_sec, n1 = timed(
        lambda: spark.read.format("mysql_binlog")
        .option("catalog", cat).load(str(out))
    )
    split_sec, n2 = timed(
        lambda: spark.read.format("mysql_binlog")
        .option("catalog", cat)
        .option("split_bytes", str(split_mb * 1_000_000))
        .load(str(out))
    )
    assert n1 == n2, (n1, n2)

    # STREAM catch-up over the same single oversized file (r17): the
    # first availableNow trigger used to plan the END file as one
    # serial slice; split_bytes now fans its decode out exactly like
    # the batch path (assembly stays keyed by log_file downstream).
    import uuid

    def stream_drain(split: bool):
        counts = []
        name = "spb_" + uuid.uuid4().hex[:6]
        cp = f"{_STREAM_TMP}/cp_{name}"
        rd = spark.readStream.format("mysql_binlog").option("catalog", cat)
        if split:
            rd = rd.option("split_bytes", str(split_mb * 1_000_000))
        q = (
            rd.load(str(out))
            .writeStream.foreachBatch(
                lambda df, _b: counts.append(df.count())
            )
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        import shutil

        shutil.rmtree(cp, ignore_errors=True)
        return sum(counts)

    t0 = time.time()
    sn1 = stream_drain(split=False)
    stream_whole_sec = round(time.time() - t0, 3)
    t0 = time.time()
    sn2 = stream_drain(split=True)
    stream_split_sec = round(time.time() - t0, 3)
    assert sn1 == sn2 == n1, (sn1, sn2, n1)

    print(json.dumps({
        "metric": "split_bench",
        "file_mb": round(size / 1e6, 1),
        "rows": n1,
        "n_slices": len(slices),
        "planning_walk_sec": walk_sec,
        "whole_file_sec": whole_sec,
        "split_sec": split_sec,
        "speedup": round(whole_sec / split_sec, 2),
        "stream_whole_sec": stream_whole_sec,
        "stream_split_sec": stream_split_sec,
        "stream_speedup": round(stream_whole_sec / stream_split_sec, 2),
    }))


if __name__ == "__main__":
    main()
