"""Scale-stress evidence beyond the provided fixtures: replicate the
sf0.1 events table K× (shifting event_id/user_id per copy so keys stay
unique and ordering properties hold) and time the headline CDC queries
on the result — ~4M envelope events at K=10.

Usage: python tools/scale_stress.py [K]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1"
SCRATCH = "/root/repo/.stream_tmp/stress"


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import functions as F

    from mysql_cdc_spark.queries import QUERIES
    from mysql_cdc_spark.session import get_spark
    from mysql_cdc_spark.sources.io import read_table

    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")

    out = Path(SCRATCH) / f"events_x{k}"
    if not (out / "_SUCCESS").exists():
        ev = read_table(spark, BASE, "events")
        n = ev.count()
        copies = [
            ev.select(
                (F.col("event_id") + F.lit(i * n)).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {i} DAYS")).alias("ts"),
                (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for i in range(k)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        # ts arrives as TimestampType here; the stress dir stores it as
        # int64 ns to mirror the driver fixtures read by read_table.
        big = big.withColumn("ts", F.unix_micros("ts") * 1000)
        big.repartition(8).write.mode("overwrite").parquet(str(out / "events.parquet"))

    sf_dir = str(out)
    names = ["cdc_envelope", "cdc_select_all", "cdc_update_sum",
             "cdc_latest_state", "cdc_txn_events"]
    for name in names:  # warm
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    walls = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        walls[name] = round(best, 3)
    rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    print(json.dumps({"k": k, "source_rows": rows, "envelope_rows": rows * 4,
                      "walls": walls, "total": round(sum(walls.values()), 3)}))


if __name__ == "__main__":
    main()
