"""Profile the baseline5 queries: N repetitions each, print per-run walls
and the formatted plan for the slow ones. Usage:
    python tools/profile_baseline5.py [reps] [query ...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mysql_cdc_spark.queries import QUERIES
from mysql_cdc_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
BASELINE5 = [
    "cdc_envelope", "cdc_select_all", "cdc_update_sum",
    "cdc_latest_state", "cdc_txn_events",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or BASELINE5
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    QUERIES["cdc_count_changes"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for name in names:
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: {walls}  min={min(walls)}")


if __name__ == "__main__":
    main()
