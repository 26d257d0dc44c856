"""Per-query phase breakdown for the HEADLINE bench set.

For each query: warm once, then N reps measuring (a) plan construction
wall (QUERIES[name](spark, sf_dir)) and (b) execution wall (noop sink)
separately.  Prints one JSON line so runs can be diffed.

Usage: SPARK_GRAFT_CPUS=32 python tools/opt_measure.py [reps] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mysql_cdc_spark.queries import HEADLINE, QUERIES
    from mysql_cdc_spark.session import get_spark

    names = sys.argv[2:] or list(HEADLINE)
    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")

    # warm pass (JIT, codegen cache, parquet footers, fixture gen)
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        cons, execs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
        out[name] = {
            "construct_min": round(min(cons), 4),
            "exec_min": round(min(execs), 4),
            "total_min": round(min(c + e for c, e in zip(cons, execs)), 4),
        }
    total = sum(v["total_min"] for v in out.values())
    print(json.dumps({"total": round(total, 4), "queries": out, "load": round(os.getloadavg()[0], 2)}))


if __name__ == "__main__":
    main()
