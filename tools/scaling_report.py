"""Scaling evidence: run the headline queries at several scale factors
and report wall-time ratios.  A plan that scales linearly in data (or
is overhead-bound at small SF) shows ratios well under the 10× data
ratio; a quadratic operator would blow past it.

Usage: python tools/scaling_report.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from mysql_cdc_spark.queries import HEADLINE, QUERIES
    from mysql_cdc_spark.session import get_spark

    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")

    # warm everything once at the largest SF
    for name in HEADLINE:
        QUERIES[name](spark, SFS[-1]).write.format("noop").mode("overwrite").save()

    report: dict[str, dict[str, float]] = {}
    for sf_dir in SFS:
        sf = sf_dir.rsplit("sf", 1)[-1]
        for name in HEADLINE:
            best = min(
                _time(QUERIES[name], spark, sf_dir) for _ in range(2)
            )
            report.setdefault(name, {})[sf] = round(best, 3)

    for name, row in report.items():
        r1 = row["0.01"] / row["0.001"] if row["0.001"] else float("nan")
        r2 = row["0.1"] / row["0.01"] if row["0.01"] else float("nan")
        print(
            json.dumps(
                {
                    "query": name,
                    "walls": row,
                    "ratio_0.001_to_0.01": round(r1, 2),
                    "ratio_0.01_to_0.1": round(r2, 2),
                }
            )
        )


def _time(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
