"""Full-registry Spark-side timing sweep: run EVERY registered query
at the given sf_dir through the noop sink (warm + one timed pass) and
print one JSON line {name: seconds}, slowest last.  The per-round
regression tracker behind the r10 expression-shape findings — the
headline bench covers 11 queries; this covers all of them.

Usage: python tools/sweep_registry.py [sf_dir] [top_n]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    from mysql_cdc_spark.queries import QUERIES
    from mysql_cdc_spark.session import get_spark

    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")

    walls: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            errors[name] = f"{type(exc).__name__}: {exc}"

    # Rotation staleness audit (r18 VERDICT #7): with a 50-query
    # driver window over 200+ names, print how far behind the
    # least-recently-verified query is, so window-policy drift is
    # visible in every sweep log.
    from mysql_cdc_spark.queries.rotation import driver_verified_rounds

    rounds = driver_verified_rounds()
    latest = max(rounds.values(), default=0)
    stale = [latest - rounds[n] for n in QUERIES if n in rounds]
    rotation = {
        "latest_driver_round": latest,
        "max_staleness_rounds": max(stale, default=None),
        "never_verified": sorted(n for n in QUERIES if n not in rounds),
    }

    ordered = dict(sorted(walls.items(), key=lambda kv: kv[1]))
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_queries": len(walls),
        "total_sec": round(sum(walls.values()), 1),
        "rotation": rotation,
        "slowest": dict(list(ordered.items())[-top_n:]),
        "walls": ordered,
        "errors": errors,
    }))


if __name__ == "__main__":
    main()
