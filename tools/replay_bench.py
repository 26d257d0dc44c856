"""Bounded-replay (`since=`) wall bench (r15 VERDICT #2): on a
multi-file byte log, time a FULL envelope replay vs a resume at the
midpoint file — the 100 TB resume claim is that a journaled position
never re-lists or re-decodes history, so the bounded wall should track
the surviving byte fraction, and the pruned files must never enter the
Spark scan (driver-side listing, checked by count of loaded paths).

Usage: python tools/replay_bench.py [fixture_dir]
       (default .stream_tmp/binlog_sf0.1_v{ver}; pass
        .stream_tmp/binlog_organic_x100_v{ver} for the x100 line)
Output: one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    from mysql_cdc_spark.queries._shared import _FIXTURE_VERSION, _STREAM_TMP
    from mysql_cdc_spark.session import get_spark
    from mysql_cdc_spark.sources import binlog_source as bs

    fixture = (
        sys.argv[1]
        if len(sys.argv) > 1
        else f"{_STREAM_TMP}/binlog_sf0.1_v{_FIXTURE_VERSION}"
    )
    spark = get_spark("replay-bench")
    spark.sparkContext.setLogLevel("ERROR")
    files = sorted(
        p.name for p in pathlib.Path(fixture).iterdir()
        if p.name.startswith("binlog.")
    )
    mid = files[len(files) // 2]
    total_bytes = sum(
        (pathlib.Path(fixture) / f).stat().st_size for f in files
    )
    since_bytes = sum(
        (pathlib.Path(fixture) / f).stat().st_size for f in files if f >= mid
    )

    def run(since):
        env = bs.read_binlog_envelope(spark, fixture, since=since)
        t0 = time.perf_counter()
        n = env.count()
        return time.perf_counter() - t0, n

    run(None)  # warm
    walls = {"full": 9e9, "since_mid": 9e9}
    counts = {}
    for _ in range(2):
        w, n = run(None)
        walls["full"] = min(walls["full"], w)
        counts["full"] = n
        w, n = run((mid, 4))
        walls["since_mid"] = min(walls["since_mid"], w)
        counts["since_mid"] = n
    pruned = len(bs._list_log_files(fixture, mid, spark))
    print(json.dumps({
        "fixture": fixture,
        "files": len(files),
        "resume_file": mid,
        "files_entering_scan": pruned,
        "binlog_mb": round(total_bytes / 1e6, 1),
        "since_fraction_bytes": round(since_bytes / total_bytes, 3),
        "rows": counts,
        "wall_sec": {k: round(v, 3) for k, v in walls.items()},
        "speedup_full_over_since": round(
            walls["full"] / walls["since_mid"], 2
        ),
    }))


if __name__ == "__main__":
    main()
