"""Locate the plain-vs-chunked as-of join crossover (r11 VERDICT #8).

PLANS.md records the chunked as-of form costing ~1.8× at fixture
scale and names the crossover qualitatively ("a single key's rows
exceed one task's sort capacity") but never locates it.  This ramp
builds a SINGLE-KEY fixture — the worst case for the plain
union+window form, whose per-key sort partition then holds EVERY row —
and times both forms as the per-key row count grows.

Fixture at ramp step N: one user, N left (purchase) rows + N right
(click) rows, timestamps uniform over 64 days (so the chunked form
gets ~64 real day-chunks and its carry frame has ~64 rows).  Both
forms are executed with a count() action, warm (best of `reps` after
one untimed warm-up of the smallest step).

The resulting crossover row count feeds the skew-adaptive dispatch
threshold in operators/timeseries.py (r11 VERDICT #3): below it the
1-shuffle plain form wins, above it the hot key serializes one sort
task and the 3-bounded-shuffle chunked form wins.

Usage: python tools/asof_crossover.py [max_exp]
Output: one JSON row per ramp step + a summary naming the crossover.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DAY = 86400
SPAN_DAYS = 64


def single_key_fixture(spark, n: int):
    """n purchases + n clicks, ONE user, ts uniform over SPAN_DAYS."""
    from pyspark.sql import functions as F

    def side(tag, offset):
        return (
            spark.range(n)
            .select(
                (F.col("id") * 2 + offset).alias("event_id"),
                F.lit(1).alias("user_id"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000)
                    + (F.col("id") * (SPAN_DAYS * DAY) / n).cast("long")
                    + offset
                ).alias("ts"),
                (F.col("id") % 1000).cast("double").alias("value"),
            )
        )

    # clicks land 1s after the same-index purchase ts so matches exist
    return side("l", 0), side("r", 1)


def run(form, left, right) -> int:
    from mysql_cdc_spark.operators import timeseries

    fn = timeseries.asof_join if form == "plain" else timeseries.asof_join_chunked
    out = fn(
        left,
        right,
        on=["user_id"],
        ts="ts",
        payload=["event_id", "ts", "value"],
        tie="event_id",
        prefix="click_",
        tolerance_seconds=3600,
    )
    # consume the carried payload — a bare count() lets Catalyst prune
    # the window expressions (and with them the per-key sort) entirely
    from pyspark.sql import functions as F

    return out.agg(
        F.count("*").alias("n"), F.sum("click_value").alias("s")
    ).first()["n"]


def main() -> None:
    from mysql_cdc_spark.session import get_spark

    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    reps = 3
    spark = get_spark("asof-crossover")

    # warm-up: JIT + codegen caches on the smallest step, untimed
    l, r = single_key_fixture(spark, 10_000)
    run("plain", l, r)
    run("chunked", l, r)

    crossover = None
    for exp in range(max_exp):
        n = 50_000 * (2**exp)
        left, right = single_key_fixture(spark, n)
        left = left.cache()
        right = right.cache()
        left.count(), right.count()
        row = {"n_per_side": n}
        for form in ("plain", "chunked"):
            best = min(
                (lambda t0=time.perf_counter(): (run(form, left, right), time.perf_counter() - t0)[1])()
                for _ in range(reps)
            )
            row[form] = round(best, 3)
        row["ratio_chunked_over_plain"] = round(row["chunked"] / row["plain"], 3)
        print(json.dumps(row), flush=True)
        if crossover is None and row["chunked"] < row["plain"]:
            crossover = n
        left.unpersist(), right.unpersist()

    print(
        json.dumps(
            {
                "summary": "single-key crossover",
                "chunked_wins_at_n_per_side": crossover,
                "note": "plain sorts all 2n rows of the hot key in ONE task; "
                "chunked splits it over ~%d day-chunks" % SPAN_DAYS,
            }
        )
    )


if __name__ == "__main__":
    main()
