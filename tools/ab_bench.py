"""Interleaved A/B benchmark of two repo checkouts in ONE process.

Settles cross-round drift questions (VERDICT r7 #2): a board-wide wall
shift between rounds can be ambient VM noise or a real regression, and
separate-process runs on different VM-days cannot distinguish the two.
This harness loads the two checkouts' `mysql_cdc_spark` packages
alternately into one Python process sharing ONE SparkSession, and times
the headline queries in interleaved rounds (A,B order flipped each
round to cancel cache-order bias), best-of-N per (side, query).  Any
ratio ≈1.0 here means the code is equivalent and the cross-round delta
was environmental.

Usage:
    python tools/ab_bench.py OLD_ROOT NEW_ROOT [rounds]

Prints one JSON line: {"queries": {name: {"a": s, "b": s,
"ratio_b_over_a": r}}, "total_a": s, "total_b": s, "ratio": r}.
"""

from __future__ import annotations

import json
import sys
import time


def _load_queries(root: str):
    """Swap the active checkout: purge the package and re-import from
    `root`.  Rotation/order side effects don't matter here — we look
    names up directly."""
    for mod in list(sys.modules):
        if mod == "mysql_cdc_spark" or mod.startswith("mysql_cdc_spark."):
            del sys.modules[mod]
    sys.path[:] = [p for p in sys.path if "mysql_cdc_spark" not in p]
    sys.path.insert(0, root)
    import mysql_cdc_spark.queries as q  # noqa: PLC0415

    assert q.__file__.startswith(root), f"loaded {q.__file__}, wanted {root}"
    return q


def main() -> None:
    old_root, new_root = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    sf_dir = "/root/testdata/sf0.1"

    # One shared session for both sides (the whole point): same JVM,
    # same JIT state, same ambient load.
    sys.path.insert(0, new_root)
    from mysql_cdc_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("ab-bench")
    spark.sparkContext.setLogLevel("ERROR")

    sides = {"a": old_root, "b": new_root}
    q_old = _load_queries(old_root)
    headline = list(q_old.HEADLINE)

    def run_one(root: str, name: str) -> float:
        q = _load_queries(root)
        fn = q.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm both sides fully (JIT, codegen cache, parquet footers, any
    # event-log materialization) before any timing.
    for side, root in sides.items():
        for name in headline:
            run_one(root, name)

    best: dict[str, dict[str, float]] = {n: {"a": float("inf"), "b": float("inf")} for n in headline}
    for r in range(rounds):
        order = ["a", "b"] if r % 2 == 0 else ["b", "a"]
        for name in headline:
            for side in order:
                w = run_one(sides[side], name)
                best[name][side] = min(best[name][side], w)

    out = {"queries": {}, "rounds": rounds}
    ta = tb = 0.0
    for name in headline:
        a, b = best[name]["a"], best[name]["b"]
        ta += a
        tb += b
        out["queries"][name] = {
            "a": round(a, 4),
            "b": round(b, 4),
            "ratio_b_over_a": round(b / a, 3),
        }
    out["total_a"] = round(ta, 4)
    out["total_b"] = round(tb, 4)
    out["ratio"] = round(tb / ta, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
