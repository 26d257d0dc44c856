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
import os
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


def decode_ab(old_root: str, new_root: str, rounds: int) -> None:
    """A/B the pure byte-codec hot loop (no Spark): one binlog byte
    fixture (built once, decoded identically by both sides), timed
    interleaved best-of-N.  Isolates the decode_rows_per_sec metric
    from ambient Spark/VM swings — bench.py's decode rate is derived
    from the cdc_envelope query wall, which the headline A/B already
    covers; THIS covers the binlog_codec.py row loop the r9 branches
    (collation lookup, MINIMAL bitmaps, ROWS_QUERY) actually touched."""
    q = _load_queries(new_root)
    from mysql_cdc_spark.sources.binlog_codec import (  # noqa: PLC0415
        TYPE_LONG, TYPE_NEWDECIMAL, TYPE_VARCHAR, WRITE_ROWS_EVENT,
        UPDATE_ROWS_EVENT, BinlogWriter, TableDef,
    )

    t = TableDef(
        "foo", "auto",
        [(TYPE_LONG, None), (TYPE_NEWDECIMAL, (12, 4)), (TYPE_VARCHAR, 50)],
    )
    cat = {("foo", "auto"): ["id", "val", "word"]}
    w = BinlogWriter()
    n_rows = 0
    for batch in range(200):
        w.write_table_map(t, ts=batch)
        rows = [[batch * 100 + i, f"{i}.5000", f"word{i}"] for i in range(100)]
        w.write_rows(WRITE_ROWS_EVENT, t, rows, ts=batch)
        w.write_rows(
            UPDATE_ROWS_EVENT, t,
            [(r, [r[0], f"{i}.7500", f"w{i}"]) for i, r in enumerate(rows[:50])],
            ts=batch,
        )
        w.write_xid(batch, ts=batch)
        n_rows += 150
    data = w.getvalue()

    def run_side(root: str) -> float:
        qq = _load_queries(root)
        from mysql_cdc_spark.sources.binlog_codec import decode_binlog  # noqa: PLC0415
        t0 = time.perf_counter()
        evs = decode_binlog(data, cat)
        dt = time.perf_counter() - t0
        assert len(evs) > 0
        return dt

    best = {"a": float("inf"), "b": float("inf")}
    sides = {"a": old_root, "b": new_root}
    for side, root in sides.items():          # warm
        run_side(root)
    for r in range(rounds):
        order = ["a", "b"] if r % 2 == 0 else ["b", "a"]
        for side in order:
            best[side] = min(best[side], run_side(sides[side]))
    print(json.dumps({
        "metric": "decode_ab",
        "fixture_rows": n_rows,
        "bytes": len(data),
        "a_sec": round(best["a"], 4),
        "b_sec": round(best["b"], 4),
        "a_rows_per_sec": round(n_rows / best["a"]),
        "b_rows_per_sec": round(n_rows / best["b"]),
        "ratio_b_over_a": round(best["b"] / best["a"], 3),
        "rounds": rounds,
    }))


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--decode"]
    # --queries=name1,name2 restricts the A/B to a subset (r15 VERDICT
    # #6: a single query's cross-round move needs a targeted probe,
    # not the whole headline's wall budget).  Unknown names error.
    only: list[str] | None = None
    for a in list(argv):
        if a.startswith("--queries="):
            only = [n for n in a.split("=", 1)[1].split(",") if n]
            argv.remove(a)
    if "--decode" in sys.argv:
        old_root, new_root = argv[0], argv[1]
        decode_ab(old_root, new_root, int(argv[2]) if len(argv) > 2 else 9)
        return
    old_root, new_root = argv[0], argv[1]
    rounds = int(argv[2]) if len(argv) > 2 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # One shared session for both sides (the whole point): same JVM,
    # same JIT state, same ambient load.
    sys.path.insert(0, new_root)
    from mysql_cdc_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("ab-bench")
    spark.sparkContext.setLogLevel("ERROR")

    sides = {"a": old_root, "b": new_root}
    q_old = _load_queries(old_root)
    headline = list(q_old.HEADLINE)
    if only is not None:
        unknown = [n for n in only if n not in q_old.QUERIES]
        if unknown:
            raise SystemExit(f"unknown --queries value(s) {unknown}")
        headline = only

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
