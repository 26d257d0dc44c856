"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given scale factor, then compares row count, sorted
column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [--json OUT] [--offset K]
       [--limit N] [sf_dir] [name ...]

``--offset``/``--limit`` select a window of the registry in its current
order — gate-side sampling control (ADVICE r7: the OPERATOR chooses the
sample, the registry's own rotation merely provides a sensible default
order).  With no flags, ALL queries are checked.
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def frame_digest(df) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted("|".join(_norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return len(rows), cols, h.hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    usage = (
        "usage: check_correctness.py [--json OUT] [--offset K] [--limit N] "
        "[SF_DIR [QUERY ...]]"
    )
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit(usage)
        json_out = argv[i + 1]
        del argv[i:i + 2]
    offset, limit = 0, None
    for flag in ("--offset", "--limit"):
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv) or not argv[i + 1].isdigit():
                sys.exit(usage)
            if flag == "--offset":
                offset = int(argv[i + 1])
            else:
                limit = int(argv[i + 1])
            del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}

    import __spark_entry__ as e
    from mysql_cdc_spark.session import get_spark

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    names = [n for n in qs if not only or n in only]
    names = names[offset:offset + limit if limit is not None else None]
    failed, passed, weak = [], [], []
    for name in names:
        fn = qs[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failed.append(name)
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None, "err": f"spark: {ex}"}
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            weak.append(name)
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(sdf),
                             "oracle_rows": None, "err": "no oracle (rows-only)"}
            print(f"weak {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            failed.append(name)
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(sdf),
                             "oracle_rows": None, "err": f"duckdb: {ex}"}
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        sn, sc, sh = frame_digest(sdf)
        on, oc, oh = frame_digest(odf)
        results[name] = {"rows_match": sn == on, "schema_match": sc == oc,
                         "hash_match": (sn, sc, sh) == (on, oc, oh),
                         "spark_rows": sn, "oracle_rows": on, "err": None}
        if (sn, sc, sh) == (on, oc, oh):
            passed.append(name)
            print(f"PASS {name}: rows={sn} [{time.time()-t0:.1f}s]")
        else:
            failed.append(name)
            print(f"FAIL {name}: spark(rows={sn}, cols={sc}, h={sh[:12]}) vs oracle(rows={on}, cols={oc}, h={oh[:12]})")
            if sc == oc and sn and on:
                import pandas as pd  # noqa: F401
                print("  spark head:", sdf[sorted(sdf.columns)].head(3).to_dict("records"))
                print("  oracle head:", odf[sorted(odf.columns)].head(3).to_dict("records"))

    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(weak)} weak (rows-only)")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(results, fh, indent=2)
        print(f"wrote {json_out}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
