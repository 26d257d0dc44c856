"""Filter-before-decode pushdown bench (r14 VERDICT #1 'done' line).

Times the envelope decode of the multi-table byte binlog (tables
foo.auto / bench.big, ~50/50 by rows) three ways at a chosen scale:

- full:        decode everything (the only mode the reference has —
               mysql_binlog.clj:592-604 decodes every used column)
- then_filter: decode everything, filter to foo.auto rows in the
               DataFrame — what a selective consumer paid before r15
- pushdown:    only_tables={('foo','auto')} pushed into the codec —
               foreign row events skip image parsing
- headers:     only_tables={nonexistent} — headers+table_maps only,
               the upper bound of the win at extreme selectivity
- ops_then_filter / ops_pushdown: the DELTA-TYPE predicate (r16
               only_ops): an insert-only consumer (write_rows is ~2/5
               of row events; update pairs make it ~1/3 of row
               IMAGES) post-filtered vs pushed into the codec

Usage: python tools/pushdown_bench.py [sf_dir]
       (default /root/testdata/sf0.1; pass
        .stream_tmp/stress/organic_x10 for the x10 line)
Output: one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mysql_cdc_spark.queries._shared import _FIXTURE_VERSION, _STREAM_TMP


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from mysql_cdc_spark.session import get_spark
    from mysql_cdc_spark.sources import binlog_source as bs

    spark = get_spark("pushdown-bench")
    spark.sparkContext.setLogLevel("ERROR")
    tag = pathlib.Path(sf_dir).name
    out_dir = pathlib.Path(_STREAM_TMP) / f"binlog_{tag}_v{_FIXTURE_VERSION}"
    if not any(out_dir.glob("binlog.*")):
        bs.generate_binlog_from_events(sf_dir, str(out_dir))

    variants = {
        "full": dict(only_tables=None),
        "then_filter": dict(only_tables=None, post_filter=True),
        "pushdown": dict(only_tables={("foo", "auto")}),
        "headers_only": dict(only_tables={("no", "table")}),
        "ops_then_filter": dict(only_tables=None, post_filter_ops=True),
        "ops_pushdown": dict(only_ops={"write_rows"}),
        # composed predicates: one table AND insert-only (~20% of row
        # images on this fixture) — the deepest-selectivity point the
        # two-table fixture can express short of headers-only
        "tbl_ops_then_filter": dict(only_tables=None, post_filter_both=True),
        "tbl_ops_pushdown": dict(
            only_tables={("foo", "auto")}, only_ops={"write_rows"}
        ),
    }
    walls: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name, opts in variants.items():
        times = []
        for i in range(3):  # 1 warm + 2 timed
            env = bs.read_binlog_envelope(
                spark, str(out_dir), only_tables=opts.get("only_tables"),
                only_ops=opts.get("only_ops"),
            )
            if opts.get("post_filter"):
                env = env.filter(
                    "op NOT IN ('write_rows','update_rows','delete_rows') "
                    "OR (db = 'foo' AND tbl = 'auto')"
                )
            if opts.get("post_filter_ops"):
                env = env.filter(
                    "op NOT IN ('update_rows','delete_rows')"
                )
            if opts.get("post_filter_both"):
                env = env.filter(
                    "op NOT IN ('write_rows','update_rows','delete_rows') "
                    "OR (op = 'write_rows' AND db = 'foo' AND tbl = 'auto')"
                )
            t0 = time.perf_counter()
            counts[name] = env.count()
            times.append(time.perf_counter() - t0)
        walls[name] = round(min(times[1:]), 4)
    total_bytes = sum(p.stat().st_size for p in out_dir.glob("binlog.*"))
    print(json.dumps({
        "fixture": str(out_dir),
        "binlog_mb": round(total_bytes / 1e6, 1),
        "rows": counts,
        "wall_sec": walls,
        "speedup_vs_then_filter": round(
            walls["then_filter"] / walls["pushdown"], 2),
        "speedup_headers_only": round(
            walls["full"] / walls["headers_only"], 2),
        "speedup_ops_vs_then_filter": round(
            walls["ops_then_filter"] / walls["ops_pushdown"], 2),
        "speedup_tbl_ops_vs_then_filter": round(
            walls["tbl_ops_then_filter"] / walls["tbl_ops_pushdown"], 2),
    }))


if __name__ == "__main__":
    main()
