"""Capture .explain("formatted") + plan-construction wall for queries.

Usage:
    python tools/opt_explain.py [suffix] [query ...]

Writes plans/r19/<query>_<suffix>.txt (suffix defaults to "before") and
prints a per-query summary: construction seconds, Exchange count, join
nodes, Python-eval nodes.  Explains are plan-only (no job), so this is
safe to run alongside other work.
"""

from __future__ import annotations

import io
import os
import re
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT_DIR = Path(__file__).resolve().parent.parent / "plans" / os.environ.get(
    "SPARK_GRAFT_PLANS_ROUND", "r20"
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mysql_cdc_spark.queries import HEADLINE, QUERIES
    from mysql_cdc_spark.session import get_spark

    names = sys.argv[2:] or HEADLINE
    spark = get_spark("opt-explain")
    spark.sparkContext.setLogLevel("ERROR")
    OUT_DIR.mkdir(parents=True, exist_ok=True)

    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t_construct = time.perf_counter() - t0
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        (OUT_DIR / f"{name}_{suffix}.txt").write_text(text)
        n_exchange = len(re.findall(r"\bExchange\b", text))
        joins = sorted(set(re.findall(r"(\w*Join\w*)", text)))
        py = sorted(set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", text)))
        aggs = sorted(set(re.findall(r"\b(HashAggregate|ObjectHashAggregate|SortAggregate)\b", text)))
        print(
            f"{name}: construct={t_construct:.3f}s exchanges={n_exchange} "
            f"joins={joins} agg={aggs} python={py}"
        )


if __name__ == "__main__":
    main()
