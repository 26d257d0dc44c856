"""r20 plan-construction memo (queries/_registry.py MEMO_SAFE): the
memo must hand back the SAME DataFrame object for an unchanged
(session, sf_dir, fixture) triple, drop it the moment a fixture file's
mtime moves, and only ever cover queries whose construction is pure
Catalyst (no cache/persist materialization in the plan)."""

from __future__ import annotations

import io
import os
import shutil
from contextlib import redirect_stdout

from mysql_cdc_spark.queries import QUERIES
from mysql_cdc_spark.queries._registry import MEMO_SAFE, clear_plan_memo


def test_memo_hits_and_drops_on_fixture_mtime(spark, sf_dir, tmp_path):
    clear_plan_memo()
    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "events.parquet")
    fn = QUERIES["cdc_select_all"]

    df1 = fn(spark, str(d))
    df2 = fn(spark, str(d))
    assert df1 is df2, "same fixture bytes must hit the memo"

    # a different sf_dir is a different key
    assert fn(spark, sf_dir) is not df1

    # touching the fixture must DROP the memo (the stat token carries
    # mtime_ns)
    st = os.stat(d / "events.parquet")
    os.utime(d / "events.parquet", ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    df3 = fn(spark, str(d))
    assert df3 is not df1, "fixture mtime change must invalidate the memo"
    clear_plan_memo()


def test_non_memo_queries_rebuild_every_call(spark, sf_dir):
    fn = QUERIES["llm_dedup_minhash"]  # cache()-bearing: excluded
    assert "llm_dedup_minhash" not in MEMO_SAFE
    assert fn(spark, sf_dir) is not fn(spark, sf_dir)


def test_memo_safe_plans_carry_no_materialization(spark, sf_dir):
    """The opt-in list's audit, pinned: a MEMO_SAFE query's plan must
    contain no InMemoryRelation (cache/persist) — reusing a cached
    plan across reps would cross from plan memoization into result
    caching."""
    clear_plan_memo()
    # Other tests legitimately cache shared subtrees (e.g. the events
    # scan); the CacheManager substitutes those into ANY later plan,
    # memoized or not, which is orthogonal to this audit (the memo is
    # no worse than a fresh construction there).  Clear the session
    # cache so the audit sees only what the query ITSELF constructs;
    # dropped caches re-materialize on demand, so no other test's
    # correctness depends on them.
    spark.catalog.clearCache()
    for name in sorted(MEMO_SAFE):
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        assert "InMemoryRelation" not in buf.getvalue(), name
    clear_plan_memo()
