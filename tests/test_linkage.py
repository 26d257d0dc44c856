"""Entity-resolution operator tests (operators/linkage.py)."""

from __future__ import annotations

from mysql_cdc_spark.operators import linkage


def test_planted_twins_all_found_and_nothing_else(spark):
    cust = spark.createDataFrame(
        [(i, f"Customer#{i:09d}", i % 25, "SEG") for i in range(200)],
        "c_custkey long, c_name string, c_nationkey long, c_mktsegment string",
    )
    recs = linkage.synth_records(cust)
    # corpus = 200 clean + 20 dirty twins
    assert recs.count() == 220
    got = linkage.record_matches(recs).collect()
    pairs = {(r["rid_a"], r["rid_b"]): r["lev"] for r in got}
    expected = {(i, i + 10_000_000) for i in range(0, 200, 10)}
    assert set(pairs) == expected            # full recall, zero false positives
    assert all(lev == 1 for lev in pairs.values())


def test_prefix_break_caught_by_suffix_pass(spark):
    # rid 40: twin exists (40 % 10 == 0) and drop position =
    # 40 % 8 + 3 = 3 -> corrupts the 3-char prefix block; only the
    # suffix pass can pair it.
    cust = spark.createDataFrame(
        [(40, "x", 1, "SEG")],
        "c_custkey long, c_name string, c_nationkey long, c_mktsegment string",
    )
    recs = linkage.synth_records(cust).collect()
    clean = next(r for r in recs if r["rid"] == 40)
    dirty = next(r for r in recs if r["rid"] != 40)
    assert clean["name"][:3] != dirty["name"][:3]
    assert clean["name"][-3:] == dirty["name"][-3:]
    got = linkage.record_matches(linkage.synth_records(cust)).collect()
    assert [(r["rid_a"], r["rid_b"]) for r in got] == [(40, 10_000_040)]
