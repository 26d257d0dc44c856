"""Ranked retrieval (operators/retrieval.py): TF-IDF / BM25 semantics
on a tiny hand corpus plus plan-shape assertions (broadcast pruning,
no Python UDFs — the scores are pure JVM expressions)."""

from __future__ import annotations

import math

import pytest

from mysql_cdc_spark.operators import retrieval


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "en", "s", "hash join hash join hash"),
            (2, "en", "s", "vector scan table"),
            (3, "en", "s", "hash table table table"),
        ],
        ["doc_id", "lang", "source", "text"],
    )


def test_tfidf_hand_computed(corpus):
    rows = {
        (r.doc_id, r.term): r
        for r in retrieval.tfidf_top_terms(corpus, k=10).collect()
    }
    # 'hash': doc1 tf=3, df=2, N=3 → 3 * ln(4/3)
    expect = round(3 * math.log(4 / 3), 6)
    assert rows[(1, "hash")].tfidf == pytest.approx(expect, abs=1e-9)
    # 'join' (df=1) outranks 'hash' (df=2) in doc 1 despite lower tf? no:
    # join tf=2 * ln(2) = 1.386 > hash 0.863 — rank 1 is join
    assert rows[(1, "join")].rk == 1
    # df=3 term 'table'... appears in docs 2,3 only → df=2
    assert rows[(3, "table")].tf == 3


def test_bm25_ranks_heavier_docs_first(corpus):
    out = retrieval.bm25_search(
        corpus, queries=[("q", "hash")], k=10
    ).collect()
    got = [(r.qid, r.doc_id, r.rk) for r in out]
    # doc1 (tf=3, shorter) must outrank doc3 (tf=1)
    assert got[0][1] == 1 and got[0][2] == 1
    assert {d for _, d, _ in got} == {1, 3}  # doc2 has no 'hash'
    # scores positive and strictly ordered by rank
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True) and scores[-1] > 0


def test_bm25_sum_is_decimal_exact(corpus):
    """Multi-term query: the score equals the sum of the single-term
    scores rounded at 6dp — the order-independent decimal fold."""
    single_h = {
        r.doc_id: r.score
        for r in retrieval.bm25_search(corpus, queries=[("q", "hash")]).collect()
    }
    single_t = {
        r.doc_id: r.score
        for r in retrieval.bm25_search(corpus, queries=[("q", "table")]).collect()
    }
    both = {
        r.doc_id: r.score
        for r in retrieval.bm25_search(
            corpus, queries=[("q", "hash"), ("q", "table")]
        ).collect()
    }
    for d, s in both.items():
        expect = single_h.get(d, 0.0) + single_t.get(d, 0.0)
        assert s == pytest.approx(expect, abs=1e-9)


def test_retrieval_plans_jvm_side(corpus):
    """No Python UDF in either plan; BM25 prunes tokens via a
    broadcast join before aggregation."""
    tf_plan = retrieval.tfidf_top_terms(corpus)._jdf.queryExecution().executedPlan().toString()
    bm_plan = retrieval.bm25_search(corpus)._jdf.queryExecution().executedPlan().toString()
    for plan in (tf_plan, bm_plan):
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in bm_plan
