"""Edge-case tests for the text-analysis functions (shapes the fixture
corpus cannot reach: tiny docs, padded whitespace, short-token guards)."""

from __future__ import annotations

import pytest

from mysql_cdc_spark.functions import text as T


@pytest.fixture()
def tiny(spark):
    rows = [
        (0, "  One  two  ", "en", "s", 12),     # padded + multi-space
        (1, "solo", "en", "s", 4),              # single token (< trigram)
        (2, "a b", "en", "s", 3),               # two tokens (< trigram)
        (3, "the quick brown the quick brown fox", "en", "s", 35),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_tokenization_contract_trims_and_splits(tiny):
    toks = {r["doc_id"]: r["tokens"] for r in T.with_tokens(tiny).collect()}
    assert toks[0] == ["one", "two"]          # trim + lower + \s+ split
    assert toks[1] == ["solo"]


def test_doc_stats_on_tiny_docs(tiny):
    stats = {r["doc_id"]: r for r in T.doc_stats(tiny).collect()}
    assert stats[1]["n_tokens"] == 1
    assert stats[1]["avg_token_len"] == 4.0
    assert stats[3]["n_distinct_tokens"] == 4  # the/quick/brown/fox
    assert stats[3]["type_token_ratio"] == 4 / 7


def test_top_ngrams_short_doc_guard(tiny):
    """Docs with < n tokens yield NO n-grams (Spark's sequence() would
    silently DESCEND without the guard)."""
    grams = {r["ngram"]: r["n"] for r in T.top_ngrams(tiny, n=3, k=10).collect()}
    assert "the quick brown" in grams and grams["the quick brown"] == 2
    assert not any("solo" in g for g in grams)
    assert not any(g.startswith("a b") for g in grams)


def test_fingerprints_shorter_than_shingle(tiny):
    fps = {r["doc_id"]: r for r in T.fingerprints(tiny).collect()}
    for d in (0, 1, 2, 3):   # every doc gets 4 well-formed slices
        for s in range(4):
            v = fps[d][f"fp{s}"]
            assert isinstance(v, str) and len(v) == 8


def test_lang_id_deterministic_tiebreak(tiny):
    got = {r["doc_id"]: r["pred_lang"] for r in T.lang_id(tiny).collect()}
    assert got[1] == "en"    # zero hits everywhere → cascade picks en


def test_pii_scan_counts_and_redaction(spark):
    from mysql_cdc_spark.functions.pii import pii_scan

    docs = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d+x@e.org, ip 10.0.0.1, call +44 123 4567"),
            (2, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (2, 1, 1)
    assert got[1]["redacted_text"] == "mail <EMAIL> and <EMAIL>, ip <IP>, call <PHONE>"
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) == (0, 0, 0)
    assert got[2]["redacted_text"] == "clean text with no pii at all"


def test_contamination_requires_min_shared(spark):
    from pyspark.sql import functions as F

    from mysql_cdc_spark.operators.contamination import benchmark_contamination

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),          # benchmark
            (1, "alpha beta gamma delta zeta"),             # shares 2 shingles
            (2, "alpha beta gamma other words here"),       # shares 1 shingle
            (3, "completely different text entirely now"),  # shares 0
        ],
        "doc_id long, text string",
    )
    got = benchmark_contamination(docs, F.col("doc_id") == 0).collect()
    assert [(r["train_doc_id"], r["bench_doc_id"], r["n_shared"]) for r in got] == [(1, 0, 2)]


def test_repetition_stats_degenerate_loop(spark):
    """'a b c' ×3 → 7 overlapping 3-grams, 3 distinct → dup 4/7."""
    from mysql_cdc_spark.functions.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),
            (2, "all words here are quite distinct tokens"),
            (3, "tiny doc"),          # < 3 tokens → no grams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["n_grams"] == 7 and got[1]["n_distinct"] == 3
    assert abs(got[1]["dup_frac"] - 4.0 / 7.0) < 1e-12
    assert got[2]["dup_frac"] == 0.0
    assert got[3]["n_grams"] == 0 and got[3]["dup_frac"] == 0.0


def test_quality_classifier_exact_logit(spark):
    """Logit equals the Python re-computation of the same md5 hash
    chain; identical docs get identical logits."""
    import hashlib

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma")],
        "doc_id long, text string",
    )
    from mysql_cdc_spark.functions.text import (
        CLASSIFIER_DIM,
        CLASSIFIER_WEIGHT_MOD,
        quality_classifier,
    )

    def weight(tok):
        b = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % CLASSIFIER_DIM
        wh = hashlib.md5(f"w:{b}".encode()).hexdigest()
        return int(wh[:4], 16) % CLASSIFIER_WEIGHT_MOD - 1000

    got = {r["doc_id"]: r for r in quality_classifier(docs).collect()}
    assert got[1]["logit"] == weight("alpha") + weight("beta")
    assert got[1]["logit"] == got[2]["logit"]
    assert got[3]["logit"] == weight("gamma")
    assert got[3]["keep"] == (got[3]["logit"] >= 0)


def test_bigram_lm_conditional_probabilities(spark):
    from mysql_cdc_spark.functions.text import bigram_lm

    docs = spark.createDataFrame(
        [(i, "to be or not to be") for i in range(5)],
        "doc_id long, text string",
    )
    got = {(r["w1"], r["w2"]): r for r in bigram_lm(docs, min_count=5).collect()}
    # 'to' continues to 'be' 10x (2 per doc); c1('to') = 10
    assert got[("to", "be")]["c"] == 10 and got[("to", "be")]["c1"] == 10
    assert got[("to", "be")]["cond_p"] == 1.0
    # 'be' continues only to 'or' (5x); the doc-final 'be' has no
    # continuation so c1('be') = 5
    assert got[("be", "or")]["c"] == 5 and got[("be", "or")]["c1"] == 5
    assert got[("or", "not")]["cond_p"] == 1.0 and got[("not", "to")]["c"] == 5


class TestLmPerplexity:
    """CCNet-style bigram-LM perplexity filter (text.lm_perplexity)."""

    def test_in_domain_scores_below_ood(self, spark):
        from mysql_cdc_spark.functions import text as T

        ref_text = "the cat sat on the mat and the dog sat on the rug"
        rows = [
            (0, ref_text, "en", "s", len(ref_text)),
            (1, "the cat sat on the rug", "en", "s", 22),   # in-domain
            (2, "zq xv qqq zzz unseen tokens", "de", "s", 27),  # OOD
            (3, "one", "en", "s", 3),                       # < 2 tokens
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        got = {r["doc_id"]: r for r in T.lm_perplexity(
            docs, docs.filter("lang = 'en'")
        ).collect()}
        assert got[3]["n_bigrams"] == 0
        assert got[3]["ppl"] is None and got[3]["bucket"] == "unscored"
        assert got[1]["ppl"] < got[2]["ppl"]   # in-domain beats OOD
        assert got[0]["ppl"] < got[2]["ppl"]
        for r in got.values():
            assert r["bucket"] in ("head", "middle", "tail", "unscored")

    def test_unseen_bigram_gets_uniform_floor(self, spark):
        from mysql_cdc_spark.functions import text as T
        import math

        # reference corpus: 4 distinct tokens => V=4; delta doc is one
        # unseen bigram of unseen words => p = 1/V exactly.
        rows = [
            (0, "a b c d", "en", "s", 7),
            (1, "zz yy", "en", "s", 5),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        got = {r["doc_id"]: r for r in T.lm_perplexity(
            docs, docs.filter("doc_id = 0")
        ).collect()}
        assert got[1]["n_bigrams"] == 1
        assert abs(got[1]["sum_logp"] - round(math.log(1 / 4), 6)) < 1e-9
        assert abs(got[1]["ppl"] - 4.0) < 1e-3


def test_classifier_weight_spark_matches_sql_form(spark):
    """The r19 conv + folded-weight-table form must be value-identical
    to the engine-neutral instr-chain definition for arbitrary tokens
    (incl. leading-zero and all-f md5 edges via a broad sample)."""
    toks = [f"tok{i}" for i in range(500)] + ["", "a", "ZZZZ", "w:7", "0"]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    both = df.selectExpr(
        f"CAST({T.classifier_weight_sql('t')} AS BIGINT) AS w_sql",
        f"CAST({T.classifier_weight_spark('t')} AS BIGINT) AS w_spark",
    ).collect()
    assert all(r["w_sql"] == r["w_spark"] for r in both)


def test_classifier_weights_table_matches_sql_derivation(spark):
    """The Python-evaluated weight table equals the SQL md5 derivation
    for every bucket id."""
    w = T.classifier_weights()
    assert len(w) == T.CLASSIFIER_DIM
    wh = "md5(concat('w:', cast(id as string)))"
    df = spark.range(T.CLASSIFIER_DIM).selectExpr(
        "id",
        f"CAST({T.hex_int_sql(wh, 1, 4)} "
        f"% {T.CLASSIFIER_WEIGHT_MOD} - 1000 AS BIGINT) AS w_sql",
    ).collect()
    assert all(w[r["id"]] == r["w_sql"] for r in df)
