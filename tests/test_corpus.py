"""Corpus-management operator tests: split determinism, length
buckets, and connected-components label propagation on adversarial
graph shapes the fixtures don't produce."""

from __future__ import annotations

import pytest

from mysql_cdc_spark.operators import corpus


def test_split_assign_deterministic_and_complete(spark):
    docs = spark.createDataFrame(
        [(i, "text", "en") for i in range(200)], "doc_id long, text string, lang string"
    )
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in corpus.split_assign(docs).collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"]) for r in corpus.split_assign(docs).collect()}
    assert a == b                                     # rerun-stable
    splits = {s for _, s in a.values()}
    assert splits == {"train", "val", "test"}
    n_train = sum(1 for _, s in a.values() if s == "train")
    assert n_train > 150                              # ~90% of 200


def test_split_stable_under_corpus_growth(spark):
    """A doc's split never changes when new docs arrive (hash-based,
    not positional/random)."""
    small = spark.createDataFrame(
        [(i, "t", "en") for i in range(50)], "doc_id long, text string, lang string"
    )
    big = spark.createDataFrame(
        [(i, "t", "en") for i in range(500)], "doc_id long, text string, lang string"
    )
    s1 = {r["doc_id"]: r["split"] for r in corpus.split_assign(small).collect()}
    s2 = {r["doc_id"]: r["split"] for r in corpus.split_assign(big).collect()}
    assert all(s2[k] == v for k, v in s1.items())


def test_length_buckets_power_of_two(spark):
    docs = spark.createDataFrame(
        [
            (1, "one", "en"),                    # 1 token  → bucket 1
            (2, "a b c", "en"),                  # 3 tokens → bucket 2
            (3, " ".join(["w"] * 16), "en"),     # 16       → bucket 16
            (4, " ".join(["w"] * 17), "en"),     # 17       → bucket 16
            (5, " ".join(["w"] * 5000), "de"),   # beyond   → top bucket
        ],
        "doc_id long, text string, lang string",
    )
    got = {(r["lang"], r["bucket"]): (r["n_docs"], r["total_tokens"])
           for r in corpus.length_buckets(docs).collect()}
    assert got[("en", 1)] == (1, 1)
    assert got[("en", 2)] == (1, 3)
    assert got[("en", 16)] == (2, 33)
    assert got[("de", 4096)] == (1, 5000)


def _docs_df(spark, n):
    return spark.createDataFrame(
        [(i, "t", "en") for i in range(n)], "doc_id long, text string, lang string"
    )


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_components_chain_needs_multiple_rounds(spark):
    """A path graph 0-1-2-...-7 has diameter 7: labels must propagate
    across rounds, not just one hop."""
    docs = _docs_df(spark, 10)
    pairs = _pairs_df(spark, [(i, i + 1) for i in range(7)])
    got = {r["doc_id"]: (r["component"], r["component_size"], r["is_canonical"])
           for r in corpus.duplicate_components(docs, pairs).collect()}
    for i in range(8):
        assert got[i] == (0, 8, i == 0)
    assert got[8] == (8, 1, True)                    # singletons self-label
    assert got[9] == (9, 1, True)


def test_components_two_clusters_and_convergence_guard(spark):
    docs = _docs_df(spark, 6)
    pairs = _pairs_df(spark, [(0, 1), (1, 2), (4, 5)])
    got = {r["doc_id"]: r["component"] for r in corpus.duplicate_components(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}
    with pytest.raises(RuntimeError, match="converge"):
        corpus.duplicate_components(
            _docs_df(spark, 5), _pairs_df(spark, [(i, i + 1) for i in range(4)]), max_iter=1
        )


def test_components_match_union_find_on_random_graphs(spark):
    """Property check: label propagation must agree with a reference
    union-find on arbitrary random graphs (one seeded batch keeps the
    Spark round count manageable)."""
    import random

    rng = random.Random(42)
    for _ in range(3):
        n = rng.randint(5, 30)
        m = rng.randint(0, n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {}
        for i in range(n):
            r = find(i)
            expect[i] = min(j for j in range(n) if find(j) == r)

        docs = _docs_df(spark, n)
        pairs = _pairs_df(spark, [(min(a, b), max(a, b)) for a, b in edges] or [(0, 0)])
        got = {r["doc_id"]: r["component"]
               for r in corpus.duplicate_components(docs, pairs).collect()}
        assert got == expect


def test_pack_sequences_matches_python_reference(spark):
    """Property: distributed packing equals a sequential cumsum over
    doc_id order, for arbitrary token counts (including empty docs)."""
    import random

    rng = random.Random(11)
    texts = []
    for i in range(60):
        n = rng.choice([0, 1, 2, 17, 100, 511, 512, 513])
        texts.append((i, " ".join(["w"] * n) if n else ""))
    docs = spark.createDataFrame(texts, "doc_id long, text string")

    got = {r["doc_id"]: (r["n_tokens"], r["tok_start"], r["seq_start"], r["seq_end"])
           for r in corpus.pack_sequences(docs, capacity=512).collect()}

    # sequential reference (note: split of "" yields one empty token on
    # both engines — the shared tokenization contract)
    acc = 0
    for i, text in texts:
        n = len(text.split(" ")) if text else 1
        seq_start = acc // 512
        seq_end = max(acc + n - 1, acc) // 512
        assert got[i] == (n, acc, seq_start, seq_end), i
        acc += n
