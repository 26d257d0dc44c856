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


def test_components_output_schema_has_no_internal_columns(spark):
    """The r19 convergence-count optimization carries a `_prev` label
    through the per-round checkpoint; it must never leak into the
    operator's output schema."""
    docs = _docs_df(spark, 4)
    pairs = _pairs_df(spark, [(0, 1)])
    out = corpus.duplicate_components(docs, pairs)
    assert out.columns == ["doc_id", "component", "component_size", "is_canonical"]


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


# ---------------------------------------------------------------------------
# Round-3: mixture sampling + cross-document duplication scoring
# ---------------------------------------------------------------------------


def _src_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_mixture_sample_full_rate_source_keeps_all(spark):
    """cut=256 covers every bucket (0..255) → src0 docs all survive."""
    docs = _src_docs(spark, [(i, "t", "src0") for i in range(100)])
    assert corpus.mixture_sample(docs).count() == 100


def test_mixture_sample_unknown_source_dropped(spark):
    docs = _src_docs(spark, [(i, "t", "mystery_feed") for i in range(100)])
    assert corpus.mixture_sample(docs).count() == 0


def test_mixture_sample_rate_ordering_and_determinism(spark):
    """Higher cut ⇒ superset of kept docs (same hash space); reruns
    identical; membership is a pure function of (doc_id, source)."""
    n = 2000
    low = corpus.mixture_sample(
        _src_docs(spark, [(i, "t", "src16") for i in range(n)])  # cut 16
    )
    mid = corpus.mixture_sample(
        _src_docs(spark, [(i, "t", "src10") for i in range(n)])  # cut 64
    )
    kept_low = {r["doc_id"] for r in low.collect()}
    kept_mid = {r["doc_id"] for r in mid.collect()}
    assert kept_low <= kept_mid
    assert 0 < len(kept_low) < len(kept_mid) < n
    # ~16/256 and ~64/256 keep rates, loose 2x bounds
    assert n * 16 / 256 / 2 < len(kept_low) < n * 16 / 256 * 2
    again = {r["doc_id"] for r in corpus.mixture_sample(
        _src_docs(spark, [(i, "t", "src16") for i in range(n)])).collect()}
    assert again == kept_low


def test_cross_dup_fraction_copies_vs_unique(spark):
    """Two identical docs share every shingle (frac 1.0); a disjoint
    doc shares none (0.0); a too-short doc has zero shingles."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "zeta eta theta iota kappa"),
            (4, "hi"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in corpus.cross_dup_fraction(docs).collect()}
    assert got[1]["shared_frac"] == 1.0 and got[1]["n_shingles"] == 3
    assert got[2]["shared_frac"] == 1.0
    assert got[3]["shared_frac"] == 0.0 and got[3]["n_shared"] == 0
    assert got[4]["n_shingles"] == 0 and got[4]["shared_frac"] == 0.0


def test_cross_dup_fraction_partial_overlap(spark):
    """Doc sharing exactly one of its shingles with another doc."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # shingles: 'a b c', 'b c d'
            (2, "x b c d"),        # shingles: 'x b c', 'b c d'
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["shared_frac"] for r in corpus.cross_dup_fraction(docs).collect()}
    assert got[1] == 0.5 and got[2] == 0.5


def test_unigram_rarity_exact_counts(spark):
    """'the' appears 4× corpus-wide, 'rare' once — per-doc mean term
    frequency is an exact integer ratio."""
    docs = spark.createDataFrame(
        [(1, "the the cat"), (2, "the the rare")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in corpus.unigram_rarity(docs).collect()}
    # doc1: tokens the(4) the(4) cat(1) → sum 9, mean 3.0
    assert got[1]["n_tokens"] == 3 and got[1]["sum_tf"] == 9 and got[1]["mean_tf"] == 3.0
    # doc2: the(4) the(4) rare(1) → sum 9
    assert got[2]["sum_tf"] == 9


def test_stratified_sample_quota_and_stability(spark):
    docs = spark.createDataFrame(
        [(i, "t", "en" if i % 2 else "de", f"src{i % 3}") for i in range(120)],
        "doc_id long, text string, lang string, source string",
    )
    got = corpus.stratified_sample(docs, cap=4).collect()
    from collections import Counter

    per = Counter((r["lang"], r["source"]) for r in got)
    assert all(v == 4 for v in per.values()) and len(per) == 6
    # growth stability: the winners at cap=2 are a prefix of cap=4's
    top2 = {(r["lang"], r["source"], r["doc_id"]) for r in corpus.stratified_sample(docs, cap=2).collect()}
    top4 = {(r["lang"], r["source"], r["doc_id"]) for r in got if r["rk"] <= 2}
    assert top2 == top4


def test_source_overlap_jaccard_on_known_sets(spark):
    """Two sources sharing exactly one of three total shingles →
    Jaccard 1/3; disjoint sources never appear in the matrix."""
    docs = spark.createDataFrame(
        [
            (1, "a b c x", "en", "s1"),   # shingles: "a b c", "b c x"
            (2, "a b c y", "en", "s2"),   # shingles: "a b c", "b c y"
            (3, "p q r s", "en", "s3"),   # disjoint
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = {(r["source_a"], r["source_b"]): r for r in corpus.source_overlap(docs).collect()}
    assert set(rows) == {("s1", "s2")}
    r = rows[("s1", "s2")]
    assert r["n_common"] == 1
    assert abs(r["jaccard"] - 1 / 3) < 1e-12


def test_zipf_slope_exact_powerlaw(spark):
    """A corpus built to follow freq(rank) = 8/rank exactly at ranks
    1,2,4,8 fits slope −1."""
    words = ["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"] * 1
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    r = corpus.zipf_slope(docs).collect()[0]
    assert r["n_vocab"] == 4
    assert r["total_tokens"] == 15
    # ranks 1,2,3,4 with freqs 8,4,2,1 is not exactly 1/rank at rank 3
    # (freq 2 vs 8/3) — the OLS slope over (ln r, ln f) for this
    # geometric sequence is still strictly negative and close to -1.5.
    assert r["zipf_slope"] < -1.0


def test_hot_keys_share_and_rank(spark):
    from mysql_cdc_spark.operators import aggregates

    rows = spark.createDataFrame(
        [("d", "t", 1, 6.0, "update"), ("d", "t", 1, 7.0, "update"),
         ("d", "t", 1, 8.0, "update"), ("d", "t", 2, 9.0, "insert")],
        "db string, tbl string, id long, value double, _delta_type string",
    )
    got = {r["id"]: r for r in aggregates.hot_keys(rows).collect()}
    assert got[1]["rank"] == 1 and got[1]["n_changes"] == 3
    assert abs(got[1]["share"] - 0.75) < 1e-12
    assert got[2]["rank"] == 2 and abs(got[2]["share"] - 0.25) < 1e-12


class TestDistributionDrift:
    """PSI drift monitor (profiling.distribution_drift)."""

    def test_identical_halves_score_near_zero_and_shift_scores_high(self, spark):
        import datetime as dt

        from mysql_cdc_spark.operators import profiling

        base = dt.datetime(2024, 1, 1)
        rows = []
        # 'stable': same value pattern both halves -> PSI ~ 0
        # 'shifted': low values first half, high values second -> PSI >> 0
        for i in range(200):
            ts = base + dt.timedelta(hours=i)
            rows.append((i, ts, 1, "stable", float(i % 100), "{}"))
            rows.append((1000 + i, ts, 1, "shifted",
                         25.0 if i < 100 else 425.0, "{}"))
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        got = {r["event_type"]: r for r in profiling.distribution_drift(df).collect()}
        assert got["stable"]["n1"] == got["stable"]["n2"] == 100
        assert abs(got["stable"]["psi"]) < 0.05
        assert got["shifted"]["psi"] > 1.0      # total bucket swap


class TestIncrementalComponents:
    """Condensed-graph incremental CC (corpus.incremental_components)."""

    def test_delta_edge_merges_two_base_components(self, spark):
        from mysql_cdc_spark.operators import corpus as C

        t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        t2 = "one two three four five six seven eight nine ten eleven"
        rows = [
            (1, t1, "en", "s", 1), (2, t1, "en", "s", 1),          # base comp {1,2}
            (3, t2, "en", "s", 1), (4, t2, "en", "s", 1),          # base comp {3,4}
            (5, "totally unrelated words appear in this document", "en", "s", 1),
            # delta doc 10 is a near-dup of BOTH base components' text?
            # no — it matches t1 only; 20 matches t2; 30 matches nothing
            (10, t1 + " tail", "en", "s", 1),
            (20, t2, "en", "s", 1),
            (30, "nothing shared here with anything else at all", "en", "s", 1),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        base = docs.filter("doc_id < 10")
        delta = docs.filter("doc_id >= 10")
        inc = {r["doc_id"]: r for r in C.incremental_components(base, delta).collect()}
        full = {r["doc_id"]: r for r in C.duplicate_components(docs).collect()}
        assert {k: (v["component"], v["component_size"], v["is_canonical"])
                for k, v in inc.items()} == \
               {k: (v["component"], v["component_size"], v["is_canonical"])
                for k, v in full.items()}
        assert inc[10]["component"] == 1        # delta joins base comp 1
        assert inc[20]["component"] == 3
        assert inc[30]["component"] == 30 and inc[30]["component_size"] == 1
        assert inc[5]["component_size"] == 1    # untouched base singleton

        # Persisted-base path: supplying precomputed labels (the
        # production shape — read back from the previous run's output)
        # must produce the identical labeling without any base pair
        # generation in-job.
        base_labels = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)],
            "doc_id long, component long",
        )
        persisted = {
            r["doc_id"]: r
            for r in C.incremental_components(
                base, delta, base_labels=base_labels
            ).collect()
        }
        assert {k: (v["component"], v["component_size"], v["is_canonical"])
                for k, v in persisted.items()} == \
               {k: (v["component"], v["component_size"], v["is_canonical"])
                for k, v in inc.items()}


class TestCorpusDiff:
    def test_statuses_and_chars(self, spark):
        from mysql_cdc_spark.operators import corpus as C

        old = spark.createDataFrame(
            [(1, "same text", 9), (2, "will change", 11), (3, "goes away", 9)],
            "doc_id long, text string, n_chars long",
        )
        new = spark.createDataFrame(
            [(1, "Same  Text".lower().replace("  ", " "), 9),
             (2, "changed now", 11), (4, "brand new", 9)],
            "doc_id long, text string, n_chars long",
        )
        got = {r["doc_id"]: r for r in C.corpus_diff(old, new).collect()}
        assert got[1]["status"] == "unchanged"     # hash on normalized text
        assert got[2]["status"] == "changed"
        assert got[3]["status"] == "removed" and got[3]["new_chars"] is None
        assert got[4]["status"] == "added" and got[4]["old_chars"] is None
        assert got[2]["old_chars"] == 11 and got[2]["new_chars"] == 11


def test_components_long_path_converges_via_pointer_jumping(spark):
    """A 200-node path has diameter 199: plain min-propagation would
    blow the 25-round cap, pointer jumping must land it in O(log n)
    rounds.  (This is the adversarial dup-chain shape — A~B~C~...
    where consecutive docs are near-dups but the ends share nothing.)"""
    docs = _docs_df(spark, 200)
    pairs = _pairs_df(spark, [(i, i + 1) for i in range(199)])
    got = {r["doc_id"]: (r["component"], r["component_size"])
           for r in corpus.duplicate_components(docs, pairs).collect()}
    assert all(got[i] == (0, 200) for i in range(200))


def test_truncate_docs_cap_and_flag(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))),
         (2, "short doc"),
         (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in corpus.truncate_docs(docs, max_tokens=4).collect()}
    assert got[1]["was_truncated"] and got[1]["kept_tokens"] == 4
    assert got[1]["text"] == "w0 w1 w2 w3" and got[1]["n_tokens"] == 10
    assert not got[2]["was_truncated"] and got[2]["text"] == "short doc"
    assert got[3]["n_tokens"] == 1          # split("") -> one empty token


def test_cc_round_stats_do_not_compound(spark):
    """r12 x100-sweep finding: localCheckpoint inherits the origin
    plan's computed sizeInBytes, and the CC round's pointer-jump
    SELF-join squares it — digit count doubles per round until
    Catalyst spends minutes multiplying million-digit BigIntegers
    (driver-side, zero tasks).  _reset_inherited_stats pins the leaf
    back to default stats; this asserts both halves: uncapped growth
    is real, and the reset holds it flat."""
    from pyspark.sql import functions as F

    from mysql_cdc_spark.operators.corpus import _reset_inherited_stats

    def digits(df):
        return len(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))

    def round_once(lab):
        parent = lab.select(F.col("doc_id").alias("p_id"), F.col("component").alias("p_comp"))
        return (
            lab.join(parent, lab.component == parent.p_id, "left")
            .select("doc_id", F.coalesce("p_comp", "component").alias("component"))
            .localCheckpoint(eager=True)
        )

    base = spark.range(100).select(
        F.col("id").alias("doc_id"), F.col("id").alias("component")
    ).localCheckpoint(eager=True)

    lab = base
    for _ in range(5):
        lab = round_once(lab)
    assert digits(lab) > 60          # inherited stats square per round

    lab = base
    for _ in range(5):
        lab = _reset_inherited_stats(round_once(lab))
    assert digits(lab) <= 20         # pinned at the default estimate
    # and the reset is value-neutral
    assert sorted(r["doc_id"] for r in lab.collect()) == list(range(100))


def test_pointer_jump_closure_sql_equals_recursive_closure():
    """The unrolled pointer-jumping oracle (queries/llm.py
    _pointer_jump_closure_sql — r13, replacing the Σ size² recursive
    reachability that cost the gate 630 s at sf0.1) must equal the
    recursive closure on adversarial graph shapes: a LONG PATH (the
    case plain propagation needs diameter rounds for and jumping must
    shortcut), a star, two merged clusters, and isolated nodes.
    Pure DuckDB — no Spark, no fixture."""
    import duckdb

    from mysql_cdc_spark.queries.llm import _pointer_jump_closure_sql

    # path 0-1-...-29 (diameter 29 > naive 25 rounds w/o jumping),
    # star 100-{101..110}, triangle-ish merge 200-201, 201-202, 200-202,
    # isolated 300, 301
    pairs = [(i, i + 1) for i in range(29)]
    pairs += [(100, x) for x in range(101, 111)]
    pairs += [(200, 201), (201, 202), (200, 202)]
    nodes = sorted({n for p in pairs for n in p} | {300, 301})
    con = duckdb.connect()
    con.execute("CREATE TABLE nodes(id BIGINT)")
    con.executemany("INSERT INTO nodes VALUES (?)", [(n,) for n in nodes])
    con.execute("CREATE TABLE pairs(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO pairs VALUES (?, ?)", pairs)

    closure = _pointer_jump_closure_sql("SELECT id AS vec, id AS lab FROM nodes")
    got = con.execute(
        "WITH edges AS MATERIALIZED (SELECT a AS src, b AS dst FROM pairs "
        "UNION ALL SELECT b, a FROM pairs), "
        + closure
        + " SELECT vec, component FROM comp ORDER BY vec"
    ).fetchall()
    want = con.execute(
        "WITH RECURSIVE edges AS (SELECT a AS src, b AS dst FROM pairs "
        "UNION ALL SELECT b, a FROM pairs), "
        "reach AS (SELECT id AS vec, id AS other FROM nodes "
        "UNION SELECT r.vec, e.dst FROM reach r JOIN edges e ON e.src = r.other) "
        "SELECT vec, MIN(other) FROM reach GROUP BY vec ORDER BY vec"
    ).fetchall()
    assert got == want
    # and the path really collapsed to one component rooted at 0
    comp = dict(got)
    assert all(comp[i] == 0 for i in range(30))
    assert comp[300] == 300 and comp[301] == 301
