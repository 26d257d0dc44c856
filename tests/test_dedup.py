"""Dedup operator tests on hand-built corpora with planted duplicates."""

from __future__ import annotations

import pytest

from mysql_cdc_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees today"
)
NEAR = BASE.replace("lazy dog", "lazy wolf")  # one-word edit → high jaccard
OTHER = (
    "completely different content about databases query engines shuffle "
    "partitions and adaptive execution plans running on large clusters"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE, "en", "s0", len(BASE)),
        (1, BASE.upper(), "en", "s1", len(BASE)),   # exact dup after normalize
        (2, NEAR, "en", "s2", len(NEAR)),           # near dup of 0
        (3, OTHER, "en", "s3", len(OTHER)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_exact_dedup_groups_normalized_copies(docs):
    got = {r["doc_id"]: (r["keep_doc_id"], r["is_canonical"], r["n_copies"])
           for r in dedup.exact_dedup(docs).collect()}
    assert got[0] == (0, True, 2)
    assert got[1] == (0, False, 2)
    assert got[2][1] and got[3][1]  # unique docs are their own canonical


def test_minhash_lsh_finds_planted_near_dup(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0   # exact dup
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.7    # near dup
    assert not any(3 in p for p in pairs)             # unrelated doc never paired


def test_jaccard_pairs_exact_counts(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r for r in dedup.jaccard_pairs(docs).collect()}
    assert pairs[(0, 1)]["jaccard"] == 1.0
    r = pairs[(0, 2)]
    # one-word edit in the middle breaks exactly 3 word-trigrams
    assert r["common"] == r["n_a"] - 3
    assert not any(3 in p for p in pairs)


def test_simhash_properties(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}
    assert all(len(s) == 64 and set(s) <= {"0", "1"} for s in sigs.values())
    assert sigs[0] == sigs[1]  # normalization-equal docs → identical signature
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))  # noqa: E731
    assert ham(sigs[0], sigs[2]) < ham(sigs[0], sigs[3])


def test_simhash_pairs_catches_dups_only(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.simhash_pairs(docs).collect()}
    assert (0, 1) in pairs
    assert not any(3 in p for p in pairs)


def test_simhash_empty_shingle_convention(spark):
    """Docs with under 3 tokens have an empty shingle set: the majority
    vote sums a seed-only 0, so every bit passes >= 0 and the signature
    is all '1's — a convention the DuckDB oracle mirrors via
    COALESCE(list_sum(...), 0) (advisor finding)."""
    from mysql_cdc_spark.operators.dedup import simhash_signatures

    docs = spark.createDataFrame(
        [(1, "just two"), (2, "three token doc here")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert sigs[1] == "1" * 64
    assert set(sigs[2]) <= {"0", "1"} and sigs[2] != "1" * 64


def test_dup_spans_detects_copied_passage(spark):
    """A 24-token passage pasted into two docs is flagged on both; a
    unique doc and a short doc are not."""
    passage = " ".join(f"p{i}" for i in range(24))
    docs = spark.createDataFrame(
        [
            (1, passage + " unique tail one two three"),
            (2, "different head words here " + passage),
            (3, " ".join(f"u{i}" for i in range(30))),
            (4, "way too short"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dedup.dup_spans(docs).collect()}
    # winnowing guarantee: any shared run >= width + k - 1 = 16 tokens
    # yields a common selected fingerprint, regardless of alignment
    assert got[1]["n_shared"] >= 1 and got[2]["n_shared"] >= 1
    assert got[3]["n_shared"] == 0 and got[3]["n_windows"] > 0
    assert got[4]["n_windows"] == 0 and got[4]["span_frac"] == 0.0


class TestIncrementalNeardup:
    """Delta-vs-base incremental LSH dedup (dedup.incremental_neardup)."""

    def test_delta_matches_base_only(self, spark):
        rows = [
            (0, BASE, "en", "s0", len(BASE)),       # base
            (1, NEAR, "en", "s1", len(NEAR)),       # base near-dup of 0
            (2, OTHER, "en", "s2", len(OTHER)),     # base, unrelated
            (10, BASE, "en", "s3", len(BASE)),      # delta: dup of base 0/1
            (11, OTHER, "en", "s4", len(OTHER)),    # delta: dup of base 2
            (12, "tiny", "en", "s5", 4),            # delta: no shingles
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        base = docs.filter("doc_id < 10")
        delta = docs.filter("doc_id >= 10")
        got = {(r["delta_id"], r["base_id"]): r["jaccard"]
               for r in dedup.incremental_neardup(base, delta).collect()}
        assert got[(10, 0)] == 1.0          # exact dup found in base
        assert (10, 1) in got               # near-dup of the edited base doc
        assert got[(11, 2)] == 1.0
        # never base x base or delta x delta
        assert all(d >= 10 and b < 10 for d, b in got)
        assert (12, 0) not in got

    def test_cap_bounds_matches_per_delta(self, spark):
        rows = [(i, BASE, "en", "s", len(BASE)) for i in range(5)] + [
            (10, BASE, "en", "s", len(BASE))
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        base = docs.filter("doc_id < 10")
        delta = docs.filter("doc_id >= 10")
        full = dedup.incremental_neardup(base, delta).collect()
        assert len(full) == 5               # delta doc hits the whole clique
        capped = dedup.incremental_neardup(
            base, delta, max_matches_per_delta=2
        ).collect()
        assert len(capped) == 2
        # deterministic: ties broken by lowest base_id
        assert sorted(r["base_id"] for r in capped) == [0, 1]


class TestDupSpanRanges:
    """Exact duplicated-span extraction (dedup.dup_span_ranges)."""

    def test_planted_shared_passage_is_extracted(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            (0, f"unique start words here now {shared} tail one two three", "en", "s", 1),
            (1, f"{shared} completely different ending of second doc", "en", "s", 1),
            (2, "no overlap with anything else whatsoever in this doc", "en", "s", 1),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        spans = dedup.dup_span_ranges(docs).collect()
        by_doc = {}
        for r in spans:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 2 has no duplicated grams at all
        assert 2 not in by_doc
        # the 10-token shared passage yields one maximal span per doc
        (s0,) = by_doc[0]
        (s1,) = by_doc[1]
        assert s1["span_start"] == 1 and s1["n_tokens"] == 10
        assert s0["span_start"] == 6 and s0["n_tokens"] == 10
        assert s0["span_end"] == 15

    def test_disjoint_hits_stay_separate_islands(self, spark):
        p1 = "one two three four five six seven eight"
        p2 = "red orange yellow green blue indigo violet ultraviolet"
        filler = " ".join(f"f{i}" for i in range(12))
        rows = [
            (0, f"{p1} {filler} {p2}", "en", "s", 1),
            (1, p1, "en", "s", 1),
            (2, p2, "en", "s", 1),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        spans = [r for r in dedup.dup_span_ranges(docs).collect() if r["doc_id"] == 0]
        assert len(spans) == 2      # two islands, not one merged mega-span
        assert {s["n_tokens"] for s in spans} == {8}


class TestCensorDupSpans:
    """Substring-dedup write-side (dedup.censor_dup_spans)."""

    def test_shared_passage_removed_everywhere_else_intact(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            (0, f"unique start words here now {shared} tail one two three", "en", "s", 1),
            (1, f"{shared} completely different ending of second doc", "en", "s", 1),
            (2, "no overlap with anything else whatsoever in this doc", "en", "s", 1),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        got = {r["doc_id"]: r for r in dedup.censor_dup_spans(docs).collect()}
        assert got[0]["clean_text"] == "unique start words here now tail one two three"
        assert got[0]["n_removed"] == 10
        assert got[1]["clean_text"] == "completely different ending of second doc"
        assert got[2]["n_removed"] == 0
        assert got[2]["clean_text"] == rows[2][1]
        for r in got.values():
            assert r["n_tokens"] - r["n_removed"] == len(r["clean_text"].split()) or (
                r["clean_text"] == "" and r["n_tokens"] == r["n_removed"]
            )


def test_simhash_rewrite_bit_identical_to_lambda_form(spark, sf_dir):
    """r10 rewrite guard: the exploded-aggregation SimHash must equal
    the original transform/aggregate lambda expression bit-for-bit on
    real corpus text (the lambda form stays here as the spec)."""
    from pyspark.sql import functions as F

    from mysql_cdc_spark.operators.dedup import _HEX, with_shingles
    from mysql_cdc_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    hashed = with_shingles(docs).withColumn(
        "thash", F.expr("transform(shingles, t -> md5(t))")
    )
    bit_expr = (
        "array_join(transform(sequence(0, 63), j -> "
        "case when aggregate(thash, 0, (acc, h) -> acc + "
        f"2 * ((shiftright(instr('{_HEX}', substring(h, 1 + (j div 4), 1)) - 1, "
        "3 - (j % 4))) % 2) - 1) >= 0 then '1' else '0' end), '')"
    )
    old = {r["doc_id"]: r["simhash"]
           for r in hashed.select("doc_id", F.expr(bit_expr).alias("simhash")).collect()}
    new = {r["doc_id"]: r["simhash"]
           for r in dedup.simhash_signatures(docs).collect()}
    assert old == new


def test_lsh_index_parquet_round_trip(spark, sf_dir, tmp_path):
    """The persisted-index contract end-to-end: build_lsh_index written
    to parquet by one 'ingest', read back by the next, must probe to
    the identical matches as the in-job index (band hashes, shingle
    arrays, and types all survive the write/read)."""
    from mysql_cdc_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    base = docs.filter("doc_id % 10 != 0")
    delta = docs.filter("doc_id % 10 = 0")

    path = str(tmp_path / "lsh_index.parquet")
    dedup.build_lsh_index(base).write.mode("overwrite").parquet(path)
    persisted = spark.read.parquet(path)

    via_disk = dedup.incremental_neardup(base, delta, base_index=persisted)
    inline = dedup.incremental_neardup(base, delta)
    key = lambda r: (r["delta_id"], r["base_id"], r["common"])
    assert sorted(map(key, via_disk.collect())) == sorted(map(key, inline.collect()))


def test_band_candidates_bounded_on_degenerate_bucket(spark):
    """r11 scale fix: a corpus where a large block of docs is
    near-identical (one hot band bucket — the skew-soak shape that
    generated 1.9B candidates / disk-full on the unbounded band
    self-join) must produce O(n·bands·chain) candidates, and the
    near-dup clique must still collapse into ONE component."""
    from pyspark.sql import functions as F

    from mysql_cdc_spark.operators import corpus, dedup

    n = 300
    base_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"{base_text} tail{i}") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = dedup.minhash_signatures(docs)
    rpb = dedup.MINHASH_K // dedup.LSH_BANDS
    band_rows = sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), dedup._band_key(b, rpb).alias("band_hash"))
            for b in range(dedup.LSH_BANDS)
        ])).alias("bk"),
    ).select("doc_id", "bk.band", "bk.band_hash")
    cand = dedup._chain_candidates(band_rows, ["band", "band_hash"])
    n_cand = cand.count()
    assert n_cand <= n * dedup.LSH_BANDS * dedup.MAX_BAND_CHAIN
    assert n_cand < n * n * 0.25  # nowhere near |bucket|²/2

    pairs = dedup.minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    comp = corpus.duplicate_components(docs.select("doc_id"), pairs)
    assert comp.select("component").distinct().count() == 1


def test_fused_multipass_chain_matches_union_of_passes(spark):
    """r20: the fused multi-pass chain window (one exchange, pass-2
    successors gated by a per-bucket-size CASE) must emit EXACTLY the
    pair set of the r19 union-of-filtered-passes form.  The fixture
    forces both regimes: one bucket far larger than chain+1 (pass 2
    contributes) and several small buckets (pass 2 must contribute
    nothing), with orderings that DISAGREE between the two passes so a
    fused-ordering bug would change the big bucket's pair set."""
    from pyspark.sql import functions as F

    chain = 4
    rows = []
    # big bucket: 20 members (> chain+1), ord0 ascending by doc_id,
    # ord1 grouping evens before odds — the two passes chain genuinely
    # different successor sets (pass 2 pairs doc 0 with docs 6 and 8,
    # which sit beyond pass 1's chain-4 horizon)
    for i in range(20):
        rows.append((i, "b0", i, (i % 2) * 100 + i))
    # small buckets: 3 members each, under chain+1
    for b in range(1, 4):
        for i in range(3):
            rows.append((100 * b + i, f"b{b}", i, i))
    band_rows = spark.createDataFrame(
        rows, "doc_id long, band_hash string, ord0 long, ord1 long"
    ).withColumn("band", F.lit(0))

    passes = [["ord0", "ord1"], ["ord1", "ord0"]]
    fused = dedup._chain_candidates(
        band_rows, ["band", "band_hash"], chain=chain, order_passes=passes
    )

    # reference: the r19 shape — per-pass windows, pass>0 filtered to
    # big buckets BEFORE the window, union, distinct
    ref_rows = band_rows.selectExpr(
        "*", "count(1) OVER (PARTITION BY band, band_hash) AS _bsz"
    )
    per_pass = []
    for p, cols in enumerate(passes):
        src = ref_rows if p == 0 else ref_rows.filter(F.col("_bsz") > chain + 1)
        order = ", ".join([*cols, "doc_id"])
        per_pass.append(
            src.selectExpr(
                "doc_id AS _cur",
                f"collect_list(doc_id) OVER (PARTITION BY band, band_hash "
                f"ORDER BY {order} ROWS BETWEEN 1 FOLLOWING AND {chain} FOLLOWING) AS _succ",
            )
            .selectExpr("_cur", "explode(_succ) AS _nxt")
            .selectExpr("least(_cur, _nxt) AS doc_a", "greatest(_cur, _nxt) AS doc_b")
        )
    ref = per_pass[0].unionByName(per_pass[1]).distinct()

    got = {(r["doc_a"], r["doc_b"]) for r in fused.collect()}
    want = {(r["doc_a"], r["doc_b"]) for r in ref.collect()}
    assert got == want
    # sanity: the big bucket's descending ord1 made pass 2 add pairs
    # pass 1 alone misses
    only_pass1 = {(r["doc_a"], r["doc_b"]) for r in per_pass[0].distinct().collect()}
    assert want - only_pass1, "fixture failed to exercise the pass-2 arm"
