"""Round-6 operators: πps weighted sampling, shard planning,
single-pass profiling, trailing-window z-score anomalies."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mysql_cdc_spark.operators import corpus, profiling, timeseries


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )


def test_weighted_sample_inclusion_exact(spark):
    """Keep decision is bucket < min(M, rate*w) exactly, and the HT
    weight is the inverse inclusion probability."""
    docs = _docs(spark, [(i, "src0", 100 + i) for i in range(300)])
    kept = corpus.weighted_sample(docs).collect()
    assert 0 < len(kept) < 300
    for r in kept:
        cut = min(corpus.PPS_M, corpus.PPS_RATE_NUM * max(1, r["n_chars"]))
        assert r["bucket"] < cut
        assert r["cut"] == cut
        assert math.isclose(r["ht_weight"], corpus.PPS_M / cut, rel_tol=0, abs_tol=0)


def test_weighted_sample_prefers_long_docs(spark):
    """Inclusion rate of long docs must exceed short docs (that's the
    πps point)."""
    short = _docs(spark, [(i, "s", 50) for i in range(2000)])
    long_ = _docs(spark, [(i, "s", 800) for i in range(2000)])
    n_short = corpus.weighted_sample(short).count()
    n_long = corpus.weighted_sample(long_).count()
    assert n_long > n_short * 3


def test_weighted_sample_caps_at_certainty(spark):
    """Very long docs hit p=1: always kept, ht_weight exactly 1."""
    docs = _docs(spark, [(i, "s", 10_000_000) for i in range(50)])
    kept = corpus.weighted_sample(docs).collect()
    assert len(kept) == 50
    assert all(r["ht_weight"] == 1.0 for r in kept)


def test_weighted_sample_membership_stable_under_growth(spark):
    small = _docs(spark, [(i, "s", 300) for i in range(100)])
    big = _docs(spark, [(i, "s", 300) for i in range(1000)])
    k1 = {r["doc_id"] for r in corpus.weighted_sample(small).collect()}
    k2 = {r["doc_id"] for r in corpus.weighted_sample(big).collect()}
    assert k1 == {d for d in k2 if d < 100}


def test_shard_plan_partitions_all_docs_in_order(spark):
    docs = spark.createDataFrame(
        [(i, 1000) for i in range(100)], "doc_id long, n_chars long"
    )
    plan = sorted(
        corpus.shard_plan(docs, target_chars=8192).collect(),
        key=lambda r: r["shard_id"],
    )
    # 100 docs * 1000 chars / 8192 → shards of 9,8,8,... docs
    assert sum(r["n_docs"] for r in plan) == 100
    assert plan[0]["first_doc"] == 0 and plan[-1]["last_doc"] == 99
    # contiguous, non-overlapping doc ranges in shard order
    for a, b in zip(plan, plan[1:]):
        assert a["last_doc"] + 1 == b["first_doc"]
    # docs are assigned by char_start div target, so every shard holds
    # floor/ceil(target/1000) docs except the remainder tail
    assert all(r["n_docs"] in (8, 9) for r in plan[:-1])
    assert 1 <= plan[-1]["n_docs"] <= 9


def test_shard_plan_empty_docs_do_not_advance(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 0), (4, 10)], "doc_id long, n_chars long"
    )
    plan = corpus.shard_plan(docs, target_chars=100).collect()
    assert len(plan) == 1 and plan[0]["n_docs"] == 4


def test_profile_events_matches_manual(spark):
    ev = spark.createDataFrame(
        [
            (1, "2026-01-01 00:00:00", 10, "click", 1.5, '{"a":1}'),
            (2, "2026-01-01 00:00:01", 10, "view", 2.5, None),
            (3, "2026-01-01 00:00:02", 11, "click", None, '{"b":2}'),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    prof = {r["col_name"]: r for r in profiling.profile_events(ev).collect()}
    assert set(prof) == {c for c, _ in profiling.PROFILE_COLS}
    assert prof["value"]["n_null"] == 1
    assert prof["value"]["n_distinct"] == 2
    assert prof["value"]["min_val"] == "1.500000"  # decimal-padded form
    assert prof["props"]["n_null"] == 1
    assert prof["event_type"]["n_distinct"] == 2
    assert prof["user_id"]["min_val"] == "10" and prof["user_id"]["max_val"] == "11"
    assert all(r["n_rows"] == 3 for r in prof.values())


def test_profile_single_scan(spark):
    """The whole profile is ONE aggregate over one scan (Expand-based
    multi-distinct), not one job per column."""
    ev = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", 1, "t", 1.0, "p")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = profiling.profile_events(ev)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1  # the one scan


def test_zscore_flags_planted_outlier(spark):
    # mildly varying baseline (constant history has zero variance and
    # is correctly unscoreable)
    rows = [(i, 1, 10.0 + (i % 5) * 0.1) for i in range(60)]
    rows[55] = (55, 1, 500.0)  # the spike
    ev = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    hits = timeseries.zscore_anomaly(ev).collect()
    assert [r["event_id"] for r in hits] == [55]
    assert hits[0]["n_hist"] >= timeseries.ZSCORE_MIN_N


def test_zscore_constant_history_never_divides_by_zero(spark):
    ev = spark.createDataFrame(
        [(i, 1, 7.0) for i in range(40)], "event_id long, user_id long, value double"
    )
    assert timeseries.zscore_anomaly(ev).count() == 0


def test_zscore_requires_min_history(spark):
    """First events of a key are never scored (cold-start guard)."""
    rows = [(i, 1, 10.0 if i else 9999.0) for i in range(10)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    assert timeseries.zscore_anomaly(ev).count() == 0


def test_zscore_excludes_self_from_baseline(spark):
    """The spike does not inflate its own baseline (exclusive frame):
    two consecutive spikes are BOTH flagged."""
    rows = [(i, 1, 10.0 + (i % 5) * 0.1) for i in range(60)]
    rows[50] = (50, 1, 400.0)
    rows[51] = (51, 1, 400.0)
    ev = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    hits = sorted(r["event_id"] for r in timeseries.zscore_anomaly(ev).collect())
    assert 50 in hits and 51 in hits


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------

from mysql_cdc_spark.operators import bpe  # noqa: E402


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_learns_most_frequent_pair_first(spark):
    docs = _corpus(spark, ["aa aa aa ab", "aa ba"])
    merges = bpe.train_merges(docs, n_merges=1)
    # pair (a,a) occurs in 'aa'×4... every 'aa' word contributes 1,
    # 'ab'/'ba' contribute 0 to (a,a)
    assert merges[0][:2] == ("a", "a")


def test_bpe_greedy_nonoverlapping_merge(spark):
    """'aaaa' as one word: (a,a) wins; greedy left-to-right merge
    segments it as [aa][aa], so round 2's top pair is (aa,aa)."""
    docs = _corpus(spark, ["aaaa aaaa aaaa"])
    merges = bpe.train_merges(docs, n_merges=2)
    assert merges[0][:2] == ("a", "a")
    assert merges[1][:2] == ("aa", "aa")


def test_bpe_merge_respects_symbol_boundaries(spark):
    """After 'ab' forms, pair (b,c) must not match inside 'ab c'."""
    docs = _corpus(spark, ["abc " * 10 + "bc"])
    merges = bpe.train_merges(docs, n_merges=2)
    # round 1: (a,b) vs (b,c) both freq 10 and 11? 'abc'×10 gives
    # (a,b)=10,(b,c)=10+1('bc' word)=11 → (b,c) wins; 'abc' → 'a bc'
    assert merges[0][:2] == ("b", "c")
    # round 2: only pair left is (a, bc)
    assert merges[1][:2] == ("a", "bc")


def test_bpe_deterministic_tiebreak(spark):
    """Equal-frequency pairs break by pair string ascending."""
    docs = _corpus(spark, ["xy", "ab"])
    merges = bpe.train_merges(docs, n_merges=1)
    assert merges[0][:2] == ("a", "b")  # 'a b' < 'x y'


def test_bpe_encode_counts_compress(spark):
    docs = _corpus(spark, ["the the the cat", "the dog"])
    merges = bpe.train_merges(docs, n_merges=3)
    out = {r["doc_id"]: r for r in bpe.encode_token_counts(docs, merges).collect()}
    # 'the' fully merges to one symbol within 3 rounds
    assert out[0]["n_words"] == 4
    assert out[0]["n_char_syms"] == 12
    assert out[0]["n_bpe_syms"] < 12
    # char symbols are preserved by merging (segmentation only)
    for r in out.values():
        assert r["n_bpe_syms"] <= r["n_char_syms"]


def test_bpe_ignores_non_alnum_tokens(spark):
    docs = _corpus(spark, ["hello, world! hello hello"])
    # 'hello,' and 'world!' are filtered; only bare 'hello' x2 trains
    vocab = bpe.word_freq(docs).collect()
    assert {r["w"]: r["freq"] for r in vocab} == {"hello": 2}


# ---------------------------------------------------------------------------
# Streaming schema-version tracking
# ---------------------------------------------------------------------------

from mysql_cdc_spark.streaming.schema_state import (  # noqa: E402
    schema_version_stateful,
    table_schema_rollup,
)


def test_schema_rollup_tolerates_out_of_order_batches(spark):
    """AvailableNow file streams batch by modification time, not log
    order — the rollup must select the final emission by the monotone
    n_ddls counter, not by offset."""
    # key (d,t,c0): emissions from batches processed out of log order:
    # the chronologically LAST emission (n_ddls=5) carries a smaller
    # offset than an earlier one.
    updates = spark.createDataFrame(
        [
            ("d", "t", "c0", 1, 900, 2),
            ("d", "t", "c0", 2, 3900, 3),   # out-of-order file (high offsets)
            ("d", "t", "c0", 1, 1900, 5),   # final state: net back to 1
            ("d", "t", "c1", -1, 3500, 1),
        ],
        "db string, tbl string, col string, net long, as_of_offset long, n_ddls long",
    )
    got = {(r["db"], r["tbl"]): r for r in table_schema_rollup(updates).collect()}
    r = got[("d", "t")]
    assert r["as_of_offset"] == 3900
    assert r["n_extra_cols"] == 1      # c0 net=1 (final), c1 net=-1
    assert r["n_versions"] == 6        # 5 + 1


def test_schema_version_stream_matches_batch_fold(spark, sf_dir):
    """End-to-end: streamed fold over the event log equals the batch
    schema_evolution final rows."""
    import tempfile

    from mysql_cdc_spark.operators import history
    from mysql_cdc_spark.sources.events_cdc import changes
    from mysql_cdc_spark.streaming import runtime as rt

    log_dir = tempfile.mkdtemp() + "/log"
    rt.write_event_log(changes(spark, sf_dir), log_dir, n_files=3)
    stream = rt.open_stream(spark, log_dir, max_files_per_trigger=1)
    out = schema_version_stateful(stream)
    cp = tempfile.mkdtemp() + "/cp"
    drained = rt.run_to_memory(out, "schema_ver_test", cp, "update")
    got = {
        (r["db"], r["tbl"]): (r["as_of_offset"], r["n_extra_cols"], r["n_versions"])
        for r in table_schema_rollup(drained).collect()
    }

    evo = history.schema_evolution(changes(spark, sf_dir))
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("db", "tbl").orderBy(F.col("offset").desc())
    last = (
        evo.withColumn("rn", F.row_number().over(w))
        .withColumn("n_versions", F.count(F.lit(1)).over(Window.partitionBy("db", "tbl")))
        .where(F.col("rn") == 1)
    )
    want = {
        (r["db"], r["tbl"]): (r["offset"], r["n_extra_cols"], r["n_versions"])
        for r in last.collect()
    }
    assert got == want


def test_chunk_overlap_covers_every_token(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 100)), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    chunks = corpus.chunk_overlap(docs).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,48,96 → 3 chunks; ends capped at 100
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [(r["tok_start"], r["tok_end"]) for r in c1] == [(0, 64), (48, 100), (96, 100)]
    # every token covered, consecutive chunks overlap by size-stride
    assert c1[0]["tok_end"] > c1[1]["tok_start"]
    # doc 2: one short chunk
    assert [(r["tok_start"], r["tok_end"]) for r in by_doc[2]] == [(0, 2)]
    # doc 3: '' splits to [''] → counted as 1 token → one degenerate
    # chunk (same convention as the token-count functions in text.py)
    assert [(r["tok_start"], r["tok_end"]) for r in by_doc[3]] == [(0, 1)]


# ---------------------------------------------------------------------------
# EWMA, k-anonymity, KMV overlap
# ---------------------------------------------------------------------------

from mysql_cdc_spark.operators import sketches  # noqa: E402


def test_ewma_short_history_renormalizes(spark):
    """With fewer lags than terms, missing weights drop from BOTH
    numerator and denominator — first row's ewma equals its value."""
    ev = spark.createDataFrame(
        [(1, 1, 10.0), (2, 1, 20.0)], "event_id long, user_id long, value double"
    )
    out = {r["event_id"]: r["ewma"] for r in timeseries.ewma(ev).collect()}
    assert out[1] == 10.0
    assert abs(out[2] - (20.0 + 0.5 * 10.0) / 1.5) < 1e-12


def test_ewma_smooths_toward_recent(spark):
    rows = [(i, 1, 0.0) for i in range(20)] + [(20, 1, 100.0)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    out = {r["event_id"]: r["ewma"] for r in timeseries.ewma(ev).collect()}
    # last point dominated by the spike but pulled down by history
    assert 50.0 < out[20] < 100.0
    assert out[19] == 0.0


def test_k_anonymity_flags_small_groups(spark):
    from pyspark.sql import functions as F

    rows = [(i, "2024-01-01 00:00:00", i % 100, "click", 1.0, "") for i in range(500)]
    rows += [(900 + i, "2024-01-02 00:00:00", i % 5, "click", 1.0, "") for i in range(50)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {str(r["day"]): (r["n_users"], r["suppress"]) for r in
           __import__("mysql_cdc_spark.operators.profiling", fromlist=["k_anonymity"]).k_anonymity(ev).collect()}
    assert got["2024-01-01 00:00:00"] == (100, False)
    assert got["2024-01-02 00:00:00"] == (5, True)


def test_kmv_overlap_exact_on_small_sets(spark):
    """Below k distinct users the sketch degenerates to exact: the
    intersection estimate equals the true overlap."""
    rows = [(i, "click", i) for i in range(100)]          # users 0..99 click
    rows += [(1000 + i, "view", 50 + i) for i in range(100)]  # users 50..149 view
    ev = spark.createDataFrame(
        [(eid, f"2024-01-01 00:00:0{eid%10//10}", uid, et, 1.0, "")
         for (eid, et, uid) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    )
    from pyspark.sql import functions as F

    ev = ev.withColumn("ts", F.to_timestamp("ts"))
    r = sketches.kmv_overlap(ev, "click", "view").collect()[0]
    assert r["n_seen"] == 150            # union is 150 distinct users < k
    assert r["union_est"] == 150.0
    assert r["n_both"] == 50
    assert abs(r["intersection_est"] - 50.0) < 1e-9


def test_ewma_matches_numpy_reference(spark):
    """Bit-exact against an independent fold of the same truncated
    formula (both are chains of correctly-rounded IEEE ops)."""
    import random

    rng = random.Random(7)
    rows = [(i, i % 3, round(rng.uniform(-100, 100), 6)) for i in range(300)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    got = {r["event_id"]: r["ewma"] for r in timeseries.ewma(ev).collect()}

    by_user: dict[int, list[tuple[int, float]]] = {}
    for eid, uid, v in rows:
        by_user.setdefault(uid, []).append((eid, v))
    for uid, seq in by_user.items():
        seq.sort()
        for idx, (eid, v) in enumerate(seq):
            num = v * 1.0
            den = 1.0
            for j in range(1, timeseries.EWMA_TERMS):
                if idx - j >= 0:
                    num = num + seq[idx - j][1] * (0.5 ** j)
                    den = den + 0.5 ** j
                else:
                    num = num + 0.0 * (0.5 ** j)
                    den = den + 0.0
            assert got[eid] == num / den, (uid, eid)


def test_zscore_matches_pure_python(spark):
    """Same flags and bit-identical z values as an independent
    implementation of the decimal-sum window formula."""
    import random
    from decimal import Decimal

    rng = random.Random(11)
    rows = [(i, 1, round(rng.uniform(0, 10), 4)) for i in range(200)]
    rows[150] = (150, 1, 5000.0)
    ev = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    got = {r["event_id"]: r["z"] for r in timeseries.zscore_anomaly(ev).collect()}

    want = {}
    vals = [v for (_, _, v) in rows]
    L, MINN, TH = (
        timeseries.ZSCORE_LOOKBACK,
        timeseries.ZSCORE_MIN_N,
        timeseries.ZSCORE_THRESHOLD,
    )
    q = Decimal("0.000001")
    for i, x in enumerate(vals):
        hist = vals[max(0, i - L):i]
        if len(hist) < MINN:
            continue
        dh = [Decimal(repr(v)).quantize(q) for v in hist]
        n = float(len(dh))
        mean = float(sum(dh)) / n
        var = float(sum(d * d for d in dh)) / n - mean * mean
        if var <= 0:
            continue
        z = (x - mean) / var ** 0.5
        if abs(z) > TH:
            want[i] = z
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_compact_event_log_preserves_content(spark, sf_dir, tmp_path):
    """Many small drain files → few range-ordered files; every row
    survives byte-identical (checksum-gated swap)."""
    import glob
    import os

    from mysql_cdc_spark.sources.events_cdc import changes
    from mysql_cdc_spark.streaming.runtime import write_event_log
    from tools.compact_event_log import checksum, compact_event_log

    log_dir = str(tmp_path / "log")
    write_event_log(changes(spark, sf_dir), log_dir, n_files=16)
    before = checksum(spark.read.parquet(log_dir))

    stats = compact_event_log(spark, log_dir, n_files=3)
    assert stats["files_before"] >= 8
    assert stats["files_after"] == 3
    assert checksum(spark.read.parquet(log_dir)) == before
    assert not os.path.exists(log_dir + ".precompact")
    assert not os.path.exists(log_dir + ".compacting")
    # range partitioning: per-file offset spans must not overlap
    spans = []
    for p in sorted(glob.glob(log_dir + "/*.parquet")):
        import pyarrow.parquet as pq

        t = pq.read_table(p, columns=["offset"])
        if t.num_rows:
            col = t.column("offset").to_pylist()
            spans.append((min(col), max(col)))
    spans.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo


def test_cms_join_cardinality_upper_bound(spark):
    """CMS inner product never underestimates, and is exact when keys
    are sparse enough not to collide in any row."""
    rows = [(i, "click", i % 10) for i in range(100)]
    rows += [(1000 + i, "view", i % 10) for i in range(50)]
    ev = spark.createDataFrame(
        [(eid, "2024-01-01 00:00:00", uid, et, 1.0, "") for (eid, et, uid) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    )
    r = sketches.cms_join_cardinality(ev, "click", "view").collect()[0]
    # exact: each of 10 users has 10 clicks x 5 views
    assert r["exact_join_size"] == 10 * 10 * 5
    assert r["cms_estimate"] >= r["exact_join_size"]
    # 10 keys in 512 buckets: no full-row collision expected
    assert r["cms_estimate"] == r["exact_join_size"]


def test_cms_join_cardinality_disjoint_cohorts(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "click", 1.0, ""),
         (2, "2024-01-01 00:00:00", 2, "view", 1.0, "")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    )
    r = sketches.cms_join_cardinality(ev, "click", "view").collect()[0]
    assert r["exact_join_size"] == 0 and r["cms_estimate"] == 0
