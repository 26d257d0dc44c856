"""Deduplication operators over the `documents` table — the core of an
LLM-training-data pipeline (exact, MinHash-LSH, SimHash, n-gram
Jaccard).  The reference engine has no analog; these are designed
Spark-first for the 100 TB case:

- NOTHING here is all-pairs.  Near-dup candidate generation is always
  a bucketed equi-join (LSH band buckets / SimHash bands / inverted
  shingle index), so the shuffle key is the bucket id and Catalyst+AQE
  handle skewed buckets.
- Per-document signatures (minhash, simhash) are computed as array
  expressions (`transform`/`aggregate`) — no explode, no Python UDF,
  one codegen stage per scan.
- Exact verification runs on candidate pairs only.

Determinism contract (shared with the DuckDB oracles in queries.py):
signatures are lexicographic MINs of lowercase-hex md5 strings and
integer bit-arithmetic on md5 hex digits — engine-neutral; Jaccard is
one IEEE division of exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SHINGLE_WORDS = 3          # word n-gram size for shingling
MINHASH_K = 8              # minhash signature length
LSH_BANDS = 4              # bands of MINHASH_K / LSH_BANDS rows each
JACCARD_THRESHOLD = 0.5
MAX_SHINGLE_DF = 1000      # inverted-index frequency cap (scale guard)
SIMHASH_BITS = 64
HAMMING_THRESHOLD = 6


def normalized(docs: DataFrame) -> DataFrame:
    """Canonical normalization shared by every dedup operator."""
    return docs.selectExpr("*", "lower(trim(text)) AS norm_text")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup: md5 over normalized text; canonical = lowest doc_id
    in each content group.

    Scale: one groupBy on the content hash (map-side combinable) + an
    equi-join back on the same key — both shuffles share the hash key,
    so AQE co-partitions them; no windows, no skew beyond true dup
    groups (which AQE's skew-join splits).
    """
    hashed = normalized(docs).select(
        "doc_id", F.md5(F.col("norm_text")).alias("content_hash")
    )
    groups = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
    )
    return (
        hashed.join(groups, "content_hash")
        .select(
            "doc_id",
            "content_hash",
            "keep_doc_id",
            "n_copies",
            (F.col("doc_id") == F.col("keep_doc_id")).alias("is_canonical"),
        )
    )


def spread_small_scan(docs: DataFrame) -> DataFrame:
    """Rebalance a small documents scan before array-building fan-out.

    A fixture-sized documents file is ONE parquet split; the per-doc
    shingle/gram array chains and the explodes above them then run
    inside a single task.  Conditionally repartition by doc_id up to
    the session parallelism — a no-op when the scan already splits
    naturally (production scale), and the shuffle moves only raw docs,
    strictly smaller than the arrays built above them.
    """
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < max(2, parallelism // 2):
        return docs.repartition(parallelism, "doc_id")
    return docs


def with_shingles(docs: DataFrame, n: int = SHINGLE_WORDS) -> DataFrame:
    """Append the distinct word-n-gram shingle set (array column)."""
    return normalized(docs).selectExpr(
        "*", r"split(norm_text, '\\s+') AS tokens"
    ).selectExpr(
        "*",
        f"array_distinct(case when size(tokens) >= {n} then "
        f"transform(sequence(1, size(tokens) - {n - 1}), "
        f"i -> concat_ws(' ', slice(tokens, i, {n}))) "
        f"else array() end) AS shingles",
    )


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k-row MinHash signature per document: ONE md5 per shingle,
    sliced into k disjoint 4-hex-digit (16-bit) sub-hashes; m_s = MIN
    over shingles of slice s.  Slicing a single 128-bit hash into k
    independent projections is the standard one-hash minhash trick —
    8× less hashing than k separate salted md5s; the (rare) 16-bit
    min ties only ever ADD band candidates, which the exact verify
    step filters.  Pure array expressions — shuffle-free.  (String
    selectExpr form, r14: one Catalyst parse unit instead of a Py4J
    round-trip per builder call — construction cost is on the bench's
    per-pass clock.)"""
    if k > 8:
        raise ValueError("md5 slicing supports at most 8 16-bit sub-hashes")
    sh = with_shingles(docs).selectExpr(
        "*", "transform(shingles, x -> md5(x)) AS hashes"
    )
    cols = [
        f"array_min(transform(hashes, h -> substring(h, {4 * s + 1}, 4))) AS mh{s}"
        for s in range(k)
    ]
    return sh.selectExpr("doc_id", "shingles", *cols)


def _shingle_projection_sql(plane: int) -> str:
    """Centered-hash sum projection of the shingle SET onto order-plane
    `plane`: Σ over shingles of (first-32-bits-of md5('ord{plane}|' ||
    shingle) − 2³¹).  Engine-neutral (md5 + hex), mirrored by
    tools/chain_recall.py.  Shared shingles contribute identically to
    both docs, so |proj_a − proj_b| concentrates around
    √|AΔB| · 2³¹/√3 — a similarity-preserving 1-D embedding used only
    as a within-bucket SORT key (never thresholded), so hash collisions
    cannot affect results."""
    return (
        f"aggregate(shingles, 0L, (acc, x) -> acc + "
        f"(CAST(conv(substring(md5(concat('ord{plane}|', x)), 1, 8), 16, 10) AS BIGINT)"
        f" - 2147483648L))"
    )


def _band_key_sql(b: int, rows_per_band: int) -> str:
    parts = ", ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
    return f"md5(concat_ws('|', '{b}', {parts}))"


def _band_key(b: int, rows_per_band: int) -> F.Column:
    return F.expr(_band_key_sql(b, rows_per_band))


def _band_explode_sql(bands: int, rows_per_band: int) -> str:
    """`explode` of the per-band (band, band_hash) structs, as one SQL
    string — the per-band builder loop was a Py4J round-trip per
    struct field (r14 construction-cost fix)."""
    structs = ", ".join(
        f"named_struct('band', {b}, 'band_hash', {_band_key_sql(b, rows_per_band)})"
        for b in range(bands)
    )
    return f"explode(array({structs})) AS bk"


# Within-bucket candidate fan-out: each member pairs with its next
# MAX_BAND_CHAIN successors in within-bucket (locality, doc_id) order.
# ONE constant for BOTH the text and embedding paths (r11 VERDICT
# unification), derived from two measured statistics
# (tools/chain_recall.py, 48 id-interleaved clusters in one hot
# bucket + PLANS.md r12 recall table):
#   lower bound A — all-pairs equivalence on gate data: chain+1 must
#     exceed every gate-fixture bucket (measured maxima: minhash 9,
#     simhash 4, embedding ≤ chain at sf0.1), so every DuckDB oracle
#     built on the all-pairs band join stays value-exact;
#   lower bound B — adversarial recall: under locality ordering,
#     chain must cover a same-cluster run plus its interleaving
#     residue; measured component-pair recall at chain 8 → 32:
#     text 0.96 → 1.00 (transposed two-pass projection order),
#     embedding 0.99 → 1.00.
# Beyond it the operator is deliberately bounded (see
# _chain_candidates) — candidates stay O(n·bands·chain) on ANY
# bucket distribution.
MAX_BAND_CHAIN = 32


def _chain_candidates(
    band_rows: DataFrame,
    keys: list[str],
    chain: int = MAX_BAND_CHAIN,
    order_cols: list[str] | None = None,
    order_passes: list[list[str]] | None = None,
) -> DataFrame:
    """Bounded within-bucket candidate pairs (r11 scale fix): per
    bucket (`keys`), each member pairs with its next `chain` successors
    in within-bucket order — O(n · buckets_per_doc · chain) candidates
    via one window + bounded following frame, never the |bucket|²
    self-join.

    Why: a band bucket over a dup-heavy corpus is a hot key.  The r11
    skew soak planted a 31,872-doc near-dup block at 10× data and the
    all-pairs band join generated 1.9 BILLION candidates (disk-full) —
    the same quadratic the embedding near-dup path hit
    (similarity.neardup_candidates).  For a true near-dup clique the
    downstream component closure is unchanged (every consecutive pair
    passes the exact verify).

    `order_cols` (r12): within-bucket sort keys tried BEFORE doc_id.
    With plain doc_id order, pair recall degrades for id-INTERLEAVED
    distinct clusters sharing a bucket (k clusters round-robin by id
    put same-cluster successors k positions apart — the adversarial
    case tools/chain_recall.py measures).  Passing the document's own
    signature as the sort key groups same-cluster members into runs
    (near-dups agree on most signature positions, distinct clusters
    on few), so the chain window covers them regardless of id
    interleaving.  Pairs are emitted least/greatest-normalized, so
    with ≤ chain+1 members per bucket the output is the full pair set
    under ANY ordering — which is why every gate oracle built on the
    all-pairs band join stays value-exact (measured fixture bucket
    maxima: minhash 9, simhash 4 at sf0.1).

    `order_passes` (r12, second iteration): a list of order-col lists;
    the chain window runs once PER pass and the union of pass
    candidates is kept.  Two passes keyed on transposed projection
    pairs — (ord0, ord1) and (ord1, ord0) — catch cluster runs that a
    single 1-D sort splits (a cluster straddling ord0's sort boundary
    is contiguous under ord1 with independent probability), measured
    +0.05 component-pair recall over the single signature sort at 2×
    the still-O(n·bands·chain) candidate bound (tools/chain_recall.py,
    PLANS.md r12 recall table).  Mutually exclusive with `order_cols`
    (the single-pass form, kept for the simhash path)."""
    # Bounded FOLLOWING frame, not `chain` lead() columns: collect_list
    # over rows (1, chain) materializes exactly the real successors, so
    # the explode emits only true candidates — a 32-lead explode would
    # materialize n·buckets·chain rows BEFORE the null filter (measured
    # ~0.8 s extra on the sf0.1 minhash bench for 1.5k real pairs).
    passes = order_passes if order_passes else [order_cols or []]
    # Passes beyond the first run ONLY on buckets larger than chain+1:
    # a smaller bucket already emits its FULL pair set from pass 1
    # under any ordering, so extra passes there are pure duplicate
    # work for the distinct to throw away.  Output is provably
    # identical, and on non-degenerate data (gate-fixture bucket
    # maxima: 9) the extra passes see ~zero rows — the windows share
    # the pass-1 exchange (same partitioning), so their cost is one
    # near-empty sort each.  The bucket-size window is sort-free
    # (unordered frame over the same partitioning).
    part = ", ".join(keys)
    if len(passes) == 1:
        order = ", ".join([*passes[0], "doc_id"])
        return (
            band_rows.selectExpr(
                "doc_id AS _cur",
                f"collect_list(doc_id) OVER (PARTITION BY {part} ORDER BY {order} "
                f"ROWS BETWEEN 1 FOLLOWING AND {chain} FOLLOWING) AS _succ",
            )
            .selectExpr("_cur", "explode(_succ) AS _nxt")
            .selectExpr(
                "least(_cur, _nxt) AS doc_a",
                "greatest(_cur, _nxt) AS doc_b",
            )
            .distinct()
        )
    # Multi-pass fused form (r20): all pass windows share the bucket
    # partitioning, and the pass-p>0 bucket-size gate (_bsz > chain+1)
    # is a PER-BUCKET constant — filtering a whole bucket before or
    # after its window yields the same window content — so every pass
    # runs over ONE exchange of the band rows instead of re-scanning,
    # re-exploding and re-shuffling them per pass (the r19 plan paid
    # scan+Generate+Exchange twice because pass 1 pruned _bsz and the
    # subtrees no longer matched for exchange reuse).  Pair set is
    # provably identical: pass 1 emits all successors; pass p>0
    # successors are concat'd only when the bucket is larger than
    # chain+1, exactly the old filter; the trailing distinct is
    # unchanged.  Extra per-row cost: small buckets now also build the
    # pass-2 list (<= bucket-size elements) before the CASE drops it —
    # bounded by the same chain cap as pass 1.
    succ_cols = [f"count(1) OVER (PARTITION BY {part}) AS _bsz"]
    for p, cols in enumerate(passes):
        order = ", ".join([*cols, "doc_id"])
        succ_cols.append(
            f"collect_list(doc_id) OVER (PARTITION BY {part} ORDER BY {order} "
            f"ROWS BETWEEN 1 FOLLOWING AND {chain} FOLLOWING) AS _s{p}"
        )
    extra = ", ".join(
        f"CASE WHEN _bsz > {chain + 1} THEN _s{p} ELSE array() END"
        for p in range(1, len(passes))
    )
    return (
        band_rows.selectExpr("doc_id AS _cur", *succ_cols)
        .selectExpr("_cur", f"explode(concat(_s0, {extra})) AS _nxt")
        .selectExpr(
            "least(_cur, _nxt) AS doc_a",
            "greatest(_cur, _nxt) AS doc_b",
        )
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    threshold: float = JACCARD_THRESHOLD,
    max_pairs_per_doc: int | None = None,
    chain: int = MAX_BAND_CHAIN,
    locality_order: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH + exact verify.

    Candidates = documents agreeing on at least one full band (an
    equi-join on (band_id, band_hash) — bucketed, never all-pairs);
    each candidate pair is then verified with the exact shingle-set
    Jaccard, keeping pairs >= threshold.

    `max_pairs_per_doc` is the RESULT-BOUNDING knob (r8 VERDICT: pair
    producers are output-bound at scale — a corpus with large
    near-dup cliques emits O(clique²) verified pairs): each doc_a
    keeps only its k most-similar partners (jaccard desc, doc_b asc —
    deterministic), bounding output to O(docs × k).  The cap is a
    per-doc window over that doc's verified pairs only.
    """
    rows_per_band = k // bands
    # ord0/ord1 are computed INSIDE the cached frame: a select that
    # also explodes would evaluate the per-shingle md5 aggregate once
    # per generated band row (bands×/doc) — same Generate re-inline
    # trap as the jaccard shingle cache below.
    sigs = (
        minhash_signatures(docs, k)
        .selectExpr(
            "*",
            f"{_shingle_projection_sql(0)} AS ord0",
            f"{_shingle_projection_sql(1)} AS ord1",
        )
        .cache()
    )
    band_rows = sigs.selectExpr(
        "doc_id",
        _band_explode_sql(bands, rows_per_band),
        # shingle-set projection locality keys (r12 second iteration):
        # each is the sum over the (distinct) shingle set of a centered
        # 32-bit salted hash — a random linear projection of the
        # bag-of-shingles whose distance grows with SYMMETRIC-DIFFERENCE
        # size, so near-dups land close under the sort even when their
        # leading minhash slices differ (the lexicographic signature
        # sort's failure mode: one unique-shingle minimum in an early
        # slice scatters a member arbitrarily).  Measured on the
        # adversarial interleaved-cluster fixture: component-pair
        # recall 0.951 (signature sort) → 1.000 with the transposed
        # two-pass union (tools/chain_recall.py, PLANS.md r12 table).
        "ord0",
        "ord1",
    ).selectExpr("doc_id", "bk.band", "bk.band_hash", "ord0", "ord1")

    candidates = _chain_candidates(
        band_rows,
        ["band", "band_hash"],
        chain=chain,
        order_passes=[["ord0", "ord1"], ["ord1", "ord0"]] if locality_order else None,
    )

    sh = sigs.select("doc_id", "shingles")
    verified = (
        candidates.join(sh.selectExpr("doc_id AS doc_a", "shingles AS sh_a"), "doc_a")
        .join(sh.selectExpr("doc_id AS doc_b", "shingles AS sh_b"), "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            "CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT) AS common",
            "CAST(size(sh_a) AS BIGINT) AS n_a",
            "CAST(size(sh_b) AS BIGINT) AS n_b",
        )
        .selectExpr(
            "*",
            "CAST(common AS DOUBLE) / CAST(n_a + n_b - common AS DOUBLE) AS jaccard",
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "common", "n_a", "n_b", "jaccard")
    )
    if max_pairs_per_doc is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("doc_a").orderBy(
            F.col("jaccard").desc(), F.col("doc_b").asc()
        )
        verified = (
            verified.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_pairs_per_doc)
            .drop("_rn")
        )
    return verified


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via an inverted shingle
    index: explode distinct shingles, equi-join on the shingle, count
    common shingles per pair, compute Jaccard from the exact counts.

    Complete for any threshold > 0 among pairs sharing at least one
    sub-cap shingle.  `max_df` drops ultra-common shingles from the
    index (standard frequency-cap guard: at 100 TB a stop-shingle
    would otherwise generate a quadratic bucket); the cap is part of
    the operator contract and mirrored by the oracle.
    """
    # cache(): this subtree is consumed five times (sizes ×2, the
    # df-cap build, both sides of the self-join) and the explode's
    # Generate re-inlines the shingle array chain per emitted element
    # without a materialization boundary (measured 17× at sf0.1 —
    # same trap as the winnowing fingerprints below).
    sh = with_shingles(spread_small_scan(docs)).select("doc_id", "shingles").cache()
    sizes = sh.select("doc_id", F.size("shingles").cast("bigint").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    df_ok = (
        inv.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shingle")
    )
    inv = inv.join(df_ok, "shingle")

    # SHUFFLE_HASH: Catalyst's default sort-merge join SORTS both inv
    # sides by shingle — at x100 that sort spilled 8 GB (r12 sweep).
    # The equi-key's per-partition build side is small (inv bytes /
    # partitions), so a shuffled hash join does the same one-shuffle
    # plan without sorting anything.
    a, b = inv.alias("a"), inv.alias("b").hint("SHUFFLE_HASH")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "common", "n_a", "n_b", "jaccard")
    )


# --- SimHash -----------------------------------------------------------------

# Engine-neutral md5-hex bit extraction: bit j of a token's 64-bit
# simhash contribution is bit (3 - j%4) of hex digit j/4 of md5(token).
_HEX = "0123456789abcdef"


def simhash_signatures(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """64-bit SimHash per document as a bit string.

    Features are the distinct word-3-gram shingles (single tokens are
    too coarse on a small shared vocabulary: near-identical token SETS
    collapse every signature together and the LSH bands degenerate into
    one giant bucket).  Bit j is the majority vote over the shingles'
    md5s of hex-MSB-first bit j (bit 3-(j%4) of nibble j div 4 — the
    same definition the oracle mirrors digit-by-digit).

    Expression shape (r10): shingles EXPLODE and the votes are 64
    map-side-combinable SUMs over codegen'd shift/mod scalars on two
    32-bit halves of the md5 prefix.  The previous form — a
    `transform(sequence(0,63))` lambda running an `aggregate` lambda
    over the shingle array per bit — evaluated 64×|shingles|
    interpreted higher-order calls per doc: 25 s at sf0.1 vs 0.9 s
    for this shape (identical output, asserted in test_dedup).  The
    one new shuffle (groupBy doc_id) carries two BIGINTs per shingle.
    """
    ex = (
        with_shingles(docs)
        .select("doc_id", F.explode_outer("shingles").alias("t"))
        .withColumn("h", F.md5("t"))
        .withColumn("hi", F.expr("cast(conv(substring(h, 1, 8), 16, 10) as bigint)"))
        .withColumn("lo", F.expr("cast(conv(substring(h, 9, 8), 16, 10) as bigint)"))
    )
    aggs = [F.count("t").alias("n")]
    for j in range(bits):
        src, sh = ("hi", 31 - j) if j < 32 else ("lo", 63 - j)
        aggs.append(F.sum(F.expr(f"shiftright({src}, {sh}) % 2")).alias(f"c{j}"))
    voted = ex.groupBy("doc_id").agg(*aggs)
    # majority: vote_j = Σ(2·bit−1) = 2·c_j − n ≥ 0.  Empty shingle
    # sets (docs under 3 tokens) have n=0, c=NULL→0: every vote is
    # 0 ≥ 0 → all-ones, matching the old aggregate-over-empty form.
    bit_cols = [
        F.when(
            2 * F.coalesce(F.col(f"c{j}"), F.lit(0)) >= F.col("n"), F.lit("1")
        ).otherwise(F.lit("0"))
        for j in range(bits)
    ]
    return voted.select("doc_id", F.concat(*bit_cols).alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    bits: int = SIMHASH_BITS,
    bands: int = 4,
    max_hamming: int = HAMMING_THRESHOLD,
    chain: int = MAX_BAND_CHAIN,
    locality_order: bool = True,
) -> DataFrame:
    """Near-dup pairs via SimHash: candidates share at least one of
    `bands` contiguous signature blocks (equi-join on (band, block)),
    verified by exact Hamming distance <= max_hamming.

    By pigeonhole, any pair within Hamming distance < `bands` is
    guaranteed caught; beyond that recall degrades gracefully — the
    standard SimHash banding trade-off (the oracle mirrors the same
    banding, so results are exactly reproducible).
    """
    width = bits // bands
    sigs = simhash_signatures(docs, bits).cache()
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.substring("simhash", 1 + b * width, width).alias("block"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
        # the full simhash IS the locality key: near-dups differ in
        # ≤ max_hamming bits, so they sort adjacent within a bucket
        F.col("simhash").alias("sig"),
    ).select("doc_id", "bk.band", "bk.block", "sig")

    candidates = _chain_candidates(
        band_rows,
        ["band", "block"],
        chain=chain,
        order_cols=["sig"] if locality_order else None,
    )
    s = sigs.select("doc_id", "simhash")
    return (
        candidates.join(s.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("simhash", "sig_a"), "doc_a")
        .join(s.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("simhash", "sig_b"), "doc_b")
        .withColumn(
            "hamming",
            F.expr(
                f"size(filter(sequence(1, {bits}), "
                f"i -> substring(sig_a, i, 1) != substring(sig_b, i, 1)))"
            ).cast("bigint"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def dup_spans(docs: DataFrame, width: int = 8, k: int = 9) -> DataFrame:
    """Duplicated-passage detection via winnowing fingerprints
    (Schleimer et al., "Winnowing: Local Algorithms for Document
    Fingerprinting" — the MOSS algorithm): the scalable approximation
    of exact substring dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better": long verbatim spans shared
    across documents, which shingle/MinHash dedup under-weights
    because it scores whole-document similarity).

    Hash every `width`-token gram (stride 1), then select the MINIMUM
    hash in each sliding window of `k` consecutive gram hashes.
    Selection by local minimum makes fingerprints alignment-free —
    winnowing's guarantee: any verbatim run of ≥ width + k − 1 tokens
    shared by two docs contains a full k-window of identical gram
    hashes on both sides, whose minimum both select.  (A fixed-stride
    scheme has no such guarantee: windows only align when the run
    starts at the same offset mod stride in both docs.)  A selected
    fingerprint seen in ≥2 distinct docs marks a cross-document
    duplicated span; per doc we report the share of its fingerprints
    that are shared — near 1.0 means the doc is assembled from
    passages that exist verbatim elsewhere.

    Scale shape: fingerprint construction is a pure array expression
    (O(n·k) per doc, zero shuffles); then explode distinct
    (doc, fingerprint) pairs, one map-side-combined count per
    fingerprint, equi-join back, count per doc — same two
    uniformly-distributed shuffle keys as the inverted-index Jaccard
    path, no doc-pair materialization.  Fingerprints are md5s —
    effectively unique per distinct text, so the join key has no
    Zipf skew (unlike token joins).
    """
    grams = (
        f"case when size(tokens) >= {width} then "
        f"transform(sequence(1, size(tokens) - {width - 1}), "
        f"i -> md5(concat_ws(' ', slice(tokens, i, {width})))) "
        f"else array() end"
    )
    wins = (
        f"case when size(grams) >= {k} then "
        f"array_distinct(transform(sequence(1, size(grams) - {k - 1}), "
        f"j -> array_min(slice(grams, j, {k})))) "
        f"else array() end"
    )
    toks = normalized(spread_small_scan(docs)).withColumn("tokens", F.split(F.col("norm_text"), r"\s+"))
    # cache() the materialized fingerprint arrays before fan-out: the
    # explode's Generate and the two aggregate branches would each
    # re-inline the O(n·k) gram/min-select chain otherwise (measured
    # 20× slower at sf0.01 — same trap, and same fix, as the MinHash
    # signature reuse above).
    sh = (
        toks.withColumn("grams", F.expr(grams))
        .withColumn("wins", F.expr(wins))
        .select("doc_id", "wins", F.size("wins").alias("n_win"))
        .cache()
    )
    sizes = sh.select("doc_id", "n_win")
    inv = sh.select("doc_id", F.explode("wins").alias("whash"))
    df_counts = inv.groupBy("whash").agg(F.count(F.lit(1)).alias("df"))
    shared = (
        inv.join(df_counts.filter(F.col("df") > 1), "whash")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return sizes.join(shared, "doc_id", "left").select(
        "doc_id",
        F.col("n_win").cast("bigint").alias("n_windows"),
        F.coalesce(F.col("n_shared"), F.lit(0)).cast("bigint").alias("n_shared"),
        F.when(
            F.col("n_win") > 0,
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("double")
            / F.col("n_win").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("span_frac"),
    )


def _band_rows(docs: DataFrame, side: str, k: int, bands: int) -> DataFrame:
    """(doc → one row per LSH band) with the shingle set riding along:
    the unit of both the probe side and the persisted index."""
    rows_per_band = k // bands
    sigs = minhash_signatures(docs, k)
    return sigs.selectExpr(
        f"doc_id AS {side}_id",
        "shingles",
        _band_explode_sql(bands, rows_per_band),
    ).selectExpr(f"{side}_id", "shingles", "bk.band", "bk.band_hash")


def build_lsh_index(
    base: DataFrame, k: int = MINHASH_K, bands: int = LSH_BANDS
) -> DataFrame:
    """The persistable LSH index over an already-ingested corpus:
    (base_id, shingles, band, band_hash) — compute once per corpus
    build, write to a table partitioned/bucketed by (band, band_hash),
    and hand to `incremental_neardup(base_index=...)` on every
    subsequent ingest so delta batches probe it without re-signing the
    base.  Pure function of the corpus; append-only under corpus
    growth (new docs only add rows)."""
    return _band_rows(base, "base", k, bands)


def incremental_neardup(
    base: DataFrame,
    delta: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    threshold: float = JACCARD_THRESHOLD,
    max_matches_per_delta: int | None = None,
    base_index: DataFrame | None = None,
) -> DataFrame:
    """Incremental corpus dedup: near-dup matches of a DELTA batch
    against an existing BASE corpus — the production ingest shape
    (new crawl vs indexed corpus).  Returns one row per verified
    (delta_id, base_id) pair with the exact Jaccard.

    Scale contract (what makes this INCREMENTAL, not a re-run):
    - base band rows are a pure function of the base corpus — in a
      production pipeline they are computed once and persisted as the
      LSH index; here they are derived in the same job, but the join
      topology is identical: probe-side (delta) bands equi-join the
      index on (band, band_hash).
    - base x base pairs are NEVER generated (the existing corpus was
      already deduped when it was built) and delta x delta pairs are
      left to the intra-batch pass — so candidate volume is
      O(delta bands), independent of base-corpus growth beyond true
      bucket collisions.
    - exact verify touches candidate pairs only; `max_matches_per_delta`
      bounds output per delta doc (top-jaccard first) so a delta doc
      landing in a large near-dup clique cannot emit O(clique) rows.

    No reference analog; standard LSH-index incremental dedup
    (Broder resemblance + banding) re-expressed as two bucketed
    equi-joins.
    """
    def band_rows(docs: DataFrame, side: str) -> DataFrame:
        return _band_rows(docs, side, k, bands)

    # Candidate generation: delta probes the base index.  Shingle
    # arrays ride along on each side so the verify step needs no
    # second join back to the corpus (one shuffle on the band key,
    # then a groupBy on the pair key — no further scans).
    probe = band_rows(delta, "delta")
    # base_index = the PERSISTED LSH index (band rows written by the
    # previous ingest run, schema: base_id, shingles, band, band_hash
    # — exactly `build_lsh_index`'s output).  Supplying it makes the
    # job's cost genuinely O(delta): the base corpus is never
    # re-shingled or re-signed in this job, the same persisted-state
    # pattern as `incremental_components(base_labels=...)`.  When
    # omitted, the index is derived in-job (one-shot convenience /
    # oracle form; identical join topology either way).
    index = base_index if base_index is not None else band_rows(base, "base")
    cand = (
        probe.join(index, ["band", "band_hash"])
        .select(
            "delta_id",
            "base_id",
            probe["shingles"].alias("sh_d"),
            index["shingles"].alias("sh_b"),
        )
        .dropDuplicates(["delta_id", "base_id"])
    )
    verified = (
        cand.withColumn("common", F.size(F.array_intersect("sh_d", "sh_b")).cast("bigint"))
        .withColumn("n_delta", F.size("sh_d").cast("bigint"))
        .withColumn("n_base", F.size("sh_b").cast("bigint"))
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("n_delta") + F.col("n_base") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("delta_id", "base_id", "common", "n_delta", "n_base", "jaccard")
    )
    if max_matches_per_delta is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("delta_id").orderBy(
            F.col("jaccard").desc(), F.col("base_id").asc()
        )
        verified = (
            verified.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_matches_per_delta)
            .drop("_rn")
        )
    return verified


def dup_span_ranges(docs: DataFrame, width: int = 8) -> DataFrame:
    """Exact duplicated-span EXTRACTION (token granularity): the
    concrete [start, end] ranges of every maximal passage whose
    `width`-token grams all occur more than once in the corpus — the
    actionable output of exact substring dedup (Lee et al. 2021 cut
    these ranges out of the training set; `dup_spans` above only
    scores their share per doc).

    Pipeline: gram-hash every position (stride 1), count corpus-wide
    occurrences per gram, keep positions whose gram repeats, then
    merge overlapping/adjacent hit windows per document with a
    gaps-and-islands pass (new island when the next hit starts more
    than `width` tokens after the previous — i.e. the windows no
    longer touch).  Offsets are 1-based token indices, end inclusive.

    Scale shape: no doc-pair materialization anywhere — one explode
    (position stream), one map-side-combined count on the md5 gram
    key (effectively unique per distinct text: no Zipf skew), an
    equi-join back, and per-DOC windows for the island merge (bounded
    by document length, never global).  Output is bounded by the true
    duplicated-text volume, not by pair counts.

    Expression shape matters 23× here (r10): the gram hash is
    computed as a TOP-LEVEL scalar AFTER exploding position indices —
    `md5(concat_ws(slice(...)))` inside a `transform` lambda runs on
    Catalyst's interpreted higher-order-function path (5.6 s for the
    same 235k grams at sf0.1; 0.24 s this way), while the post-explode
    scalar stays in whole-stage codegen.
    """
    from pyspark.sql import Window

    toks = normalized(spread_small_scan(docs)).withColumn(
        "tokens", F.split(F.col("norm_text"), r"\s+")
    )
    # guarded sequence: sequence(1, size-w+1) would DESCEND for short
    # docs (Spark generates [1, 0] for sequence(1, 0)); the case arm
    # drops them before the explode instead of filtering bogus rows
    positions = (
        f"case when size(tokens) >= {width} then "
        f"sequence(1, size(tokens) - {width - 1}) else array() end"
    )
    pos = toks.select(
        "doc_id",
        "tokens",
        F.explode(F.expr(positions)).alias("off"),
    ).select(
        "doc_id",
        "off",
        F.md5(F.expr(f"concat_ws(' ', slice(tokens, off, {width}))")).alias("ghash"),
    )
    dfc = pos.groupBy("ghash").agg(F.count(F.lit(1)).alias("df"))
    hits = pos.join(dfc.filter(F.col("df") > 1), "ghash").select("doc_id", "off")

    w_doc = Window.partitionBy("doc_id").orderBy("off")
    islands = (
        hits.withColumn("prev_off", F.lag("off", 1).over(w_doc))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_off").isNull()
                | (F.col("off") - F.col("prev_off") > width),
                1,
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_doc))
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("off").cast("bigint").alias("span_start"),
            (F.max("off") + width - 1).cast("bigint").alias("span_end"),
            (F.max("off") + width - F.min("off")).cast("bigint").alias("n_tokens"),
        )
        .drop("island")
    )


def censor_dup_spans(docs: DataFrame, width: int = 8) -> DataFrame:
    """Apply `dup_span_ranges` to the corpus: emit each document with
    its duplicated spans CUT OUT — the write-side of substring dedup
    (Lee et al. removed the duplicated ranges, not whole documents,
    precisely because near-dup docs are mostly unique outside the
    shared passage).

    Spark shape: the span list per doc is collected by the ranges
    operator and equi-joined back on doc_id; token filtering is a
    pure array expression (indexed filter + exists over the span
    array) — no token-level explode.  The spans side is NOT
    force-broadcast: it has one row per document containing any
    duplicated span, i.e. it grows linearly with the corpus's
    duplicated-text volume, so a broadcast hint would OOM the driver
    at 100-TB scale.  AQE sizes the join at runtime — broadcast while
    the side is genuinely small, shuffled hash join once it isn't.
    Docs with no spans pass through unchanged.
    """
    spans = dup_span_ranges(docs, width).groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    toks = normalized(docs).withColumn("tokens", F.split(F.col("norm_text"), r"\s+"))
    joined = toks.join(spans, "doc_id", "left").withColumn(
        "spans", F.coalesce(F.col("spans"), F.expr("array()"))
    )
    kept = F.expr(
        "filter(transform(sequence(1, size(tokens)), i -> struct(i as i, tokens[i-1] as tok)), "
        "x -> !exists(spans, s -> x.i >= s.span_start and x.i <= s.span_end))"
    )
    return joined.withColumn("kept", kept).select(
        "doc_id",
        F.array_join(F.expr("transform(kept, x -> x.tok)"), " ").alias("clean_text"),
        F.size("tokens").cast("bigint").alias("n_tokens"),
        (F.size("tokens") - F.size("kept")).cast("bigint").alias("n_removed"),
    )
