"""Corpus-management operators for a training-data pipeline: the
steps that turn a deduplicated document pool into model-ready data —
deterministic split assignment, length bucketing for batch packing,
and duplicate-cluster resolution (connected components over near-dup
pairs).

These go beyond the reference's surface (its product ends at the
change stream) but are first-class here: at 100 TB every one of these
is a distributed job, and each has an exact DuckDB oracle so the
implementations stay verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Split thresholds on a 256-bucket md5 space: ~90/5/5.  Integer
# boundaries keep both engines' comparisons exact.
TRAIN_CUT = 230
VAL_CUT = 243

# First two hex digits of md5('split:' || doc_id) → 0..255.  The
# instr-based digit parse is engine-neutral (Spark `instr` and DuckDB
# `instr` agree); going through conv()/hex casts is not.
_BUCKET_EXPR = (
    "(instr('0123456789abcdef', substring(md5(concat('split:', cast(doc_id as string))), 1, 1)) - 1) * 16 "
    "+ instr('0123456789abcdef', substring(md5(concat('split:', cast(doc_id as string))), 2, 1)) - 1"
)


def _spread(docs: DataFrame) -> DataFrame:
    """Pre-explode rebalance of a small documents scan (measured 5.8s
    one-core stage vs 0.4s spread) — shared with the dedup family."""
    from mysql_cdc_spark.operators.dedup import spread_small_scan

    return spread_small_scan(docs)


def split_assign(docs: DataFrame) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    hash of the document id.

    Hash-based (not random) so the split is stable under reruns,
    repartitions, and incremental corpus growth — a doc never migrates
    between splits when new data arrives.  Narrow (no shuffle): one
    md5 + projection per row.
    """
    bucket = F.expr(_BUCKET_EXPR).cast("bigint")
    return docs.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_CUT, F.lit("train"))
        .when(bucket < VAL_CUT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


# Power-of-two token-length boundaries (lower bound of each bucket).
_LEN_BOUNDS = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096]


def _bucket_case(n_col: str) -> str:
    # Explicit CASE chain (not floor(log2(n))) so both engines compute
    # identical integer buckets with no float involvement.
    parts = []
    for lo, hi in zip(_LEN_BOUNDS, _LEN_BOUNDS[1:]):
        parts.append(f"WHEN {n_col} < {hi} THEN {lo}")
    return f"CASE WHEN {n_col} < 1 THEN 0 " + " ".join(parts) + f" ELSE {_LEN_BOUNDS[-1]} END"


def length_buckets(docs: DataFrame) -> DataFrame:
    """Per-(lang, power-of-two token-length bucket) doc and token
    totals — the histogram a sequence-packing/batching stage feeds on.
    One map-side-combined shuffle on a tiny key space."""
    toks = docs.select(
        "lang",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    bucketed = toks.withColumn("bucket", F.expr(_bucket_case("n_tokens")).cast("bigint"))
    return bucketed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


def pack_sequences(docs: DataFrame, capacity: int = 512) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in a
    deterministic global token stream (ordered by doc_id) and cut into
    fixed-`capacity` training sequences; each doc reports the sequence
    range it lands in.  This is the standard pretraining packing shape
    (docs may span sequence boundaries).

    The global token offset is the chunked distributed prefix scan
    (functions/scan.py) — the same machinery as transaction tagging,
    reused on a different domain; no single-task global window.  The
    rest is narrow arithmetic.
    """
    from mysql_cdc_spark.functions.scan import running_agg

    toks = docs.select(
        "doc_id",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    placed = running_agg(
        toks, "doc_id", "n_tokens", "tok_start", inclusive=False
    ).withColumn("tok_end", F.col("tok_start") + F.col("n_tokens"))
    return placed.select(
        "doc_id",
        "n_tokens",
        "tok_start",
        F.expr(f"tok_start div {capacity}").alias("seq_start"),
        # last token of the doc sits in this sequence (empty docs
        # degenerate to seq_start)
        F.expr(f"greatest(tok_end - 1, tok_start) div {capacity}").alias("seq_end"),
    )


def _reset_inherited_stats(df: DataFrame) -> DataFrame:
    """Rebuild `df` (which must already be localCheckpointed — i.e. a
    materialized LogicalRDD) as a fresh LogicalRDD WITHOUT the origin
    plan's inherited size estimate.

    Why (r12, found by the x100 sweep): `Dataset.localCheckpoint`
    truncates the PLAN but carries the origin plan's computed
    sizeInBytes onto the new leaf.  In a loop whose round references
    the previous round's result twice (the pointer-jump self-join
    below), the size-only stats visitor MULTIPLIES child sizes, so
    the inherited estimate SQUARES every round — its BigInteger digit
    count doubles, and by round ~20 Catalyst burns minutes per round
    in Toom-Cook multiplication of million-digit integers (measured:
    checkpoint wall 1.5 s → 2.9 → 5.2 → 11.8 → 29.5 → 83.9 s on the
    x100 fixture, pure driver CPU, zero tasks running).  Resetting
    the leaf to default stats pins planning cost per round; runtime
    join strategy is unaffected in practice because AQE re-plans from
    REAL shuffle sizes.

    Uses SparkSession.internalCreateDataFrame on the checkpointed
    RDD[InternalRow] (zero data movement, zero recompute — the RDD is
    already materialized).  Guarded: if the JVM surface ever changes,
    fall back to the un-reset frame (correctness is unaffected; only
    planning speed regresses)."""
    try:
        jdf = df._jdf
        spark = df.sparkSession
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception:  # noqa: BLE001 - private-API guard, see docstring
        return df


def duplicate_components(
    docs: DataFrame, pairs: DataFrame | None = None, max_iter: int = 25
) -> DataFrame:
    """Connected components over verified near-dup pairs: every doc
    gets a component label (the minimum doc_id reachable through dup
    edges; singletons label themselves), plus the component size and a
    canonical flag — the step that turns PAIRS into KEEP/DROP
    decisions for an actual dedup pass.

    Algorithm: iterative min-label propagation WITH pointer jumping.
    Each round is (a) one shuffle join (labels ⇢ neighbors) + a
    min-aggregate, then (b) a shortcut join label := label(label) —
    every doc re-points at its current label's own label, which can
    only be ≤ it.  Plain propagation needs diameter rounds (an
    adversarial path-shaped dup chain of length 10^6 would blow any
    iteration cap); the shortcut halves remaining path length every
    round, so convergence is O(log diameter) — the standard
    pointer-doubling bound from the PRAM/map-reduce CC literature
    (same effect as Kiveris et al.'s star contractions, one join
    simpler).  Near-dup clusters are small and dense in practice
    (diameter 1-3) where the shortcut is a no-op that costs one extra
    tiny join.  `localCheckpoint` truncates the plan lineage each
    round so the iteration count doesn't compound the DAG.
    Convergence is detected by a changed-label count — the one
    intentional driver-side scalar per round.

    CONF GUARD (r13): the loop opts its eager rounds OUT of the
    profile's AQE initial-partition amplification headroom
    (session.scale_profile).  That headroom exists for stages whose
    in-stage state is amplified past their shuffle input (pair
    producers); a CC round's joins carry the EDGE set, which only
    shrinks — so the extra initial buckets buy nothing and their
    per-stage overhead multiplies by O(log diameter) rounds × stages
    (measured: x100 semantic dedup 82.8 s at input-sized initials vs
    115.9 s with 2× headroom).  The loop executes eagerly
    (localCheckpoint per round), so pinning the conf for its duration
    and restoring after is sound.
    """
    if pairs is None:
        from mysql_cdc_spark.operators.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(docs)
    p = pairs.select("doc_a", "doc_b")
    spark = docs.sparkSession
    _init_key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    try:
        old_init = spark.conf.get(_init_key)
    except Exception:  # noqa: BLE001 - conf unset
        old_init = None
    try:
        spark.conf.set(_init_key, spark.conf.get("spark.sql.shuffle.partitions"))
        return _duplicate_components_loop(docs, p, max_iter)
    finally:
        if old_init is None:
            spark.conf.unset(_init_key)
        else:
            spark.conf.set(_init_key, old_init)


def _duplicate_components_loop(
    docs: DataFrame, p: DataFrame, max_iter: int
) -> DataFrame:
    # Checkpoint the PAIR set once, then derive the symmetric edge
    # list from the cached rows (r19 opt: the old form checkpointed
    # the doubled union, whose plan held the whole candidate+verify
    # pipeline TWICE — exchange reuse recovered only part of it;
    # measured 2.97 s vs 2.2 s for a single pipeline run at sf0.1).
    # The union itself stays lazy: each round's join re-shuffles the
    # edge side regardless (checkpoint partitioning is opaque to
    # Catalyst), so re-projecting the cached pair blocks per round is
    # the same work minus one up-front materialization of 2|E| rows.
    p_ck = p.localCheckpoint(eager=True)
    edges = p_ck.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(p_ck.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    labels = docs.select("doc_id", F.col("doc_id").alias("component")).localCheckpoint(
        eager=True
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        # `_prev` (r19 opt): carry the incoming label through the
        # round so convergence is a NARROW filter+count over the
        # checkpointed rows — the old form paid a full two-sided
        # shuffle join (new ⋈ old on doc_id) per round just to count
        # changes.  Label content is untouched; `_prev` is dropped
        # before the next round's joins.
        stepped = labels.join(nbr_min, labels.doc_id == nbr_min.src, "left").select(
            "doc_id",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
            F.col("component").alias("_prev"),
        )
        # pointer jumping: component := component's own component.
        # label(label) ≤ label always (labels are min-monotone), so
        # this only accelerates; on a path it halves the remaining
        # distance to the root each round.
        parent = stepped.select(
            F.col("doc_id").alias("p_id"), F.col("component").alias("p_comp")
        )
        # Lazy checkpoint (r19 opt): the `changed` count below is the
        # first action over the round's plan, so it both materializes
        # the checkpoint blocks and counts in ONE job — the old
        # eager-checkpoint + join-count pair was two jobs per round.
        new_labels = (
            stepped.join(parent, stepped.component == parent.p_id, "left")
            .select(
                "doc_id",
                F.coalesce(F.col("p_comp"), F.col("component")).alias("component"),
                "_prev",
            )
            .localCheckpoint(eager=False)
        )
        # without this, the inherited size estimate SQUARES per round
        # (self-join) and planning cost doubles — see _reset_inherited_stats
        new_labels = _reset_inherited_stats(new_labels)
        changed = new_labels.filter(F.col("component") != F.col("_prev")).count()
        labels = new_labels.drop("_prev")
        if changed == 0:
            break
    else:
        raise RuntimeError(f"label propagation did not converge in {max_iter} rounds")
    from pyspark.sql import Window

    size_w = Window.partitionBy("component")
    return labels.select(
        "doc_id",
        "component",
        F.count(F.lit(1)).over(size_w).cast("bigint").alias("component_size"),
        (F.col("doc_id") == F.col("component")).alias("is_canonical"),
    )


SAMPLE_CUT = 13  # of 256 → ~5.1% sample


def hash_sample(docs: DataFrame, cut: int = SAMPLE_CUT, salt: str = "sample") -> DataFrame:
    """Deterministic ~cut/256 sample of the corpus: keep documents
    whose salted-md5 bucket falls below `cut`.

    Hash-based (not rand()) for the same reason as split_assign: the
    sample is reproducible across reruns, executors, and partitionings,
    and it composes — a doc's membership never depends on what else is
    in the corpus, so incremental ingestion keeps the same sample.
    Narrow plan: one md5 + filter per row, fully pushed parallel scan.
    """
    bucket = (
        F.expr(
            f"(instr('0123456789abcdef', substring(md5(concat('{salt}:', cast(doc_id as string))), 1, 1)) - 1) * 16 "
            f"+ instr('0123456789abcdef', substring(md5(concat('{salt}:', cast(doc_id as string))), 2, 1)) - 1"
        )
    ).cast("bigint")
    return docs.select("doc_id", "lang", "source", bucket.alias("bucket")).where(
        F.col("bucket") < cut
    )


# Per-source mixture cuts on the 256-bucket hash space — the standard
# training-data "data mixture" step: curated sources kept whole,
# mid-tier sources downsampled, bulk web scraped sources thinned hard.
# Integer cuts (not float rates) keep the keep/drop decision exact on
# both engines.  Unknown sources default to 0 (dropped) — a new feed
# must be explicitly weighted before it can enter the mix.
MIXTURE_CUTS: dict[str, int] = {
    f"src{i}": (256 if i < 4 else 128 if i < 10 else 64 if i < 16 else 16)
    for i in range(20)
}


def _mixture_case() -> str:
    whens = " ".join(f"WHEN '{s}' THEN {c}" for s, c in sorted(MIXTURE_CUTS.items()))
    return f"CASE source {whens} ELSE 0 END"


def mixture_sample(docs: DataFrame, salt: str = "mix") -> DataFrame:
    """Deterministic weighted domain mixing: keep each document iff its
    salted-md5 bucket falls below its source's cut (cut/256 ≈ the
    source's sampling rate).

    The workhorse of corpus composition — e.g. keep 100% of curated
    sources but 6% of crawl — expressed so membership is a pure
    function of (doc_id, source): stable under reruns, repartitioning,
    and incremental ingestion, and trivially auditable (the bucket is
    returned).  Narrow, shuffle-free plan: one md5 + CASE + filter per
    row; the per-source cut is a constant-folded CASE, not a join.
    """
    bucket = F.expr(
        f"(instr('0123456789abcdef', substring(md5(concat('{salt}:', cast(doc_id as string))), 1, 1)) - 1) * 16 "
        f"+ instr('0123456789abcdef', substring(md5(concat('{salt}:', cast(doc_id as string))), 2, 1)) - 1"
    ).cast("bigint")
    return (
        docs.select(
            "doc_id",
            "source",
            bucket.alias("bucket"),
            F.expr(_mixture_case()).cast("bigint").alias("cut"),
        )
        .where(F.col("bucket") < F.col("cut"))
    )


def cross_dup_fraction(docs: DataFrame) -> DataFrame:
    """Per-document fraction of its distinct shingles that also occur
    in at least one OTHER document — the cross-document duplication
    score used to rank documents for substring-level dedup (a doc
    scoring ~1.0 is boilerplate or a copy; ~0.0 is unique text).

    Scale shape (r19): ONE shingling pass — `explode_outer` keeps
    zero-shingle docs — cached as the narrow (doc_id, shingle) stream,
    then ONE map-side-combined aggregation per shingle computing
    (document frequency, owner-if-unique).  A doc's duplicated-shingle
    count is derived by complement — n_dup = n_sh − #(its shingles
    with df == 1) — and a df==1 shingle's single owner IS its
    min(doc_id), so the per-doc unique counts come from the tiny
    df==1 slice (no document payload).  The old form ran the
    tokenize+shingle projection TWICE (sizes branch + cached inv) and
    joined the full inverted index back on the shingle key — a second
    data-sized shuffle plus a join; both are gone.  Equivalence is
    integer-exact and pinned by the llm_cross_dup oracle.
    """
    from mysql_cdc_spark.operators.dedup import with_shingles

    # cache(): the exploded stream feeds both the per-doc size count
    # and the document-frequency aggregation — one shingling pass.
    ex = (
        with_shingles(_spread(docs))
        .select("doc_id", F.explode_outer("shingles").alias("shingle"))
        .cache()
    )
    # count(shingle) skips the explode_outer NULL of a zero-shingle doc.
    sizes = ex.groupBy("doc_id").agg(F.count("shingle").alias("n_sh"))
    # Shingle sets are distinct within a doc, so COUNT(*) == document
    # frequency; min(doc_id) is the unique owner exactly when df == 1.
    per_sh = ex.filter(F.col("shingle").isNotNull()).groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("only_doc")
    )
    uniq_counts = (
        per_sh.filter(F.col("df") == 1)
        .groupBy("only_doc")
        .agg(F.count(F.lit(1)).alias("n_uniq"))
        .withColumnRenamed("only_doc", "doc_id")
    )
    n_dup = F.col("n_sh") - F.coalesce(F.col("n_uniq"), F.lit(0))
    return (
        sizes.join(uniq_counts, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_sh").cast("bigint").alias("n_shingles"),
            n_dup.cast("bigint").alias("n_shared"),
            F.when(F.col("n_sh") > 0, n_dup.cast("double") / F.col("n_sh").cast("double"))
            .otherwise(F.lit(0.0))
            .alias("shared_frac"),
        )
    )


def unigram_rarity(docs: DataFrame) -> DataFrame:
    """Corpus-statistics rarity score — the shuffle-based half of
    quality filtering (the per-doc classifier sees one document; this
    sees the whole corpus): mean corpus term-frequency of a doc's
    tokens.  Common-word soup scores high, rare/technical text scores
    low — a deterministic, integer-exact stand-in for the KenLM
    perplexity filter in CCNet-style pipelines (same join shape; a
    real LM table would broadcast or shuffle-join exactly like the
    vocab here).

    Scale shape: one map-side-combined count per token (vocab), one
    equi-join of the token stream back on the token key, one count
    per doc.  The token key is Zipf-skewed — stopwords are hot — so
    at 100 TB this is THE canonical AQE-skew-join case (or cap the
    vocab join with a frequency ceiling like the Jaccard dedup path);
    at bench SFs the vocab side broadcasts.  All-integer sums; the
    single IEEE op is the final mean division.
    """
    from mysql_cdc_spark.functions.text import with_tokens

    inv = with_tokens(docs).select("doc_id", F.explode("tokens").alias("token"))
    vocab = inv.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    return (
        inv.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("tf").cast("bigint").alias("sum_tf"),
        )
        .withColumn(
            "mean_tf", F.col("sum_tf").cast("double") / F.col("n_tokens").cast("double")
        )
    )


def stratified_sample(docs: DataFrame, cap: int = 20, salt: str = "strat") -> DataFrame:
    """Per-stratum quota sampling: at most `cap` docs per
    (lang, source), chosen by salted-md5 order — deterministic,
    rerun-stable, and unbiased within the stratum (hash order is
    corpus-order-independent).  Complements `mixture_sample`: rates
    vs exact quotas.

    Scale: one shuffle on the stratum key + a per-stratum top-`cap`
    window.  Catalyst rewrites rank-limit windows into
    WindowGroupLimit (per-partition partial top-k before the
    exchange), so a hot stratum ships only `cap` candidate rows per
    input partition, never its full contents.
    """
    order = F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang", "source").orderBy(order.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang", "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
    )


def source_overlap(docs: DataFrame) -> DataFrame:
    """Pairwise cross-source shingle overlap matrix: for every source
    pair (a < b), the distinct word-3-gram shingles they share and the
    Jaccard similarity of their shingle sets — the corpus-level
    redundancy report that tells a curation pipeline which source pairs
    to cross-deduplicate first.

    Scale shape (r19): the unit of aggregation is the DISTINCT
    (source, shingle) pair — bounded by |sources| × |vocab³|, not by
    document count.  One shingle-keyed aggregation collects each
    shingle's source SET (bounded by |sources| ≈ tens, so collect_set
    is a bounded buffer, never a doc-keyed blowup), per-source sizes
    fall out of the same pass via explode, and the pair counts come
    from expanding each set's a<b combinations IN the array (a pure
    codegen'd higher-order expression) followed by a map-side-combined
    count on the tiny pair key space.  The old form self-joined the
    inverted index on shingle — shuffling the data-sized inv TWICE
    (once per join side) plus a third time for sizes, behind a
    cache(); now inv is shuffled ONCE and never cached (plan: 7
    Exchange → 5, no data-sized join).  Equivalence is set-exact and
    pinned by the llm_source_overlap oracle.
    """
    from mysql_cdc_spark.operators.dedup import with_shingles

    inv = (
        with_shingles(_spread(docs))
        .select("source", F.explode("shingles").alias("shingle"))
    )
    # One pass: each shingle's distinct source set (collect_set is the
    # distinct — bounded by the source count).  cache(): consumed by
    # both the per-source sizes and the pair expansion — the shingling
    # pass and the shingle-keyed shuffle run once.
    sh_sources = inv.groupBy("shingle").agg(
        F.expr("sort_array(collect_set(source)) AS srcs")
    ).cache()
    sizes = (
        sh_sources.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
    )
    # a<b pair expansion inside the sorted array: pairs (srcs[i],
    # srcs[j]) for i<j — the same rows the shingle self-join produced.
    inter = (
        sh_sources.select(
            F.expr(
                "explode(flatten(transform(srcs, (x, i) -> "
                "transform(slice(srcs, i + 2, size(srcs)), y -> "
                "struct(x AS source_a, y AS source_b))))) AS p"
            )
        )
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


def zipf_slope(docs: DataFrame) -> DataFrame:
    """Zipf-law fit over the corpus unigram distribution: the OLS slope
    of ln(frequency) on ln(rank) (Zipf's law predicts ≈ −1; a much
    flatter slope flags synthetic or templated text — a corpus-level
    quality signal).

    Plan: explode tokens → map-side-combined frequency count (the only
    data-sized shuffle), then rank + regression over the VOCABULARY
    (tiny relative to the corpus — the window and regr_slope run on
    |vocab| rows). Rank ties broken by token so both engines rank
    identically; the slope is rounded to 6 decimals because the OLS
    accumulation order differs between engines (error ~1e-14, far
    below the rounding grain).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    ranked = freq.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("freq").desc(), F.col("tok"))),
    )
    return ranked.agg(
        F.round(F.regr_slope(F.log("freq"), F.log("rank")), 6).alias("zipf_slope"),
        F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
        F.sum("freq").cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# Probability-proportional-to-size (πps) weighted sampling
# ---------------------------------------------------------------------------

# Poisson πps sampling with exact integer comparisons: document i is
# kept iff  hash_i < min(M, RATE_NUM * w_i)  where hash_i is uniform on
# [0, M) from 6 salted md5 hex digits (M = 16^6) and w_i = max(1,
# n_chars).  Inclusion probability is therefore exactly
# min(M, RATE_NUM*w_i)/M — no floats anywhere in the keep/drop
# decision, so Spark and the oracle agree bit-for-bit, and membership
# is per-doc and content-independent (stable under reruns, executors,
# and incremental corpus growth, like split_assign/hash_sample).
PPS_M = 16 ** 6
PPS_RATE_NUM = 16384  # ≈0.29 inclusion at the fixture's ~300-char mean


def _hex_bucket6(salted: str) -> str:
    """Engine-neutral SQL for int(first 6 hex digits of md5(salted)).
    `salted` is a SQL string expression; instr-based digit parse works
    identically in Spark SQL and DuckDB (see _BUCKET_EXPR)."""
    digits = " + ".join(
        f"(instr('0123456789abcdef', substring(md5({salted}), {i + 1}, 1)) - 1) * {16 ** (5 - i)}"
        for i in range(6)
    )
    return f"({digits})"


def weighted_sample(docs: DataFrame, rate_num: int = PPS_RATE_NUM) -> DataFrame:
    """Weighted (length-proportional) corpus sample with exact
    Horvitz–Thompson reweighting.

    The standard curation move "sample long documents preferentially"
    done as Poisson πps: keep-probability ∝ doc length, capped at 1.
    `ht_weight` = M / min(M, rate*w) is the inverse inclusion
    probability — downstream token counts weighted by it are unbiased
    estimates of the full-corpus counts.  The division is one IEEE op
    on exact integers (correctly rounded, engine-identical).

    Narrow plan: md5 + integer compare per row, no shuffle; the filter
    sits against the scan.
    """
    salted = "concat('pps:', cast(doc_id as string))"
    bucket = F.expr(_hex_bucket6(salted)).cast("bigint")
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("bigint")
    cut = F.least(F.lit(PPS_M).cast("bigint"), F.lit(rate_num) * w)
    return (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            bucket.alias("bucket"),
            cut.alias("cut"),
        )
        .where(F.col("bucket") < F.col("cut"))
        .withColumn(
            "ht_weight", F.lit(float(PPS_M)) / F.col("cut").cast("double")
        )
    )


# ---------------------------------------------------------------------------
# Output shard planning
# ---------------------------------------------------------------------------

SHARD_TARGET_CHARS = 8192


def shard_plan(docs: DataFrame, target_chars: int = SHARD_TARGET_CHARS) -> DataFrame:
    """Plan fixed-size output shards: documents are laid out in doc_id
    order, cut every `target_chars` characters (a doc belongs to the
    shard its FIRST character lands in), and rolled up to one planning
    row per shard — the step that decides output file boundaries when
    writing a curated corpus, sized so every file lands near the
    parquet sweet spot instead of the small-file swamp.

    The running character offset is the chunked distributed prefix scan
    (functions/scan.py — no single-task global window); the rollup is
    one map-side-combined aggregate over shard ids.
    """
    from mysql_cdc_spark.functions.scan import running_agg

    sized = docs.select("doc_id", F.col("n_chars").cast("bigint").alias("n_chars"))
    placed = running_agg(sized, "doc_id", "n_chars", "char_start", inclusive=False)
    return (
        placed.select(
            "doc_id",
            "n_chars",
            F.expr(f"char_start div {target_chars}").alias("shard_id"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("shard_chars"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Overlapping chunking (RAG / long-context prep)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def chunk_overlap(
    docs: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Sliding-window chunking: each document yields chunks of `size`
    tokens every `stride` tokens (overlap = size − stride) — the
    retrieval-corpus prep step.  A doc emits ceil(n/stride) chunks
    (every token appears in ≥1 chunk; the tail chunk may be short).

    Narrow plan: token count + sequence() explode per row, no shuffle;
    chunk math is all integer."""
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("bigint").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    starts = F.expr(f"sequence(cast(0 as bigint), n_tokens - 1, {stride})")
    return toks.select(
        "doc_id",
        "n_tokens",
        F.posexplode(starts).alias("chunk_id", "tok_start"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "tok_start",
        F.least(F.col("tok_start") + size, F.col("n_tokens")).alias("tok_end"),
        (F.least(F.col("tok_start") + size, F.col("n_tokens")) - F.col("tok_start")).alias(
            "chunk_tokens"
        ),
    )


def incremental_components(
    base_docs: DataFrame,
    delta_docs: DataFrame,
    base_labels: DataFrame | None = None,
) -> DataFrame:
    """Incrementally-maintained duplicate components: fold a DELTA
    batch into an already-componentized BASE corpus without re-running
    components over the full pair set — the companion to
    `dedup.incremental_neardup` for growing a deduped corpus.

    `base_labels` is the persisted (doc_id, component) labeling from
    the PREVIOUS run — the component analog of the persisted LSH index
    `incremental_neardup`'s contract describes.  With it supplied, the
    job never touches base-corpus pair generation: base docs appear
    only as (a) the LSH index the delta probes (O(delta) candidates)
    and (b) one relabel join — so cost is O(delta + touched
    components), matching this docstring's claim.  When omitted, the
    labels are derived in-job (a full base LSH + CC pass — convenience
    wrapper for one-shot runs and the oracle query, NOT the
    production shape).

    Algorithm (graph condensation — the standard incremental-CC
    shape): the base corpus' components collapse to single condensed
    nodes; only the NEW edges (delta-internal near-dup pairs + the
    delta→base matches from the incremental LSH probe) are mapped
    through the existing labels, components run on that TINY condensed
    graph, and the result relabels everyone via one join.

    Correctness contract (pinned by the oracle): the base-internal /
    delta-internal / cross pair sets partition exactly the full-corpus
    LSH pair set (signatures are per-doc and banding is an equi-join),
    so the incremental labeling must equal a from-scratch components
    run over the whole corpus — which is literally what the oracle
    recomputes.
    """
    from mysql_cdc_spark.operators.dedup import (
        incremental_neardup,
        minhash_lsh_pairs,
    )

    if base_labels is None:
        base_labels = duplicate_components(base_docs, minhash_lsh_pairs(base_docs))
    seeds = base_labels.select("doc_id", "component").unionByName(
        delta_docs.select("doc_id", F.col("doc_id").alias("component"))
    )

    cross = incremental_neardup(base_docs, delta_docs).select(
        F.col("delta_id").alias("doc_a"), F.col("base_id").alias("doc_b")
    )
    delta_internal = minhash_lsh_pairs(delta_docs).select("doc_a", "doc_b")
    new_edges = cross.unionByName(delta_internal)

    lab = seeds.withColumnRenamed("doc_id", "k").withColumnRenamed("component", "lab")
    cond_pairs = (
        new_edges.join(lab, new_edges.doc_a == lab.k)
        .select(F.col("lab").alias("ca"), "doc_b")
        .join(lab, F.col("doc_b") == lab.k)
        .select(
            F.least("ca", "lab").alias("doc_a"),
            F.greatest("ca", "lab").alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
        # Materialize ONCE (r19 opt): cond_pairs' lineage holds the
        # delta LSH + incremental cross-probe + label-mapping joins;
        # without this checkpoint that pipeline executed TWICE — once
        # under the CC loop's own pair checkpoint and again under
        # cond_nodes' distinct (measured: the condensed CC phase was
        # 5.97 s of the 7.07 s fold at sf0.1, dominated by the re-run).
        .localCheckpoint(eager=True)
    )
    cond_nodes = (
        cond_pairs.select(F.col("doc_a").alias("doc_id"))
        .union(cond_pairs.select("doc_b"))
        .distinct()
    )
    cond_comp = duplicate_components(cond_nodes, cond_pairs).select(
        F.col("doc_id").alias("old_label"), F.col("component").alias("new_label")
    )

    merged = (
        seeds.join(cond_comp, seeds.component == cond_comp.old_label, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("new_label"), F.col("component")).alias("component"),
        )
    )
    size_w = Window.partitionBy("component")
    return merged.select(
        "doc_id",
        "component",
        F.count(F.lit(1)).over(size_w).cast("bigint").alias("component_size"),
        (F.col("doc_id") == F.col("component")).alias("is_canonical"),
    )


def corpus_diff(old_docs: DataFrame, new_docs: DataFrame) -> DataFrame:
    """Dataset-versioning diff between two corpus snapshots: one row
    per doc_id present in either version, labeled
    added / removed / changed / unchanged by CONTENT (md5 of the
    normalized text), with both versions' char counts.  The audit
    step between crawl refreshes — what changed, what churned, how
    much of the corpus is stable — that any production training-data
    pipeline runs before retraining on a new snapshot.

    Spark shape: each side reduces to (doc_id, content hash, n_chars)
    map-side, then ONE full-outer shuffle join on doc_id decides the
    status per key — no content ever crosses the shuffle (hashes
    only), so the exchange is a few dozen bytes per doc regardless of
    document size.  At 100 TB both snapshots would be bucketed by
    doc_id so repeated diffs (every refresh) skip the shuffle
    entirely — same co-location argument as apply_changes.
    """
    def keyed(docs: DataFrame, side: str) -> DataFrame:
        return docs.select(
            "doc_id",
            F.md5(F.lower(F.trim(F.col("text")))).alias(f"{side}_hash"),
            F.col("n_chars").cast("bigint").alias(f"{side}_chars"),
        )

    o = keyed(old_docs, "old")
    n = keyed(new_docs, "new")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        o.join(n, "doc_id", "full_outer")
        .select(
            "doc_id",
            status.alias("status"),
            "old_chars",
            "new_chars",
        )
    )


def truncate_docs(docs: DataFrame, max_tokens: int = 4096) -> DataFrame:
    """Length-cap guard: documents over `max_tokens` whitespace tokens
    are truncated to exactly `max_tokens` (token-aligned, single
    spaces after normalization).  The pathological-row mitigation for
    every token-array operator in this repo: one multi-GB document is
    a single UNSPLITTABLE row — its token array lands in one task's
    memory no matter how the table is partitioned — so a real
    pipeline caps length before tokenization-heavy stages (shingles,
    spans, signatures) and keeps the tail auditable via the
    was_truncated flag.  Narrow plan: split + slice + rejoin per row,
    no shuffle.
    """
    toks = docs.withColumn(
        "_toks", F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    )
    return toks.select(
        "doc_id",
        F.size("_toks").cast("bigint").alias("n_tokens"),
        (F.size("_toks") > max_tokens).alias("was_truncated"),
        F.when(
            F.size("_toks") > max_tokens,
            F.array_join(F.slice("_toks", 1, max_tokens), " "),
        )
        .otherwise(F.array_join("_toks", " "))
        .alias("text"),
        F.least(F.size("_toks").cast("bigint"), F.lit(max_tokens).cast("bigint")).alias(
            "kept_tokens"
        ),
    )
