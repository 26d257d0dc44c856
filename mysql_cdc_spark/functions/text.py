"""Text-analysis operators over the `documents` table — the
LLM-training-data half of the engine (BASELINE north star; the
reference itself has no text ops, so these are designed Spark-first).

Everything here is built from JVM-side `pyspark.sql.functions` only —
no Python UDFs — so the hot path stays inside whole-stage codegen and
scales linearly with input splits.  Per-document features use
array-expression pipelines (`transform`/`filter`/`aggregate`) instead
of explode+groupBy wherever the aggregation is row-local: no shuffle at
all for stats/fingerprints/lang-id; corpus-level aggregates (top
n-grams) are one explode + one map-side-combined shuffle.

Determinism contract (oracle = DuckDB on the same parquet):
- tokenization = ``regexp_split(lower(trim(text)), '\\s+')`` on both
  engines;
- ratios are single IEEE double divisions of exact integer counts —
  bit-identical across engines, no rounding needed;
- fingerprints are lexicographic MINs of lowercase-hex md5 strings —
  engine-neutral (ASCII collation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lexicons for the n-gram/stopword lang-id
# heuristic.  Chosen public top-frequency function words; the heuristic
# is deterministic, which is what the oracle checks — accuracy is data-
# dependent (the synthetic fixture uses one shared vocabulary).
LEXICONS = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "fr": ("le", "la", "les", "et", "un", "une", "du"),
    "de": ("der", "die", "das", "und", "ein", "nicht"),
    "es": ("el", "los", "las", "y", "que", "por"),
}

STOPWORDS = LEXICONS["en"] + ("it", "for", "on")

# "BPE-ish" word-piece pattern: runs of alphanumerics or single
# non-space symbols — a cheap proxy for subword token counting.
# (No backslash classes: the pattern is embedded in SQL string
# literals on both engines, which escape backslashes differently.)
BPE_PATTERN = "[a-z0-9]+|[^a-z0-9 ]"


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def with_tokens(docs: DataFrame) -> DataFrame:
    """Append the canonical `tokens` array (whitespace tokenization of
    lowercased text — the shared contract with every oracle)."""
    return docs.withColumn("tokens", F.split(F.lower(F.trim(F.col("text"))), r"\s+"))


def doc_stats(docs: DataFrame) -> DataFrame:
    """Per-document size/diversity stats — narrow, shuffle-free."""
    return with_tokens(docs).select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size("tokens").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).cast("bigint").alias("n_distinct_tokens"),
        # Single double division of exact ints — bit-identical to the oracle.
        (
            F.expr("aggregate(tokens, 0L, (acc, x) -> acc + length(x))").cast("double")
            / F.size("tokens").cast("double")
        ).alias("avg_token_len"),
        (
            F.size(F.array_distinct("tokens")).cast("double")
            / F.size("tokens").cast("double")
        ).alias("type_token_ratio"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality scoring: stopword ratio, alpha-token ratio,
    length band — the standard cheap pre-filters of a training-data
    pipeline.  All components are exact-count divisions; the composite
    is a fixed linear combination evaluated identically by the oracle.
    """
    toks = with_tokens(docs)
    n = F.size("tokens").cast("double")
    n_stop = F.expr(
        f"size(filter(tokens, x -> x in ({_sql_list(STOPWORDS)})))"
    ).cast("double")
    n_alpha = F.expr("size(filter(tokens, x -> x rlike '^[a-z]+$'))").cast("double")
    stop_ratio = n_stop / n
    alpha_ratio = n_alpha / n
    len_ok = ((F.size("tokens") >= 20) & (F.size("tokens") <= 1000)).cast("int").cast("double")
    return toks.select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        len_ok.alias("length_ok"),
        (stop_ratio * F.lit(0.3) + alpha_ratio * F.lit(0.5) + len_ok * F.lit(0.2)).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Language-ID heuristic: CJK script check, else stopword-lexicon
    argmax with a fixed tie-break cascade (en > fr > de > es)."""
    toks = with_tokens(docs)
    score = {
        lang: F.expr(f"size(filter(tokens, x -> x in ({_sql_list(words)})))")
        for lang, words in LEXICONS.items()
    }
    has_cjk = F.col("text").rlike("[\\x{4e00}-\\x{9fff}]")
    pred = (
        F.when(has_cjk, F.lit("zh"))
        .when(
            (score["en"] >= score["fr"]) & (score["en"] >= score["de"]) & (score["en"] >= score["es"]),
            F.lit("en"),
        )
        .when((score["fr"] >= score["de"]) & (score["fr"] >= score["es"]), F.lit("fr"))
        .when(score["de"] >= score["es"], F.lit("de"))
        .otherwise(F.lit("es"))
    )
    return toks.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("agrees"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting per source: whitespace tokens and a BPE-ish
    word-piece regex count — one tiny-key shuffle."""
    toks = with_tokens(docs).select(
        "source",
        F.size("tokens").alias("ws"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{BPE_PATTERN}', 0)")).alias("bpe"),
        F.length("text").alias("chars"),
    )
    return toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ws").cast("bigint").alias("ws_tokens"),
        F.sum("bpe").cast("bigint").alias("bpe_tokens"),
        F.sum("chars").cast("bigint").alias("total_chars"),
        (F.sum("ws").cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_ws_tokens"),
    )


def top_ngrams(docs: DataFrame, n: int = 3, k: int = 20) -> DataFrame:
    """Corpus top-k word n-grams: per-row n-gram arrays (no
    intermediate shuffle), one explode, one map-side-combined count,
    TakeOrdered top-k with a total order (count desc, ngram asc)."""
    # Guarded: Spark's sequence(1, k) DESCENDS for k < 1, so short rows
    # must yield an empty array, not a bogus descending range.  The
    # gram string is built AFTER the explode as a top-level codegen
    # scalar — building it inside a transform() lambda runs on the
    # interpreted higher-order path (the r10 dup_span_ranges finding).
    grams = with_tokens(docs).select(
        "tokens",
        F.explode(
            F.expr(
                f"case when size(tokens) >= {n} then "
                f"sequence(1, size(tokens) - {n - 1}) else array() end"
            )
        ).alias("i"),
    ).select(F.expr(f"concat_ws(' ', slice(tokens, i, {n}))").alias("ngram"))
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram"))
        .limit(k)
    )


def fingerprints(docs: DataFrame, shingle: int = 8, seeds: int = 4) -> DataFrame:
    """Document fingerprinting: minhash over character shingles.

    ONE md5 per shingle position, sliced into `seeds` disjoint
    8-hex-digit (32-bit) sub-hashes; fp_s = MIN over shingles of slice
    s (the one-hash minhash trick, as in operators/dedup.py) — a
    rolling-window signature computed entirely as array expressions
    (`transform` + `array_min`): no explode, no shuffle, one codegen
    stage.  Lowercase-hex MIN is engine-neutral.
    """
    if seeds > 4:
        raise ValueError("md5 slicing supports at most 4 32-bit sub-hashes")
    from mysql_cdc_spark.operators.dedup import spread_small_scan

    # Narrow but CPU-heavy (~one md5 per character): a single-split
    # scan would serialize the whole corpus onto one core.
    docs = spread_small_scan(docs)
    t = F.lower(F.trim(F.col("text")))
    span = f"greatest(length(t) - {shingle - 1}, 1)"
    out = docs.select("doc_id", t.alias("t")).withColumn(
        "hashes",
        F.expr(f"transform(sequence(1, {span}), i -> md5(substring(t, i, {shingle})))"),
    )
    for s in range(seeds):
        out = out.withColumn(
            f"fp{s}",
            F.expr(f"array_min(transform(hashes, h -> substring(h, {8 * s + 1}, 8)))"),
        )
    return out.drop("t", "hashes")


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style intra-document repetition: over ALL word 3-grams
    (not the distinct set), the fraction of occurrences that are
    repeats of an earlier gram — `1 - distinct/total`.  High values
    flag degenerate/boilerplate text (lyrics loops, template spam)
    that per-corpus dedup can't see because the repetition is inside
    one document.

    Shuffle-free: the gram list, its distinct set, and the division
    are array expressions per row; the only IEEE op is one division of
    two exact integers.  Empty gram lists (< 3 tokens) score 0.0 by
    convention on both engines.
    """
    grams = (
        "case when size(tokens) >= 3 then transform(sequence(1, size(tokens) - 2), "
        "i -> concat(tokens[i - 1], ' ', tokens[i], ' ', tokens[i + 1])) "
        "else array() end"
    )
    return (
        with_tokens(docs)
        .withColumn("grams", F.expr(grams))
        .select(
            "doc_id",
            F.size("grams").cast("bigint").alias("n_grams"),
            F.size(F.array_distinct(F.col("grams"))).cast("bigint").alias("n_distinct"),
        )
        .withColumn(
            "dup_frac",
            F.when(
                F.col("n_grams") > 0,
                (F.col("n_grams") - F.col("n_distinct")).cast("double")
                / F.col("n_grams").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


def hex_int_sql(expr: str, start: int, n: int) -> str:
    """SQL for parsing `n` hex chars of string expression `expr`
    (1-based `start`) into an integer — built from instr/substring
    only, which behave identically in Spark SQL and DuckDB, so the
    SAME generated text runs on both engines (the contract every
    hash-derived score here relies on)."""
    terms = [
        f"(instr('0123456789abcdef', substring({expr}, {start + i}, 1)) - 1) * {16 ** (n - 1 - i)}"
        if i < n - 1
        else f"(instr('0123456789abcdef', substring({expr}, {start + i}, 1)) - 1)"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


#: Hashed-feature dimensionality and weight range of the stand-in
#: linear quality model (see quality_classifier).
CLASSIFIER_DIM = 1024
CLASSIFIER_WEIGHT_MOD = 2001  # weights span [-1000, 1000]


def classifier_weight_sql(token_expr: str) -> str:
    """Per-token weight of the hashed linear model, as engine-neutral
    SQL: feature bucket = 16 md5 bits mod CLASSIFIER_DIM (the hashing
    trick — colliding tokens share a weight), weight = 16 bits of the
    bucket's own md5 mod CLASSIFIER_WEIGHT_MOD, centered."""
    bucket = f"({hex_int_sql(f'md5({token_expr})', 1, 4)} % {CLASSIFIER_DIM})"
    wh = "md5(concat('w:', cast(" + bucket + " as string)))"
    return f"({hex_int_sql(wh, 1, 4)} % {CLASSIFIER_WEIGHT_MOD} - 1000)"


def classifier_weights() -> list[int]:
    """The model's full weight table, bucket id → weight — the same
    md5 derivation as `classifier_weight_sql`, evaluated once in
    Python (CLASSIFIER_DIM entries; value parity with the SQL form is
    pinned by tests/test_text_functions.py)."""
    import hashlib

    return [
        int(hashlib.md5(f"w:{b}".encode()).hexdigest()[:4], 16)
        % CLASSIFIER_WEIGHT_MOD
        - 1000
        for b in range(CLASSIFIER_DIM)
    ]


def classifier_weight_spark(token_expr: str) -> str:
    """Spark-side weight lookup, value-identical to
    `classifier_weight_sql` (r19 optimization, same pattern as the
    sketch family's conv() forms): the engine-neutral instr-chain form
    inlines `md5(token)` once per hex digit — ~20 md5 evaluations per
    token once the weight md5 re-inlines the bucket — and Catalyst's
    subexpression elimination does not reach inside array-lambda
    bodies.  Here the token md5 is parsed with ONE conv() and the
    1024-entry weight table (a pure function of the bucket id) is a
    folded array literal, so the per-token cost is one md5 + one
    element_at.  The instr form stays the definition for DuckDB
    oracle SQL."""
    w = ", ".join(str(v) for v in classifier_weights())
    bucket = (
        f"cast(conv(substring(md5({token_expr}), 1, 4), 16, 10) as bigint)"
        f" % {CLASSIFIER_DIM}"
    )
    return f"element_at(array({w}), cast({bucket} as int) + 1)"


def quality_classifier(docs: DataFrame) -> DataFrame:
    """fastText-style hashed linear classifier over the token stream:
    logit = Σ_tokens weight[md5-bucket(token)], keep = logit ≥ 0.

    The weights here are pseudo-random integers derived from the
    bucket's md5 — a deterministic stand-in for trained parameters
    (the container has no model artifacts); the EXECUTION shape is
    the real contract: per-doc scoring is a pure array expression —
    two md5s per token, integer sum, zero shuffles, zero Python — so
    swapping in trained weights (a broadcast 1024-entry map) changes
    nothing about the plan.  Exact: the logit is a BIGINT sum, the
    keep decision an integer comparison — bit-identical on any
    engine, no sigmoid needed for a threshold test.
    """
    # Spark-side conv + folded-weight-table form (value-identical to
    # classifier_weight_sql — see classifier_weight_spark docstring).
    w = classifier_weight_spark("t")
    # single flat fold: the earlier transform-then-aggregate pair ran
    # TWO interpreted lambda passes over every token array — and the
    # fold result is named once so `keep` reuses it instead of folding
    # the whole array a second time (r19).
    logit = f"aggregate(tokens, 0L, (acc, t) -> acc + cast({w} as bigint))"
    return with_tokens(docs).select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tokens"),
        F.expr(logit).alias("logit"),
    ).withColumn("keep", F.col("logit") >= 0)


def bigram_lm(docs: DataFrame, min_count: int = 5) -> DataFrame:
    """Corpus bigram language model: conditional continuation
    probability P(w2 | w1) = c(w1,w2) / Σ_x c(w1,x), estimated from
    the whole corpus — the statistical core of n-gram LM scoring and
    of phrase-mining (a bigram whose continuation probability is high
    is a collocation).  The denominator is derived from the bigram
    table itself (sum over continuations), so the corpus is read
    ONCE.

    Scale shape: one explode of per-row bigram arrays → map-side-
    combined count on (w1, w2) → an unordered window sum partitioned
    by w1 (second shuffle, on the lighter already-aggregated table).
    Zipf skew on w1 is bounded by the vocabulary's continuation
    fan-out, not the token stream.  All counts are BIGINT; the single
    IEEE op is the final division.
    """
    grams = with_tokens(docs).select(
        F.explode(
            F.expr(
                "case when size(tokens) >= 2 then "
                "transform(sequence(1, size(tokens) - 1), "
                "i -> struct(tokens[i - 1] as w1, tokens[i] as w2)) "
                "else array() end"
            )
        ).alias("bg")
    )
    counts = grams.select("bg.w1", "bg.w2").groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("w1")
    return (
        counts.withColumn("c1", F.sum("c").over(w).cast("bigint"))
        .filter(F.col("c") >= min_count)
        .select(
            "w1",
            "w2",
            "c",
            "c1",
            (F.col("c").cast("double") / F.col("c1").cast("double")).alias("cond_p"),
        )
    )


def lm_perplexity(
    docs: DataFrame,
    ref: DataFrame,
    head_ppl: float = 30.0,
    tail_ppl: float = 300.0,
) -> DataFrame:
    """CCNet-style LM quality filter: score every document's bigram
    perplexity under a language model trained on a high-quality
    reference subcorpus, then bucket head / middle / tail (Wenzek et
    al., "CCNet: Extracting High Quality Monolingual Datasets from
    Web Crawl Data", LREC 2020 — there a 5-gram KenLM over Wikipedia;
    here an add-one-smoothed bigram LM, which keeps every probability
    a closed-form ratio of exact BIGINT counts so a SQL oracle can
    reproduce the scores bit-for-bit).

        p(w2|w1) = (c(w1,w2) + 1) / (c1(w1) + V)

    with c1(w1) = Σ_x c(w1,x) over the reference corpus and V its
    unigram vocabulary size; unseen w1 degrades to the uniform 1/V.
    Per-bigram log-probs are rounded to DECIMAL(18,6) BEFORE the
    per-document sum, so the fold is order-independent (the same
    determinism contract as the TF-IDF/BM25 operators).

    Scale shape: the LM is two map-side-combined groupBys over the
    REFERENCE corpus only (bigram counts + continuation sums); the
    scoring pass joins the full corpus token stream against the LM on
    (w1, w2) then on w1 — Zipf-skewed keys, handled by AQE skew-join
    splitting; when the bigram table fits the broadcast threshold
    Catalyst broadcasts it and the scoring pass is shuffle-free.
    Documents with fewer than 2 tokens emit n_bigrams=0 and a NULL
    perplexity ('unscored' bucket) rather than vanishing.
    """
    def doc_bigrams(d: DataFrame) -> DataFrame:
        return with_tokens(d).select(
            "doc_id",
            F.explode_outer(
                F.expr(
                    "case when size(tokens) >= 2 then "
                    "transform(sequence(1, size(tokens) - 1), "
                    "i -> struct(tokens[i - 1] as w1, tokens[i] as w2)) "
                    "else array() end"
                )
            ).alias("bg"),
        ).select("doc_id", "bg.w1", "bg.w2")

    ref_toks = with_tokens(ref).select(F.explode("tokens").alias("tok"))
    vocab = ref_toks.agg(F.countDistinct("tok").cast("bigint").alias("v"))

    ref_bg = doc_bigrams(ref).where(F.col("w1").isNotNull())
    counts = ref_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    c1 = counts.groupBy("w1").agg(F.sum("c").cast("bigint").alias("c1"))

    scored = (
        doc_bigrams(docs)
        .join(counts, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.when(
                F.col("w1").isNull(), F.lit(None).cast("decimal(18,6)")
            ).otherwise(
                F.round(
                    F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
                    ),
                    6,
                ).cast("decimal(18,6)")
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("logp").cast("bigint").alias("n_bigrams"),
        F.sum("logp").alias("sum_logp"),
    )
    ppl = F.round(
        F.exp(-(F.col("sum_logp").cast("double") / F.col("n_bigrams").cast("double"))), 4
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        # DOUBLE for transport: the decimal-summed value is exact at 6 dp,
        # so both engines land on the identical nearest double.
        F.col("sum_logp").cast("double").alias("sum_logp"),
        F.when(F.col("n_bigrams") > 0, ppl).alias("ppl"),
        F.when(F.col("n_bigrams") == 0, F.lit("unscored"))
        .when(ppl <= F.lit(head_ppl), F.lit("head"))
        .when(ppl > F.lit(tail_ppl), F.lit("tail"))
        .otherwise(F.lit("middle"))
        .alias("bucket"),
    )
