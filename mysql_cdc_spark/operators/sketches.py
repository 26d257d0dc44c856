"""Deterministic cardinality sketches: HyperLogLog and KMV
(k-minimum-values), built so Spark and the DuckDB oracle produce
BIT-IDENTICAL results.

Sketches are the scale path for distinct-count questions: an exact
COUNT(DISTINCT x) over 100 TB shuffles every distinct value; an HLL
shuffles at most `m` (here 1024) register rows and is mergeable across
partitions, days, and tables (register-wise MAX).  The reference
engine has no aggregation at all (reference src/cdc/jdbc.clj:524);
Spark's built-in approx_count_distinct is a non-portable HLL++ whose
estimate no oracle can reproduce — so this module rebuilds the
classic Flajolet HLL from public formulas with three determinism
rules:

1. the hash is md5 (identical on both engines), parsed hex-digit by
   hex-digit with `instr` (the engine-neutral parse — conv()/hex
   casts are not portable to DuckDB; the SPARK side evaluates the
   value-identical conv() fast forms, `*_spark` below, r19);
2. register math is pure integer: rho via the bit-length of a 52-bit
   value (`length(bin(v))` / `length(printf('%b', v))`), the register
   sum as SUM(1 << (50 - rho)) in BIGINT — no float accumulation
   whose ordering could differ;
3. the estimate applies ONE float operation at the end — a division
   of an embedded double literal by the integer register sum — so the
   raw-HLL estimate alpha*m^2/sum(2^-M_j) is reproduced exactly.
   (The low-cardinality linear-counting branch needs ln(), which is
   not guaranteed bit-identical across libm builds, so it is
   deliberately omitted; below ~2.5m distinct the estimate is biased,
   as documented by Flajolet et al. — acceptable for a scale
   estimator, and the determinism contract is kept.)

KMV keeps the k smallest distinct 52-bit hash values; the estimate
(k-1) * 2^52 / kth_min is again a single division of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"

HLL_B = 10            # register index bits
HLL_M = 1 << HLL_B    # 1024 registers — small enough that the raw
# estimator (no linear-counting branch, see module docstring) is in
# its accurate regime (n >= 2.5m) from the correctness-gate SF up;
# relative error ~1.04/sqrt(m) ≈ 3.2%.
RHO_CAP = 50          # cap so SUM(1 << (50 - rho)) fits in BIGINT
KMV_K = 512

# alpha_m * m^2 * 2^50, embedded as ONE double literal in both
# engines (the numerator of the final division).
_ALPHA_M2_SHIFT = repr(0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M * float(1 << RHO_CAP))
# (KMV_K - 1) * 2^52: exactly representable in a double (9-bit mantissa).
_KMV_NUM = repr(float(KMV_K - 1) * float(1 << 52))


def _digit(col: str, i: int) -> str:
    """0..15 value of 1-indexed hex digit i of column `col` (BIGINT,
    so the 16^k place-value products never overflow 32-bit ints)."""
    return f"CAST(instr('{_HEX}', substring({col}, {i}, 1)) - 1 AS BIGINT)"


def bucket_expr(col: str = "h") -> str:
    """First 3 hex digits (12 bits) -> register index 0..m-1."""
    return f"(({_digit(col, 1)} * 256 + {_digit(col, 2)} * 16 + {_digit(col, 3)}) % {HLL_M})"


def v52_expr(col: str = "h", skip: int = 3) -> str:
    """Hex digits skip+1..skip+13 -> 52-bit integer (exact in BIGINT)."""
    terms = [
        f"{_digit(col, skip + 1 + j)} * {16 ** (12 - j)}" for j in range(13)
    ]
    return "(" + " + ".join(terms) + ")"


# Spark-side fast forms (r19 optimization): Spark has conv(str, 16, 10)
# — ONE expression replaces the 16-instr()-per-digit chain, value-
# identical on every hex input (pinned by test_sketches'
# conv/instr-parity property test and by every sk_* oracle gate, whose
# DuckDB side still evaluates the portable instr form).  The engine-
# neutral originals above remain THE definition for oracle SQL; these
# exist because the instr chain measured 2.4x the wall of the whole
# sk_hll query (0.80 s -> 0.34 s at sf0.1 after the switch — the
# per-row expression tree shrank from ~64 instr+substring calls to 2
# conv+substring).
def bucket_expr_spark(col: str = "h") -> str:
    """`bucket_expr`, Spark-only: one conv() of the first 3 hex digits."""
    return f"(CAST(conv(substring({col}, 1, 3), 16, 10) AS BIGINT) % {HLL_M})"


def v52_expr_spark(col: str = "h", skip: int = 3) -> str:
    """`v52_expr`, Spark-only: one conv() of 13 hex digits (52 bits,
    exact in BIGINT — conv returns the decimal digit string)."""
    return f"CAST(conv(substring({col}, {skip + 1}, 13), 16, 10) AS BIGINT)"


def rho_case(v: str, binfn: str) -> str:
    """Position of the highest set bit from the top of the 52-bit
    field, capped: rho = 53 - bit_length(v).  `binfn` formats an
    integer in binary ('bin' on Spark, printf-%b on DuckDB)."""
    return (
        f"CASE WHEN {v} = 0 THEN {RHO_CAP} "
        f"ELSE LEAST(53 - LENGTH({binfn}), {RHO_CAP}) END"
    )


# The concrete label both engines hash: user-minute activity
# (user_id + epoch-seconds of the minute — integers, so the string is
# trivially identical across engines; never format timestamps).
SPARK_LABEL = (
    "concat(cast(user_id as string), ':', "
    "cast(cast(date_trunc('MINUTE', ts) as long) as string))"
)
ORACLE_LABEL = (
    "CAST(user_id AS VARCHAR) || ':' || "
    "CAST(epoch_us(date_trunc('minute', ts)) // 1000000 AS VARCHAR)"
)


def _hashed(events: DataFrame, label_sql: str = SPARK_LABEL) -> DataFrame:
    return events.selectExpr(f"md5({label_sql}) AS h")


def hll_registers(events: DataFrame, label_sql: str = SPARK_LABEL) -> DataFrame:
    """(bucket, max-rho) register table — the sketch itself.  One
    narrow hash pass, one map-side-combined shuffle on <= 4096 keys."""
    hashed = _hashed(events, label_sql)
    # name v as a column so the 13-digit parse is evaluated once per
    # row (inlining it into the CASE would duplicate the whole parse)
    hv = hashed.selectExpr(
        f"CAST({bucket_expr_spark('h')} AS BIGINT) AS bucket",
        f"{v52_expr_spark('h')} AS v",
    )
    rows = hv.selectExpr(
        "bucket", f"CAST({rho_case('v', 'bin(v)')} AS BIGINT) AS rho"
    )
    return rows.groupBy("bucket").agg(F.expr("max(rho) AS m"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Collapse a register table to (registers_used, s_total,
    estimate).  s_total is the exact integer register sum including
    the 2^50 contribution of every empty register."""
    agg = registers.agg(
        F.expr("CAST(count(1) AS BIGINT) AS registers_used"),
        F.expr(
            "sum(shiftleft(cast(1 as bigint), cast(50 - m as int)))"
            " AS s_present"
        ),
    )
    s_total = (
        f"CAST(s_present + ({HLL_M} - registers_used) * "
        f"{1 << RHO_CAP}L AS BIGINT)"
    )
    return agg.selectExpr(
        "registers_used",
        f"{s_total} AS s_total",
        f"CAST({_ALPHA_M2_SHIFT} AS DOUBLE) / CAST({s_total} AS DOUBLE)"
        " AS estimate",
    )


def hll_user_minutes(events: DataFrame) -> DataFrame:
    """Distinct active user-minutes, estimated by HLL."""
    return hll_estimate(hll_registers(events))


def hll_user_minutes_merged_daily(events: DataFrame) -> DataFrame:
    """The same estimate through the MERGE path: build an independent
    register table per day (what a warehouse would persist as a daily
    sketch column), then merge all days with register-wise MAX.

    Equality with `hll_user_minutes` (enforced by the shared oracle)
    is the mergeability proof: max-per-register commutes with union,
    so daily sketches answer any date-range distinct question without
    touching raw data again.
    """
    hashed = events.select(
        F.date_trunc("DAY", F.col("ts")).alias("day"),
        F.expr(f"md5({SPARK_LABEL})").alias("h"),
    )
    hv = hashed.select(
        "day",
        F.expr(bucket_expr_spark("h")).cast("bigint").alias("bucket"),
        F.expr(v52_expr_spark("h")).alias("v"),
    )
    rows = hv.select(
        "day", "bucket", F.expr(rho_case("v", "bin(v)")).cast("bigint").alias("rho")
    )
    daily = rows.groupBy("day", "bucket").agg(F.max("rho").alias("m"))
    merged = daily.groupBy("bucket").agg(F.max("m").alias("m"))
    return hll_estimate(merged)


def kmv_user_minutes(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """KMV distinct-count: k smallest distinct 52-bit hashes.

    distinct() is one shuffle on the hash; the k-smallest selection is
    a TakeOrdered (per-partition top-k, tiny driver merge) — no global
    sort.  Exact count is returned when fewer than k distinct values
    exist (the sketch degenerates to exact, per the KMV paper).
    """
    vs = _hashed(events).select(F.expr(v52_expr_spark("h")).cast("bigint").alias("v")).distinct()
    topk = vs.orderBy("v").limit(k)
    agg = topk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_seen"),
        F.max("v").cast("bigint").alias("kth"),
    )
    return agg.select(
        "n_seen",
        "kth",
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
        .otherwise(F.expr(f"CAST({_KMV_NUM} AS DOUBLE)") / F.col("kth").cast("double"))
        .alias("estimate"),
    )


# ---------------------------------------------------------------------------
# Oracle SQL builders (DuckDB) — same constants, same structure
# ---------------------------------------------------------------------------


def _rho_duck(v: str) -> str:
    return rho_case(v, f"printf('%b', {v})")


def hll_estimate_oracle(regs_cte: str) -> str:
    """Shared tail: registers CTE -> (registers_used, s_total, estimate)."""
    return (
        f"{regs_cte}, agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS used, "
        f"CAST(SUM(CAST(1 AS BIGINT) << CAST(50 - m AS INTEGER)) AS BIGINT) AS s_present FROM regs) "
        f"SELECT used AS registers_used, "
        f"CAST(s_present + ({HLL_M} - used) * (CAST(1 AS BIGINT) << {RHO_CAP}) AS BIGINT) AS s_total, "
        f"CAST({_ALPHA_M2_SHIFT} AS DOUBLE) / "
        f"CAST(s_present + ({HLL_M} - used) * (CAST(1 AS BIGINT) << {RHO_CAP}) AS DOUBLE) AS estimate "
        f"FROM agg"
    )


def hll_user_minutes_oracle() -> str:
    v = v52_expr("h")
    regs = (
        f"WITH labels AS (SELECT md5({ORACLE_LABEL}) AS h FROM events), "
        f"hv AS (SELECT {bucket_expr('h')} AS bucket, {v} AS v FROM labels), "
        f"regs AS (SELECT bucket, MAX({_rho_duck('v')}) AS m FROM hv GROUP BY bucket)"
    )
    return hll_estimate_oracle(regs)


def kmv_user_minutes_oracle(k: int = KMV_K) -> str:
    v = v52_expr("h")
    return (
        f"WITH labels AS (SELECT md5({ORACLE_LABEL}) AS h FROM events), "
        f"vs AS (SELECT DISTINCT {v} AS v FROM labels), "
        f"topk AS (SELECT v FROM vs ORDER BY v LIMIT {k}) "
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n_seen, CAST(MAX(v) AS BIGINT) AS kth, "
        f"CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE) "
        f"ELSE CAST({_KMV_NUM} AS DOUBLE) / CAST(MAX(v) AS DOUBLE) END AS estimate "
        f"FROM topk"
    )


# ---------------------------------------------------------------------------
# exact distributed quantiles via bounded-domain binning
# ---------------------------------------------------------------------------

QUANTILE_PCTS = [50, 90, 99]


def value_quantiles(events: DataFrame, pcts: list[int] | None = None) -> DataFrame:
    """EXACT lower quantiles of `value`, computed distributed: bin to
    fixed-point cents (the column's native precision), histogram with
    one map-side-combined shuffle, cumulative counts over the bin
    table, then the smallest bin reaching each ceil(p*n/100) rank.

    The usual objection to windowed cumsum — a single-partition global
    window — does not apply: the window runs over the HISTOGRAM, whose
    size is bounded by the value domain (~50k bins here), not by the
    data.  That is the trick: at 100 TB the raw table is arbitrarily
    large but the bin table is constant-size, so exact quantiles cost
    one aggregation plus an O(domain) driver-light pass — no t-digest
    approximation needed when the domain is fixed-point.

    Output: one row, p{N} DOUBLE per requested percentile (cents/100).
    """
    pcts = QUANTILE_PCTS if pcts is None else pcts
    bins = (
        events.select(
            (F.col("value").cast("decimal(12,2)") * 100).cast("bigint").alias("cents")
        )
        .groupBy("cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return quantiles_from_bins(bins, pcts)


def quantiles_from_bins(bins: DataFrame, pcts: list[int] | None = None) -> DataFrame:
    # Quantile tail shared by the direct and merged-histogram paths:
    # cumulative counts over the (cents, n) bin table, smallest bin
    # reaching each ceil(p*n/100) rank.
    pcts = QUANTILE_PCTS if pcts is None else pcts
    from pyspark.sql import Window

    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = bins.select(
        "cents",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).alias("total"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"-((-total * {p}) div 100)"), F.col("cents")
            )
        ).alias(f"p{p}_cents")
        for p in pcts
    ]
    row = cum.agg(*aggs)
    return row.select(
        *[(F.col(f"p{p}_cents").cast("double") / 100.0).alias(f"p{p}") for p in pcts]
    )


def value_quantiles_oracle(pcts: list[int] | None = None) -> str:
    pcts = QUANTILE_PCTS if pcts is None else pcts
    sel = ", ".join(
        f"CAST(MIN(CASE WHEN cum >= -((-total * {p}) // 100) THEN cents END) AS DOUBLE) / 100.0 AS p{p}"
        for p in pcts
    )
    return (
        "WITH bins AS (SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents, "
        "COUNT(*) AS n FROM events GROUP BY 1), "
        "cum AS (SELECT cents, SUM(n) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW) AS cum, SUM(n) OVER () AS total FROM bins) "
        f"SELECT {sel} FROM cum"
    )


def hll_by_group(events: DataFrame, group: str) -> DataFrame:
    """Per-group HLL estimates in one pass: registers keyed by
    (group, bucket) — the shuffle carries at most m rows per group —
    then the estimator collapses each group's registers."""
    hashed = events.select(group, F.expr(f"md5({SPARK_LABEL})").alias("h"))
    hv = hashed.select(
        group,
        F.expr(bucket_expr_spark("h")).cast("bigint").alias("bucket"),
        F.expr(v52_expr_spark("h")).alias("v"),
    )
    rows = hv.select(
        group, "bucket", F.expr(rho_case("v", "bin(v)")).cast("bigint").alias("rho")
    )
    regs = rows.groupBy(group, "bucket").agg(F.max("rho").alias("m"))
    agg = regs.groupBy(group).agg(
        F.count(F.lit(1)).cast("bigint").alias("registers_used"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), cast(50 - m as int))")).alias("s_present"),
    )
    s_total = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("registers_used")) * F.lit(1 << RHO_CAP)
    ).cast("bigint")
    return agg.select(
        group,
        F.col("registers_used"),
        s_total.alias("s_total"),
        (F.expr(f"CAST({_ALPHA_M2_SHIFT} AS DOUBLE)") / s_total.cast("double")).alias("estimate"),
    )


# ---------------------------------------------------------------------------
# count-min sketch (heavy-hitter frequency estimation)
# ---------------------------------------------------------------------------

CMS_D = 4    # hash rows
CMS_W = 512  # counters per row
TOPK_TOKENS = 20


def _cms_bucket(token_col: str, j: int) -> str:
    """Row-j counter index for a token: first 4 hex digits of the
    salted md5, mod w — integer-only, engine-neutral."""
    h = f"md5(concat('cms{j}:', {token_col}))"
    d = [
        f"CAST(instr('{_HEX}', substring({h}, {i}, 1)) - 1 AS BIGINT)"
        for i in (1, 2, 3, 4)
    ]
    return f"(({d[0]} * 4096 + {d[1]} * 256 + {d[2]} * 16 + {d[3]}) % {CMS_W})"


def _cms_bucket_spark(token_col: str, j: int) -> str:
    """`_cms_bucket`, Spark-only conv() form (value-identical; the
    instr original stays the oracle-side definition — see
    bucket_expr_spark)."""
    h = f"md5(concat('cms{j}:', {token_col}))"
    return f"(CAST(conv(substring({h}, 1, 4), 16, 10) AS BIGINT) % {CMS_W})"


def cms_heavy_hitters(docs: DataFrame, k: int = TOPK_TOKENS) -> DataFrame:
    """Count-min sketch over the token stream, evaluated on the exact
    top-k tokens: per token, `cms_n` = min over the d salted hash rows
    of that row's counter — always >= the true count (one-sided error,
    the CMS guarantee), equal when no collision hit all d rows.

    Scale shape (r19): tokenize ONCE into a cached per-token count
    frame (one map-side-combined shuffle of the token stream — the
    only data-sized move), then both the sketch and the exact top-k
    derive from the |vocab|-sized counts: each CMS counter is the SUM
    of the counts of the tokens hashing into it (value-identical to
    counting raw instances), so the d-way bucket explode and its md5s
    run over the vocabulary, not over every token occurrence.  The
    old form tokenized the corpus twice and exploded the FULL token
    stream ×d through the bucket shuffle.  The sketch stays d*w =
    2048 integer counters however large the corpus; the exact top-k
    exists only to EVALUATE the sketch and is a TakeOrdered, not a
    global sort.  All-integer math — bit-identical across engines.
    """
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        .cache()
    )
    pairs = counts.select(
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(_cms_bucket_spark("token", j)).alias("bucket"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("jb"),
    ).select("exact_n", "jb.j", "jb.bucket")
    sketch = pairs.groupBy("j", "bucket").agg(
        F.sum("exact_n").cast("bigint").alias("counter")
    )
    exact = counts.orderBy(F.col("exact_n").desc(), F.col("token").asc()).limit(k)
    probes = exact.select(
        "token",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(_cms_bucket_spark("token", j)).alias("bucket"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("jb"),
    ).select("token", "exact_n", "jb.j", "jb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("token", "exact_n")
        .agg(F.min("counter").cast("bigint").alias("cms_n"))
    )


def cms_heavy_hitters_oracle(k: int = TOPK_TOKENS) -> str:
    jrows = ", ".join(str(j) for j in range(CMS_D))
    bucket = _cms_bucket("token", 0).replace(
        "'cms0:'", "'cms' || CAST(j AS VARCHAR) || ':'"
    )
    return (
        "WITH toks AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token "
        "FROM documents), toks2 AS (SELECT token FROM toks WHERE token <> ''), "
        f"pairs AS (SELECT token, j, {bucket} AS bucket FROM toks2 CROSS JOIN (SELECT unnest([{jrows}]) AS j)), "
        "sketch AS (SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS counter FROM pairs GROUP BY 1, 2), "
        "exact AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n FROM toks2 GROUP BY 1 "
        f"ORDER BY exact_n DESC, token ASC LIMIT {k}), "
        f"probes AS (SELECT token, exact_n, j, {bucket} AS bucket FROM exact CROSS JOIN (SELECT unnest([{jrows}]) AS j)) "
        "SELECT p.token, p.exact_n, CAST(MIN(s.counter) AS BIGINT) AS cms_n "
        "FROM probes p JOIN sketch s ON p.j = s.j AND p.bucket = s.bucket "
        "GROUP BY 1, 2"
    )


# --- Bloom-filter prefilter -------------------------------------------------
#
# The broadcast-membership scale pattern: testing a 100 TB corpus
# against a large blocklist with an equi-join shuffles the corpus on
# the join key; a Bloom filter of the blocklist is a few KB..MB that
# BROADCASTS, so the corpus is filtered in place with zero shuffle and
# a bounded false-positive rate (only the small surviving fraction
# needs the exact verify join).  Deterministic by construction: bit
# positions are exact md5 hex-digit integers, the filter is the sorted
# distinct-position set — no platform hashing anywhere.

BLOOM_M = 4096        # filter bits
BLOOM_K = 4           # hash functions = disjoint 3-hex-digit md5 slices


def _bloom_pos(col: str, j: int) -> str:
    """Position j (0..BLOOM_K-1): 3 hex digits at offset 1+3j of the
    key hash — 12 bits, exactly 0..BLOOM_M-1, disjoint slices per j."""
    i = 1 + 3 * j
    return f"({_digit(col, i)} * 256 + {_digit(col, i + 1)} * 16 + {_digit(col, i + 2)})"


def _bloom_positions(col: str) -> str:
    return "array(" + ", ".join(_bloom_pos(col, j) for j in range(BLOOM_K)) + ")"


def _bloom_pos_spark(col: str, j: int) -> str:
    """`_bloom_pos`, Spark-only conv() form (value-identical; see
    bucket_expr_spark)."""
    i = 1 + 3 * j
    return f"CAST(conv(substring({col}, {i}, 3), 16, 10) AS BIGINT)"


def _bloom_positions_spark(col: str) -> str:
    return (
        "array(" + ", ".join(_bloom_pos_spark(col, j) for j in range(BLOOM_K)) + ")"
    )


def bloom_prefilter(docs: DataFrame, blocked_source: str = "src0") -> DataFrame:
    """Per-document Bloom membership test against the blocklist (docs
    of `blocked_source`), alongside the exact answer so the
    false-positive accounting is part of the result contract.

    Plan: the filter is ONE aggregate row (sorted distinct positions,
    ≤ BLOOM_M ints) broadcast to the probe side — the corpus-sized
    probe never shuffles. The exact column is the verify join the
    filter exists to shrink; it is computed here over all docs only to
    certify the no-false-negative property per row.
    """
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("text")).alias("h"),
    ).withColumn("positions", F.expr(_bloom_positions_spark("h")))
    filt = (
        keyed.filter(F.col("source") == blocked_source)
        .select(F.explode("positions").alias("p"))
        .distinct()
        .agg(F.sort_array(F.collect_set("p")).alias("bits"))
    )
    blocked = (
        keyed.filter(F.col("source") == blocked_source)
        .select(F.col("h").alias("bh"))
        .distinct()
    )
    probed = keyed.join(F.broadcast(filt)).withColumn(
        "bloom_hit", F.expr("forall(positions, p -> array_contains(bits, p))")
    )
    return (
        probed.join(
            F.broadcast(blocked), probed.h == F.col("bh"), "left_outer"
        )
        .select(
            "doc_id",
            "bloom_hit",
            F.col("bh").isNotNull().alias("exact_hit"),
        )
    )


def bloom_prefilter_oracle(blocked_source: str = "src0") -> str:
    pos_list = "[" + ", ".join(_bloom_pos("h", j) for j in range(BLOOM_K)) + "]"
    return (
        f"WITH keyed AS (SELECT doc_id, source, md5(text) AS h FROM documents), "
        f"pos AS (SELECT doc_id, source, h, {pos_list} AS positions FROM keyed), "
        f"filt AS (SELECT list_sort(list_distinct(flatten(list(positions)))) AS bits "
        f"FROM pos WHERE source = '{blocked_source}'), "
        f"blocked AS (SELECT DISTINCT h AS bh FROM keyed WHERE source = '{blocked_source}') "
        f"SELECT doc_id, list_has_all(bits, positions) AS bloom_hit, "
        f"(bh IS NOT NULL) AS exact_hit "
        f"FROM pos CROSS JOIN filt LEFT JOIN blocked ON h = bh"
    )


# ---------------------------------------------------------------------------
# KMV set operations: distinct-overlap estimate between two cohorts
# ---------------------------------------------------------------------------


def kmv_overlap(events: DataFrame, type_a: str, type_b: str, k: int = KMV_K) -> DataFrame:
    """KMV sketch set operation (Beyer et al. 2007): estimate
    |users(A) ∩ users(B)| without materializing either user set.

    The union sketch is the k smallest distinct user hashes across
    both cohorts, each tagged with bool_or membership flags; the
    Jaccard of the sketch (fraction of the k that belong to both)
    scales the union estimate into an intersection estimate.  Every
    step is deterministic given the hash: the estimate itself is
    hash-verifiable across engines, like the HLL/KMV counts.

    Scale: one membership aggregate per user (map-side combined), one
    TakeOrdered for the k smallest — no all-pairs, no global sort.
    Sketches this shape merge across partitions/days the same way the
    HLL registers do.
    """
    tagged = events.where(F.col("event_type").isin(type_a, type_b)).select(
        F.expr("md5(concat('u:', cast(user_id as string)))").alias("h"),
        (F.col("event_type") == type_a).alias("a"),
        (F.col("event_type") == type_b).alias("b"),
    )
    users = tagged.groupBy("h").agg(
        F.max("a").alias("in_a"), F.max("b").alias("in_b")
    )
    topk = (
        users.select(F.expr(v52_expr_spark("h")).cast("bigint").alias("v"), "in_a", "in_b")
        .orderBy("v")
        .limit(k)
    )
    agg = topk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_seen"),
        F.max("v").cast("bigint").alias("kth"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("bigint")).cast("bigint").alias("n_both"),
    )
    union_est = (
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
        .otherwise(F.expr(f"CAST({_KMV_NUM} AS DOUBLE)") / F.col("kth").cast("double"))
    )
    return agg.select(
        "n_seen",
        "kth",
        "n_both",
        union_est.alias("union_est"),
        (
            (F.col("n_both").cast("double") / F.col("n_seen").cast("double")) * union_est
        ).alias("intersection_est"),
    )


def kmv_overlap_oracle(type_a: str, type_b: str, k: int = KMV_K) -> str:
    v = v52_expr("h")
    return (
        f"WITH tagged AS (SELECT md5('u:' || CAST(user_id AS VARCHAR)) AS h, "
        f"event_type = '{type_a}' AS a, event_type = '{type_b}' AS b "
        f"FROM events WHERE event_type IN ('{type_a}', '{type_b}')), "
        f"users AS (SELECT h, MAX(a) AS in_a, MAX(b) AS in_b FROM tagged GROUP BY h), "
        f"topk AS (SELECT {v} AS v, in_a, in_b FROM users ORDER BY v LIMIT {k}), "
        f"agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_seen, CAST(MAX(v) AS BIGINT) AS kth, "
        f"CAST(SUM(CAST(in_a AND in_b AS BIGINT)) AS BIGINT) AS n_both FROM topk) "
        f"SELECT n_seen, kth, n_both, "
        f"CASE WHEN n_seen < {k} THEN CAST(n_seen AS DOUBLE) "
        f"ELSE CAST({_KMV_NUM} AS DOUBLE) / CAST(kth AS DOUBLE) END AS union_est, "
        f"(CAST(n_both AS DOUBLE) / CAST(n_seen AS DOUBLE)) * "
        f"(CASE WHEN n_seen < {k} THEN CAST(n_seen AS DOUBLE) "
        f"ELSE CAST({_KMV_NUM} AS DOUBLE) / CAST(kth AS DOUBLE) END) AS intersection_est "
        f"FROM agg"
    )


# ---------------------------------------------------------------------------
# CMS inner-product join-cardinality estimation
# ---------------------------------------------------------------------------


def _cms_key_counts(events: DataFrame, event_type: str) -> DataFrame:
    keys = events.where(F.col("event_type") == event_type).select(
        F.expr("cast(user_id as string)").alias("token")
    )
    pairs = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(_cms_bucket_spark("token", j)).alias("bucket"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("jb")
    ).select("jb.j", "jb.bucket")
    return pairs.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("counter")
    )


def cms_join_cardinality(events: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """Join-size estimation from sketches (the AMS/count-min inner
    product, Alon-Matias-Szegedy 1996 / Cormode-Muthukrishnan 2005):
    |A ⋈_key B| = Σ_k fA(k)·fB(k), estimated as min over the d hash
    rows of the row-wise counter inner product — always ≥ the truth
    (one-sided, like the point-query bound).

    This is what a cost-based planner wants BEFORE running a join: each
    side collapses to d×w = 2048 integers regardless of data size (one
    map-side-combined shuffle per side), the inner product is a join of
    two tiny sketches, and the exact join size — computed here only to
    evaluate the estimate — needs the real per-key frequency join.
    All-integer math, hash-deterministic across engines.
    """
    sa = _cms_key_counts(events, type_a)
    sb = _cms_key_counts(events, type_b)
    # A hash row with NO bucket collisions between the sides has inner
    # product 0 — the true minimum.  The inner sketch join drops such
    # rows, so guard: fewer than CMS_D surviving rows ⇒ estimate 0.
    est = (
        sa.join(sb.withColumnRenamed("counter", "counter_b"), ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("counter") * F.col("counter_b")).alias("dot"))
        .agg(
            F.when(F.count(F.lit(1)) < CMS_D, F.lit(0))
            .otherwise(F.min("dot"))
            .cast("bigint")
            .alias("cms_estimate")
        )
    )
    fa = (
        events.where(F.col("event_type") == type_a)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("na"))
    )
    fb = (
        events.where(F.col("event_type") == type_b)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    exact = fa.join(fb, "user_id").agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).cast("bigint").alias("exact_join_size")
    )
    ratio = F.when(
        F.col("exact_join_size") > 0,
        F.col("cms_estimate").cast("double") / F.col("exact_join_size").cast("double"),
    )  # NULL when the true join is empty (no meaningful ratio)
    return est.crossJoin(F.broadcast(exact)).select(
        "exact_join_size", "cms_estimate", ratio.alias("overestimate_ratio")
    )


def cms_join_cardinality_oracle(type_a: str, type_b: str) -> str:
    jrows = ", ".join(str(j) for j in range(CMS_D))
    bucket = _cms_bucket("token", 0).replace(
        "'cms0:'", "'cms' || CAST(j AS VARCHAR) || ':'"
    )

    def side(name: str, et: str) -> str:
        return (
            f"{name}k AS (SELECT CAST(user_id AS VARCHAR) AS token FROM events "
            f"WHERE event_type = '{et}'), "
            f"{name}p AS (SELECT {bucket} AS bucket, j FROM {name}k "
            f"CROSS JOIN (SELECT unnest([{jrows}]) AS j)), "
            f"{name}_s AS (SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS counter "
            f"FROM {name}p GROUP BY 1, 2)"
        )

    return (
        f"WITH {side('a', type_a)}, {side('b', type_b)}, "
        "est AS (SELECT CAST(CASE WHEN COUNT(*) < " f"{CMS_D}" " THEN 0 ELSE MIN(dot) END AS BIGINT) AS cms_estimate FROM ("
        "  SELECT a_s.j, SUM(a_s.counter * b_s.counter) AS dot "
        "  FROM a_s JOIN b_s ON a_s.j = b_s.j AND a_s.bucket = b_s.bucket GROUP BY a_s.j)"
        "), "
        f"fa AS (SELECT user_id, COUNT(*) AS na FROM events WHERE event_type = '{type_a}' GROUP BY 1), "
        f"fb AS (SELECT user_id, COUNT(*) AS nb FROM events WHERE event_type = '{type_b}' GROUP BY 1), "
        "ex AS (SELECT CAST(COALESCE(SUM(na * nb), 0) AS BIGINT) AS exact_join_size "
        "FROM fa JOIN fb USING (user_id)) "
        "SELECT exact_join_size, cms_estimate, "
        "CASE WHEN exact_join_size > 0 THEN CAST(cms_estimate AS DOUBLE) / CAST(exact_join_size AS DOUBLE) END AS overestimate_ratio "
        "FROM est CROSS JOIN ex"
    )


def quantile_merge_daily(events: DataFrame, pcts: list[int] | None = None) -> DataFrame:
    # Histogram mergeability proof (the property that makes the exact
    # fixed-point quantile sketch distributable): per-DAY histograms are
    # built independently -- as partitions, days, or executors would --
    # then merged by summing per-bin counts; the quantiles of the merged
    # histogram must equal the single-pass whole-table quantiles (the
    # oracle).  One map-side-combined re-aggregation over the bounded
    # bin domain, exactly like the HLL register merge in hll_merge_daily.
    daily = (
        events.select(
            F.to_date("ts").alias("day"),
            (F.col("value").cast("decimal(12,2)") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("day", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    merged = daily.groupBy("cents").agg(F.sum("n").cast("bigint").alias("n"))
    return quantiles_from_bins(merged, pcts)
