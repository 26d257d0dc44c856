"""Distributed byte-pair-encoding tokenizer: merge-rule training over
the corpus word-frequency table and greedy merge application, all in
JVM-side expressions.

Real BPE (Sennrich et al. 2016, public algorithm), not the regex
token-count heuristic in functions/text.py: each round counts adjacent
symbol pairs across the vocabulary, promotes the most frequent pair to
a new symbol, and rewrites the vocabulary.  The reference engine has no
tokenizer at all; this is part of the LLM-pipeline surface.

Scale design — the reason BPE trains fine at 100 TB:

- Training never touches the corpus after the FIRST aggregation: round
  0 collapses the corpus to its word-frequency table (one map-side-
  combined shuffle on the word).  Every merge round then runs on the
  VOCABULARY (|V| ≪ corpus; millions of rows at web scale), so R
  rounds are R small jobs, not R corpus scans.
- The per-round argmax moves exactly ONE row to the driver (like the
  k-means centroid pull) — the merge rule must become a literal in the
  next round's expression, which is inherently a driver decision.
- Encoding is a narrow per-row chain of R regexp_replace expressions —
  whole-stage codegen, no Python, no shuffle.

Determinism contract (why a DuckDB oracle can verify this exactly):

- Words are lowercase [a-z0-9]+ tokens only, so every symbol ever
  formed is word-characters and the greedy merge can be expressed as a
  global regexp_replace of ``\\ba b\\b`` → ``ab``: the word-boundary
  anchors stop partial-symbol matches (`b c` never matches inside
  `ab c`), and both RE2 (DuckDB) and Java regex scan left-to-right
  non-overlapping, which IS greedy BPE application (`a a a` → `aa a`).
- Pair counting uses the overlapping adjacent-pair convention of the
  published algorithm; ties break by (freq DESC, pair ASC) so the
  winning merge is unique and engine-independent.
- Everything is integer counts and string rewrites — no floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_MERGES = 8

# Both engines: token stream → lowercase alnum words only.
_WORD_RE = "^[a-z0-9]+$"


def word_freq(docs: DataFrame) -> DataFrame:
    """Corpus → (word, freq): the ONLY corpus-sized job in training."""
    return (
        docs.select(F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"))
        .where(F.col("w").rlike(_WORD_RE))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _spaced(col: F.Column) -> F.Column:
    """'hello' → 'h e l l o' (initial symbol string)."""
    return F.trim(F.regexp_replace(col, "(.)", "$1 "))


_PAIRS_EXPR = (
    "CASE WHEN size(syms) < 2 THEN array() "
    "ELSE transform(sequence(1, size(syms) - 1), "
    "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1))) END"
)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the vocabulary (freq-weighted)."""
    return (
        vocab.withColumn("syms", F.split(F.col("ws"), " "))
        .select(F.explode(F.expr(_PAIRS_EXPR)).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_word(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    """Greedy left-to-right non-overlapping merge of one word."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _train_merges_local(
    freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Exact BPE training over a collected (word, freq) table — the
    standard incremental trainer (pair→affected-words index; only
    words containing the winning pair are re-counted each round, as in
    Sennrich's public learn_bpe).  Same argmax and (freq DESC, pair
    ASC) tie-break as the distributed loop, so the two paths are
    interchangeable."""
    from collections import Counter, defaultdict

    words: list[tuple[str, ...]] = [tuple(w) for w, _ in freqs]
    wf = [f for _, f in freqs]
    pc: Counter = Counter()
    p2w: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, syms in enumerate(words):
        f = wf[idx]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pc[p] += f
            p2w[p].add(idx)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = None
        best_key = None
        for pair, cnt in pc.items():
            if cnt <= 0:
                continue
            key = (-cnt, pair[0] + " " + pair[1])
            if best_key is None or key < best_key:
                best, best_key = pair, key
        if best is None:
            break
        left, right = best
        merges.append((left, right, pc[best]))
        # Re-count only the words that (may) contain the winning pair;
        # p2w sets can hold stale ids — the subtract/re-add below is a
        # net no-op for those, never a corruption.
        for idx in p2w.pop(best, ()):
            syms = words[idx]
            f = wf[idx]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] -= f
            merged = _merge_word(syms, left, right)
            words[idx] = merged
            for i in range(len(merged) - 1):
                p = (merged[i], merged[i + 1])
                pc[p] += f
                p2w[p].add(idx)
        pc.pop(best, None)
    return merges


# Above this many distinct words the vocabulary is trained with the
# distributed round loop instead of being collected.  The vocab is the
# AGGREGATED word-frequency table, not the corpus: English web text at
# any corpus size plateaus around 10^7 distinct alnum words, so the
# driver path covers real corpora by orders of magnitude while the
# fallback keeps the operator total-scale-safe.
DRIVER_VOCAB_MAX = 2_000_000


def train_merges(
    docs: DataFrame,
    n_merges: int = N_MERGES,
    driver_vocab_max: int = DRIVER_VOCAB_MAX,
) -> list[tuple[str, str, int]]:
    """Learn the top-`n_merges` BPE merge rules; returns
    [(left, right, pair_freq), ...] in application order.

    The corpus is touched exactly once (word-frequency aggregation —
    the only corpus-sized job).  The resulting vocabulary is a bounded
    aggregate, like a centroid table: when it fits under
    `driver_vocab_max` rows it is collected once and trained with the
    incremental local algorithm (zero Spark jobs per merge round);
    larger vocabularies fall back to the distributed
    one-small-job-per-round loop.  Both paths implement the identical
    published algorithm with the identical tie-break."""
    # Path decision by count() first: collecting driver_vocab_max+1 Row
    # objects just to measure the size could be multi-GB of Python object
    # overhead near the threshold.  Only under the cap do we materialize,
    # and then via Arrow (toPandas) rather than per-row Row objects.
    # The cache keeps the corpus-sized aggregation to ONE computation
    # across the count + the collect (the function's one-scan contract).
    wf_df = word_freq(docs).cache()
    try:
        n_vocab = wf_df.limit(driver_vocab_max + 1).count()
        if n_vocab <= driver_vocab_max:
            pdf = wf_df.toPandas()
            return _train_merges_local(
                list(zip(pdf["w"].tolist(), (int(f) for f in pdf["freq"].tolist()))),
                n_merges,
            )
    finally:
        wf_df.unpersist()

    vocab = wf_df.select(_spaced(F.col("w")).alias("ws"), "freq").cache()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            best = (
                _pair_counts(vocab)
                .orderBy(F.col("cnt").desc(), F.col("pair").asc())
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right = best[0]["pair"].split(" ")
            merges.append((left, right, int(best[0]["cnt"])))
            nxt = vocab.select(
                F.regexp_replace(
                    F.col("ws"), f"\\b{left} {right}\\b", left + right
                ).alias("ws"),
                "freq",
            ).cache()
            nxt.count()  # materialize before dropping the parent
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return merges


def merges_df(spark: SparkSession, docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Training output as a table: (rank, left, right, merged, pair_freq)."""
    rows = [
        (i + 1, l, r, l + r, c) for i, (l, r, c) in enumerate(train_merges(docs, n_merges))
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_freq long"
    ).select(
        F.col("rank").cast("bigint").alias("rank"),
        "left",
        "right",
        "merged",
        F.col("pair_freq").cast("bigint").alias("pair_freq"),
    )


def encode_token_counts(docs: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Apply the learned merges to every document; per doc report the
    symbol count before (chars) and after (BPE tokens).

    Narrow plan: explode to words, one chained regexp_replace per merge
    rule (literals baked in), map-side-combined count per doc."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).where(F.col("w").rlike(_WORD_RE))
    # r19 opt (guide: decide with small rows): the regex chain is a
    # pure function of the WORD, so evaluate it once per DISTINCT word
    # (vocab-sized — ~10^7 at web scale) instead of once per word
    # INSTANCE (corpus-sized), and weight by the per-(doc, word)
    # count.  sum(c * per_word_syms) is exact integer arithmetic, so
    # the per-doc totals are identical to the per-instance form.
    # The vocab side is a bounded aggregate; the planner broadcasts it
    # when small and shuffle-joins when not — no forced hint.
    dw = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    ws = _spaced(F.col("w"))
    n_chars = F.size(F.split(ws, " "))
    merged = ws
    for left, right, _ in merges:
        merged = F.regexp_replace(merged, f"\\b{left} {right}\\b", left + right)
    wcost = dw.select("w").distinct().select(
        "w",
        n_chars.cast("bigint").alias("_ncs"),
        F.size(F.split(merged, " ")).cast("bigint").alias("_nbs"),
    )
    return (
        dw.join(wcost, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.sum(F.col("c") * F.col("_ncs")).cast("bigint").alias("n_char_syms"),
            F.sum(F.col("c") * F.col("_nbs")).cast("bigint").alias("n_bpe_syms"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle generation: the same computation as unrolled CTEs.
# The merge choice is data-dependent, so each round's winning pair is a
# one-row CTE (b{r}) cross-joined into the next rewrite — the argmax
# lives in SQL, not in Python, keeping the oracle independent of the
# Spark implementation.
# ---------------------------------------------------------------------------

_DUCK_WORDS = (
    "SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM ("
    "  SELECT unnest(str_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents"
    f") WHERE regexp_matches(w, '{_WORD_RE}') GROUP BY w"
)

_DUCK_PAIRS = (
    "SELECT unnest(list_transform(range(1, len(syms)), "
    "i -> syms[i] || ' ' || syms[i + 1])) AS pair, freq "
    "FROM (SELECT str_split(ws, ' ') AS syms, freq FROM {src})"
)


def _duck_rounds(n_merges: int) -> str:
    """CTE chain: w0 → (p1, b1, w1) → ... shared by both oracles."""
    parts = [
        f"words AS ({_DUCK_WORDS})",
        "w0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS ws, freq FROM words)",
    ]
    for r in range(1, n_merges + 1):
        src = f"w{r - 1}"
        parts.append(
            f"p{r} AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt "
            f"FROM ({_DUCK_PAIRS.format(src=src)}) GROUP BY pair)"
        )
        parts.append(
            f"b{r} AS (SELECT str_split(pair, ' ')[1] AS l, str_split(pair, ' ')[2] AS r, cnt "
            f"FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1)"
        )
        # LEFT JOIN ON TRUE, not CROSS JOIN: when the vocabulary
        # exhausts merges before n_merges rounds, p{r} (and so b{r}) is
        # empty — a CROSS JOIN would empty every later CTE, silently
        # diverging from the Spark side (train_merges breaks early and
        # keeps all words).  With the outer join an empty b{r} yields
        # NULL l/r and the CASE passes ws through unchanged.
        parts.append(
            f"w{r} AS (SELECT CASE WHEN l IS NULL THEN ws ELSE "
            f"regexp_replace(ws, '\\b' || l || ' ' || r || '\\b', l || r, 'g') "
            f"END AS ws, freq FROM {src} LEFT JOIN b{r} ON TRUE)"
        )
    return ", ".join(parts)


def vocab_oracle_sql(n_merges: int = N_MERGES) -> str:
    """Oracle for merges_df: rank, left, right, merged, pair_freq."""
    unions = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, l AS left, r AS right, "
        f"l || r AS merged, cnt AS pair_freq FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return f"WITH {_duck_rounds(n_merges)} {unions}"


def encode_oracle_sql(n_merges: int = N_MERGES) -> str:
    """Oracle for encode_token_counts: per-doc symbol counts through
    the same merge chain (document words rewritten round by round)."""
    parts = [_duck_rounds(n_merges)]
    parts.append(
        "d0 AS (SELECT doc_id, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS ws FROM ("
        "  SELECT doc_id, unnest(str_split_regex(lower(trim(text)), '\\s+')) AS w "
        "  FROM documents"
        f") WHERE regexp_matches(w, '{_WORD_RE}'))"
    )
    for r in range(1, n_merges + 1):
        # Same empty-round guard as _duck_rounds: outer join so an
        # exhausted merge vocabulary passes documents through unchanged.
        parts.append(
            f"d{r} AS (SELECT doc_id, CASE WHEN l IS NULL THEN ws ELSE "
            f"regexp_replace(ws, '\\b' || l || ' ' || r || '\\b', l || r, 'g') "
            f"END AS ws FROM d{r - 1} LEFT JOIN b{r} ON TRUE)"
        )
    # Merging never changes a word's character content, only its
    # segmentation — so char counts come from the FINAL string with
    # spaces stripped (no positional join back to round 0 needed).
    return (
        f"WITH {', '.join(parts)} "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, "
        "CAST(SUM(len(replace(ws, ' ', ''))) AS BIGINT) AS n_char_syms, "
        "CAST(SUM(len(str_split(ws, ' '))) AS BIGINT) AS n_bpe_syms "
        f"FROM d{n_merges} GROUP BY doc_id"
    )
