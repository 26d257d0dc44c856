"""Ranked retrieval over the `documents` corpus: TF-IDF term weights
and BM25 query scoring — the lexical-search half of a training-data
curation stack (near-dup removal lives in operators/dedup.py; dense
ANN in operators/similarity.py).

Scale shape (100 TB corpus):
  - term stats are two map-side-combined shuffles: (doc_id, term)
    for tf, then (term) for df — both reduce before moving data;
  - corpus-level scalars (N, avgdl) ride a broadcast 1-row frame, so
    no `.collect()` and no driver loop;
  - BM25 prunes FIRST: tokens are inner-joined to the (broadcast)
    query-term list before any aggregation, so the tf/df shuffles
    move only matching terms — a handful of rows per document even
    when the corpus is 100 TB;
  - all score arithmetic is rounded to 6 decimals and cast to
    DECIMAL(18,6) BEFORE any cross-row sum, making the fold exact and
    order-independent (float addition is not associative; decimal
    addition is) — the same determinism trick the ANN operators use
    with integer dot products.

The determinism contract: every emitted score is a DECIMAL(18,6)
whose value is reproducible bit-for-bit by any engine computing the
same closed-form expression (one ln + a few IEEE-double ops, rounded
at 6 dp), which is what lets the DuckDB oracle hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysql_cdc_spark.functions.text import with_tokens

# Fixed benchmark query set (terms drawn from the corpus vocabulary).
BM25_QUERIES: list[tuple[str, str]] = [
    ("q1", "hash"), ("q1", "join"),
    ("q2", "vector"), ("q2", "scan"),
    ("q3", "customer"), ("q3", "order"), ("q3", "line"),
    ("q4", "slow"), ("q4", "query"), ("q4", "filter"),
]

K1 = 1.2
B = 0.75


def _term_freqs(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — one map-side-combined shuffle."""
    return (
        with_tokens(docs)
        .select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_top_terms(docs: DataFrame, k: int = 10) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tfidf = tf * ln((N+1)/(df+1)), rounded to DECIMAL(18,6); ranking
    is over the ROUNDED decimal (ties broken by term) so the top-k
    cut is engine-independent.  Plan: tf shuffle → df shuffle (both
    partial-agged) → shuffle join on term → broadcast N → per-doc
    WindowGroupLimit for the top-k.
    """
    tf = _term_freqs(docs)
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))), 6
            ).cast("decimal(18,6)"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            # ranked on the exact decimal; surfaced as double (the
            # engine-neutral interchange type — value is identical)
            F.col("tfidf").cast("double").alias("tfidf"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


def bm25_search(
    docs: DataFrame,
    queries: list[tuple[str, str]] | None = None,
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k documents per query under BM25 (Robertson/Sparck Jones):

        score(q,d) = sum_t idf_t * tf * (k1+1) / (tf + k1*(1-b+b*dl/avgdl))
        idf_t      = ln(1 + (N - df + 0.5) / (df + 0.5))

    Per-term contributions are rounded to DECIMAL(18,6) BEFORE the
    per-(query, doc) sum, so the total is an exact decimal fold —
    order-independent across partitions.  Token stream is pruned by a
    broadcast inner join against the query-term list before any
    shuffle; df/N/avgdl are corpus statistics computed once.
    """
    spark = docs.sparkSession
    qterms = spark.createDataFrame(queries or BM25_QUERIES, ["qid", "term"])
    toks = with_tokens(docs)
    # cache() both narrow intermediates (r19): lens feeds the corpus
    # stats AND the contrib join, hits feeds the df count AND contrib
    # — uncached, the initial plan scanned + tokenized the corpus FOUR
    # times (8 parquet scans).  Both are bounded: lens is one (id, int)
    # row per doc, hits only the query-term matches.
    lens = toks.select("doc_id", F.size("tokens").alias("dl")).cache()
    stats = lens.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )  # one tiny row, broadcast below

    hits = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        # prune to query terms BEFORE aggregating: the broadcast join
        # is the filter, so the tf shuffle moves only matching terms
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .cache()
    )
    df_ = hits.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    contrib = (
        hits.join(df_, "term")
        .join(F.broadcast(qterms), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "part",
            F.round(
                F.col("idf")
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ).cast("decimal(18,6)"),
        )
    )
    scores = (
        contrib.groupBy("qid", "doc_id")
        .agg(F.sum("part").cast("decimal(18,6)").alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "qid",
            "doc_id",
            F.col("score").cast("double").alias("score"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )
