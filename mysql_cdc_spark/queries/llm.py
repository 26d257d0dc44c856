"""llm query registrations (split from queries.py; registration order is governed by _registry.REGISTRATION_ORDER)."""
from __future__ import annotations

from pyspark.sql import functions as F
from mysql_cdc_spark.functions import text as T
from mysql_cdc_spark.operators import dedup
from mysql_cdc_spark.operators import retrieval
from mysql_cdc_spark.operators import similarity
from mysql_cdc_spark.functions import pii
from mysql_cdc_spark.operators import corpus
from mysql_cdc_spark.operators import bpe
from mysql_cdc_spark.queries._registry import ORACLES, register  # noqa: E402
from mysql_cdc_spark.queries._shared import (  # noqa: E402
    _FIXTURE_VERSION,
    _STREAM_TMP,
    _docs,
    _drain,
)


_TOKS_CTE = (
    "WITH toks AS (SELECT doc_id, lang, source, text, "
    r"regexp_split_to_array(lower(trim(text)), '\s+') AS tokens FROM documents)"
)


@register(
    "llm_text_stats",
    _TOKS_CTE + " SELECT doc_id, lang, source, "
    "CAST(length(text) AS BIGINT) AS n_chars, "
    "CAST(len(tokens) AS BIGINT) AS n_tokens, "
    "CAST(len(list_distinct(tokens)) AS BIGINT) AS n_distinct_tokens, "
    "CAST(list_sum(list_transform(tokens, x -> length(x))) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) AS avg_token_len, "
    "CAST(len(list_distinct(tokens)) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) AS type_token_ratio "
    "FROM toks",
)
def llm_text_stats(spark, sf_dir):
    """Per-document size/diversity stats (shuffle-free)."""
    from mysql_cdc_spark.sources.io import read_table

    return T.doc_stats(read_table(spark, sf_dir, "documents"))


@register(
    "llm_quality_score",
    _TOKS_CTE + ", q AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens, "
    f"CAST(len(list_filter(tokens, x -> x IN ({', '.join(repr(w) for w in T.STOPWORDS)}))) AS DOUBLE)"
    " / CAST(len(tokens) AS DOUBLE) AS stopword_ratio, "
    "CAST(len(list_filter(tokens, x -> regexp_matches(x, '^[a-z]+$'))) AS DOUBLE)"
    " / CAST(len(tokens) AS DOUBLE) AS alpha_ratio, "
    "CAST(CASE WHEN len(tokens) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END AS DOUBLE) AS length_ok "
    "FROM toks) "
    "SELECT doc_id, n_tokens, stopword_ratio, alpha_ratio, length_ok, "
    "stopword_ratio * 0.3 + alpha_ratio * 0.5 + length_ok * 0.2 AS quality FROM q",
)
def llm_quality_score(spark, sf_dir):
    """Heuristic quality scoring (training-data pre-filter)."""
    from mysql_cdc_spark.sources.io import read_table

    return T.quality_score(read_table(spark, sf_dir, "documents"))


def _lex_sql(lang: str) -> str:
    return f"len(list_filter(tokens, x -> x IN ({', '.join(repr(w) for w in T.LEXICONS[lang])})))"


@register(
    "llm_lang_id",
    _TOKS_CTE + ", s AS (SELECT doc_id, lang, text, tokens, "
    + ", ".join(f"{_lex_sql(lg)} AS s_{lg}" for lg in ("en", "fr", "de", "es"))
    + " FROM toks) "
    "SELECT doc_id, lang AS labeled_lang, pred_lang, pred_lang = lang AS agrees FROM ("
    "  SELECT doc_id, lang, CASE "
    r"  WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh' "
    "  WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en' "
    "  WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr' "
    "  WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS pred_lang FROM s)",
)
def llm_lang_id(spark, sf_dir):
    """n-gram/stopword language-ID heuristic."""
    from mysql_cdc_spark.sources.io import read_table

    return T.lang_id(read_table(spark, sf_dir, "documents"))


@register(
    "llm_token_counts",
    _TOKS_CTE + " SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(len(tokens)) AS BIGINT) AS ws_tokens, "
    f"CAST(SUM(len(regexp_extract_all(lower(text), '{T.BPE_PATTERN}'))) AS BIGINT) AS bpe_tokens, "
    "CAST(SUM(length(text)) AS BIGINT) AS total_chars, "
    "CAST(SUM(len(tokens)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_ws_tokens "
    "FROM toks GROUP BY source",
)
def llm_token_counts(spark, sf_dir):
    """Whitespace + BPE-ish token counting per source."""
    from mysql_cdc_spark.sources.io import read_table

    return T.token_counts(read_table(spark, sf_dir, "documents"))


@register(
    "llm_top_ngrams",
    _TOKS_CTE + ", grams AS ("
    "  SELECT tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] AS ngram"
    "  FROM (SELECT tokens, unnest(range(1, greatest(len(tokens)-2, 0)+1)) AS i FROM toks)"
    ") SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n FROM grams "
    "GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20",
)
def llm_top_ngrams(spark, sf_dir):
    """Corpus top-20 word trigrams (explode → map-side-combined count
    → TakeOrdered)."""
    from mysql_cdc_spark.sources.io import read_table

    return T.top_ngrams(read_table(spark, sf_dir, "documents"))


@register(
    "llm_fingerprint",
    "WITH t AS (SELECT doc_id, lower(trim(text)) AS t FROM documents), "
    "hh AS (SELECT doc_id, list_transform(range(1, greatest(length(t)-7, 1)+1), "
    "i -> md5(substr(t, i, 8))) AS hashes FROM t) "
    "SELECT doc_id, "
    + ", ".join(
        f"list_min(list_transform(hashes, h -> substr(h, {8 * s + 1}, 8))) AS fp{s}"
        for s in range(4)
    )
    + " FROM hh",
)
def llm_fingerprint(spark, sf_dir):
    """Minhash-over-char-shingles document fingerprints (rolling-window
    signature, shuffle-free array expressions)."""
    from mysql_cdc_spark.sources.io import read_table

    return T.fingerprints(read_table(spark, sf_dir, "documents"))


# Shared oracle CTEs: normalization → tokens → distinct word-3-gram
# shingle sets (mirrors dedup.with_shingles).
_SHINGLE_CTE = (
    "WITH norm AS (SELECT doc_id, lower(trim(text)) AS norm_text FROM documents), "
    r"toks AS (SELECT doc_id, regexp_split_to_array(norm_text, '\s+') AS tokens FROM norm), "
    "sh AS (SELECT doc_id, list_distinct(CASE WHEN len(tokens) >= 3 THEN "
    "[tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] for i in range(1, len(tokens)-1)] "
    "ELSE [] END) AS shingles FROM toks)"
)

_MINHASH_CTE = _SHINGLE_CTE + (
    ", hh AS (SELECT doc_id, shingles, list_transform(shingles, x -> md5(x)) AS hashes FROM sh)"
    ", mh AS (SELECT doc_id, shingles, "
    + ", ".join(
        f"list_min(list_transform(hashes, h -> substr(h, {4 * s + 1}, 4))) AS mh{s}"
        for s in range(dedup.MINHASH_K)
    )
    + " FROM hh)"
)

_BAND_CTE = _MINHASH_CTE + ", bandrows AS (" + " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, "
    f"md5('{b}' || '|' || mh{2 * b} || '|' || mh{2 * b + 1}) AS band_hash FROM mh"
    for b in range(dedup.LSH_BANDS)
) + ")"


@register(
    "llm_dedup_exact",
    "WITH h AS (SELECT doc_id, md5(lower(trim(text))) AS content_hash FROM documents), "
    "g AS (SELECT content_hash, MIN(doc_id) AS keep_doc_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_copies FROM h GROUP BY content_hash) "
    "SELECT h.doc_id, h.content_hash, g.keep_doc_id, g.n_copies, "
    "h.doc_id = g.keep_doc_id AS is_canonical FROM h JOIN g USING (content_hash)",
)
def llm_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash; canonical = lowest doc_id."""
    return dedup.exact_dedup(_docs(spark, sf_dir))


@register(
    "llm_dedup_minhash",
    _BAND_CTE + ", cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bandrows a JOIN bandrows b ON a.band = b.band AND a.band_hash = b.band_hash "
    "AND a.doc_id < b.doc_id) "
    "SELECT doc_a, doc_b, common, n_a, n_b, jaccard FROM ("
    "  SELECT c.doc_a, c.doc_b, "
    "  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS common, "
    "  CAST(len(sa.shingles) AS BIGINT) AS n_a, CAST(len(sb.shingles) AS BIGINT) AS n_b, "
    "  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) / "
    "  CAST(len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) AS jaccard "
    "  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b"
    f") WHERE jaccard >= {dedup.JACCARD_THRESHOLD}",
)
def llm_dedup_minhash(spark, sf_dir):
    """Banded MinHash-LSH near-dup pairs + exact Jaccard verify."""
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir))


@register(
    "llm_dedup_minhash_capped",
    _BAND_CTE + ", cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bandrows a JOIN bandrows b ON a.band = b.band AND a.band_hash = b.band_hash "
    "AND a.doc_id < b.doc_id), "
    "verified AS (SELECT doc_a, doc_b, common, n_a, n_b, jaccard FROM ("
    "  SELECT c.doc_a, c.doc_b, "
    "  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS common, "
    "  CAST(len(sa.shingles) AS BIGINT) AS n_a, CAST(len(sb.shingles) AS BIGINT) AS n_b, "
    "  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) / "
    "  CAST(len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) AS jaccard "
    "  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b"
    f") WHERE jaccard >= {dedup.JACCARD_THRESHOLD}) "
    "SELECT doc_a, doc_b, common, n_a, n_b, jaccard FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_a "
    "  ORDER BY jaccard DESC, doc_b) AS rn FROM verified"
    ") WHERE rn <= 2",
)
def llm_dedup_minhash_capped(spark, sf_dir):
    """Result-bounded MinHash-LSH (r8 VERDICT #4): each doc keeps its
    2 most-similar verified partners, so a large near-dup clique emits
    O(docs × 2) pairs instead of O(clique²) — the knob that makes the
    pair producer safe at 100 TB."""
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), max_pairs_per_doc=2)


@register(
    "llm_incremental_neardup",
    _BAND_CTE + ", cand AS (SELECT DISTINCT a.doc_id AS delta_id, b.doc_id AS base_id "
    "FROM bandrows a JOIN bandrows b ON a.band = b.band AND a.band_hash = b.band_hash "
    "AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0) "
    "SELECT delta_id, base_id, common, n_delta, n_base, jaccard FROM ("
    "  SELECT c.delta_id, c.base_id, "
    "  CAST(len(list_intersect(sd.shingles, sb.shingles)) AS BIGINT) AS common, "
    "  CAST(len(sd.shingles) AS BIGINT) AS n_delta, CAST(len(sb.shingles) AS BIGINT) AS n_base, "
    "  CAST(len(list_intersect(sd.shingles, sb.shingles)) AS DOUBLE) / "
    "  CAST(len(sd.shingles) + len(sb.shingles) - len(list_intersect(sd.shingles, sb.shingles)) AS DOUBLE) AS jaccard "
    "  FROM cand c JOIN sh sd ON sd.doc_id = c.delta_id JOIN sh sb ON sb.doc_id = c.base_id"
    f") WHERE jaccard >= {dedup.JACCARD_THRESHOLD}",
)
def llm_incremental_neardup(spark, sf_dir):
    """Incremental ingest dedup: every 10th document plays the DELTA
    batch (a new crawl) probing the other 90% as the already-indexed
    BASE corpus — delta bands equi-join the base LSH index, base x base
    and delta x delta pairs are never generated, exact Jaccard verifies
    candidates only.  The production shape for growing a deduped corpus
    without re-running the full pairwise pass.

    The base LSH index is built FIRST and materialized with
    localCheckpoint (in production: read back from the index table the
    previous ingest wrote — dedup.build_lsh_index) so the incremental
    job never re-signs the base corpus; a spy test in test_plans.py
    pins that."""
    docs = _docs(spark, sf_dir)
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    index = dedup.build_lsh_index(base).localCheckpoint()
    return dedup.incremental_neardup(base, delta, base_index=index)


@register(
    "llm_dedup_jaccard",
    _SHINGLE_CTE + ", sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh), "
    "inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh), "
    f"dfok AS (SELECT shingle FROM inv0 GROUP BY shingle HAVING COUNT(*) <= {dedup.MAX_SHINGLE_DF}), "
    "inv AS (SELECT inv0.doc_id, inv0.shingle FROM inv0 JOIN dfok USING (shingle)), "
    "co AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS common "
    "FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2) "
    "SELECT doc_a, doc_b, common, n_a, n_b, jaccard FROM ("
    "  SELECT c.doc_a, c.doc_b, c.common, sa.n_sh AS n_a, sb.n_sh AS n_b, "
    "  CAST(c.common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - c.common AS DOUBLE) AS jaccard "
    "  FROM co c JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b"
    f") WHERE jaccard >= {dedup.JACCARD_THRESHOLD}",
)
def llm_dedup_jaccard(spark, sf_dir):
    """Exact n-gram-Jaccard pairs via inverted shingle index."""
    return dedup.jaccard_pairs(_docs(spark, sf_dir))


# COALESCE(..., 0) mirrors Spark's aggregate() seed: a doc with an
# EMPTY shingle set (under 3 tokens) sums to 0 on both engines, so
# every bit passes >= 0 and both sides emit the all-'1's signature —
# without it DuckDB's list_sum over [] is NULL and the signatures
# diverge (advisor finding; latent until a short-doc fixture appears).
_SIMHASH_CTE = (
    _SHINGLE_CTE + ", "
    "th AS (SELECT doc_id, list_transform(shingles, t -> md5(t)) AS thash FROM sh), "
    "sig AS (SELECT doc_id, array_to_string([CASE WHEN COALESCE(list_sum(list_transform(thash, h -> "
    "2 * (((instr('0123456789abcdef', substr(h, 1 + (j // 4), 1)) - 1 >> (3 - (j % 4))) & 1)) - 1)), 0) >= 0 "
    "THEN '1' ELSE '0' END for j in range(0, 64)], '') AS simhash FROM th)"
)


@register("llm_simhash", _SIMHASH_CTE + " SELECT doc_id, simhash FROM sig")
def llm_simhash(spark, sf_dir):
    """64-bit SimHash signatures (md5-bit majority vote, shuffle-free)."""
    return dedup.simhash_signatures(_docs(spark, sf_dir))


@register(
    "llm_simhash_pairs",
    _SIMHASH_CTE + ", sbands AS (" + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, substr(simhash, {1 + 16 * b}, 16) AS block FROM sig"
        for b in range(4)
    ) + "), "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM sbands a JOIN sbands b ON a.band = b.band AND a.block = b.block "
    "AND a.doc_id < b.doc_id) "
    "SELECT doc_a, doc_b, hamming FROM ("
    "  SELECT c.doc_a, c.doc_b, CAST(len(list_filter(range(1, 65), "
    "  i -> substr(sa.simhash, i, 1) != substr(sb2.simhash, i, 1))) AS BIGINT) AS hamming "
    "  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a JOIN sig sb2 ON sb2.doc_id = c.doc_b"
    f") WHERE hamming <= {dedup.HAMMING_THRESHOLD}",
)
def llm_simhash_pairs(spark, sf_dir):
    """SimHash banded near-dup pairs, exact Hamming verify."""
    return dedup.simhash_pairs(_docs(spark, sf_dir))

_TF_CTE = (
    r"WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') "
    "AS tokens FROM documents), "
    "tf AS (SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf "
    "FROM (SELECT doc_id, unnest(tokens) AS t FROM toks) GROUP BY doc_id, t)"
)


@register(
    "llm_tfidf",
    _TF_CTE + ", "
    "df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
    "n AS (SELECT COUNT(*) AS n FROM documents), "
    "scored AS (SELECT tf.doc_id, tf.term, tf.tf, "
    "  CAST(round(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 6) AS DECIMAL(18,6)) AS tfidf "
    "  FROM tf JOIN df USING (term) CROSS JOIN n), "
    "rked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
    "  ORDER BY tfidf DESC, term) AS rk FROM scored) "
    "SELECT doc_id, term, tf, CAST(tfidf AS DOUBLE) AS tfidf, "
    "CAST(rk AS BIGINT) AS rk FROM rked WHERE rk <= 10",
)
def llm_tfidf(spark, sf_dir):
    """Top-10 TF-IDF terms per document.  Scores are rounded to
    DECIMAL(18,6) before ranking so the top-k cut (and the hash) is
    engine-exact; ties break by term."""
    return retrieval.tfidf_top_terms(_docs(spark, sf_dir))


@register(
    "llm_bm25",
    "WITH qt(qid, term) AS (VALUES "
    + ", ".join(f"('{q}', '{t}')" for q, t in retrieval.BM25_QUERIES)
    + "), "
    r"toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') "
    "AS tokens FROM documents), "
    "lens AS (SELECT doc_id, len(tokens) AS dl FROM toks), "
    "stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM lens), "
    "hits AS (SELECT doc_id, t AS term, COUNT(*) AS tf "
    "  FROM (SELECT doc_id, unnest(tokens) AS t FROM toks) "
    "  WHERE t IN (SELECT DISTINCT term FROM qt) GROUP BY doc_id, t), "
    "df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY term), "
    "contrib AS (SELECT qt.qid, h.doc_id, "
    f"  CAST(round(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * h.tf * {retrieval.K1 + 1.0} / "
    f"    (h.tf + {retrieval.K1} * ({1.0 - retrieval.B} + {retrieval.B} * l.dl / s.avgdl)), 6) "
    "    AS DECIMAL(18,6)) AS part "
    "  FROM hits h JOIN df d USING (term) JOIN qt ON qt.term = h.term "
    "  JOIN lens l ON l.doc_id = h.doc_id CROSS JOIN stats s), "
    "scores AS (SELECT qid, doc_id, CAST(SUM(part) AS DECIMAL(18,6)) AS score "
    "  FROM contrib GROUP BY qid, doc_id), "
    "rked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid "
    "  ORDER BY score DESC, doc_id) AS rk FROM scores) "
    "SELECT qid, doc_id, CAST(score AS DOUBLE) AS score, "
    "CAST(rk AS BIGINT) AS rk FROM rked WHERE rk <= 10",
)
def llm_bm25(spark, sf_dir):
    """Top-10 documents per benchmark query under BM25.  Per-term
    contributions are rounded to DECIMAL(18,6) BEFORE the per-(query,
    doc) sum — an exact, order-independent decimal fold (float
    addition is not associative across Spark partitions)."""
    return retrieval.bm25_search(_docs(spark, sf_dir))

_EMB_CTE = (
    "WITH q AS (SELECT vec_id, label, list_transform(embedding, "
    f"x -> CAST(floor(CAST(x AS DOUBLE) * {similarity.QUANT}) AS BIGINT)) AS qv FROM embeddings), "
    "n AS (SELECT vec_id, label, qv, CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS nq FROM q)"
)

_SQL_COS = (
    "CAST(list_sum([{a}.qv[i] * {b}.qv[i] for i in range(1, len({a}.qv)+1)]) AS DOUBLE)"
    " / sqrt(CAST({a}.nq AS DOUBLE) * CAST({b}.nq AS DOUBLE))"
)


def _sql_band_bits(band: int) -> str:
    bits = []
    for p in range(band * similarity.PLANES_PER_BAND, (band + 1) * similarity.PLANES_PER_BAND):
        w = "[" + ",".join(str(v) for v in similarity.WEIGHTS[p]) + "]"
        bits.append(
            f"CASE WHEN list_sum([qv[i] * ({w})[i] for i in range(1, len(qv)+1)]) >= 0 "
            "THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


# within-bucket locality-order keys (r12): exact BIGINT projections
# onto the two dedicated order-planes — near-dups have near-equal raw
# dots even when their sign bits straddle a bucketing hyperplane
def _sql_order_dot(i: int) -> str:
    w = "[" + ",".join(str(v) for v in similarity.ORDER_PLANES[i]) + "]"
    return f"list_sum([qv[i] * ({w})[i] for i in range(1, len(qv)+1)])"


_BKT_CTE = _EMB_CTE + ", bkt AS (" + " UNION ALL ".join(
    f"SELECT vec_id, qv, nq, {b} AS band, {_sql_band_bits(b)} AS bucket, "
    f"{_sql_order_dot(0)} AS ord0, {_sql_order_dot(1)} AS ord1 FROM n"
    for b in range(similarity.N_PLANES // similarity.PLANES_PER_BAND)
) + ")"


def _emb(spark, sf_dir):
    from mysql_cdc_spark.sources.io import read_table

    return read_table(spark, sf_dir, "embeddings")


@register(
    "llm_knn",
    _EMB_CTE + ", pairs AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, "
    + _SQL_COS.format(a="a", b="b") + " AS cosine "
    f"FROM n a, n b WHERE a.vec_id < {similarity.DEFAULT_N_QUERIES} AND b.vec_id != a.vec_id) "
    "SELECT query_id, neighbor_id, cosine, rank FROM ("
    "  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id "
    "  ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM pairs"
    f") WHERE rank <= {similarity.DEFAULT_K}",
)
def llm_knn(spark, sf_dir):
    """Exact brute-force cosine top-k (broadcast queries, sharded
    two-stage top-k — the exact baseline for ann_lsh)."""
    return similarity.knn(_emb(spark, sf_dir))


# Multi-probe bucket variants (r14): the query probes its own bucket
# plus every Hamming-1 variant — the IDENTICAL construction the engine
# runs (similarity._probe_buckets); substring semantics (1-based,
# clamped) agree between Spark SQL and DuckDB.
def _probe_union_sql() -> str:
    n = similarity.PLANES_PER_BAND
    variants = ["bucket"]
    for i in range(n):
        variants.append(
            f"substring(bucket, 1, {i}) || "
            f"(CASE WHEN substring(bucket, {i + 1}, 1) = '1' THEN '0' ELSE '1' END) || "
            f"substring(bucket, {i + 2}, {n - i - 1})"
        )
    return " UNION ALL ".join(
        f"SELECT vec_id, band, {v} AS bucket, ord0, ord1 FROM bkt "
        f"WHERE vec_id < {similarity.DEFAULT_N_QUERIES}"
        for v in variants
    )


# Re-rank fan-in bound — similarity.ANN_DEFAULT_CAP (r16: the cap IS
# the default; capped was measured bounded AND faster at x100).  Small
# enough to BIND at sf0.01 (multi-probe candidate sets run well past
# it), large enough that top-k quality is visibly a cap trade-off.
ANN_LSH_CAP = similarity.ANN_DEFAULT_CAP

# The CAPPED candidate pipeline (hit counting, integer-exact locality
# distances, deterministic cut, exact re-rank) — the default plan.
_ANN_CAPPED_SQL = (
    _BKT_CTE + f", probes AS ({_probe_union_sql()})"
    ", hits AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id, "
    "COUNT(*) AS n_hits, "
    "MAX(ABS(qq.ord0 - c.ord0) + ABS(qq.ord1 - c.ord1)) AS ord_dist "
    "FROM probes qq JOIN bkt c ON qq.band = c.band AND qq.bucket = c.bucket "
    "AND c.vec_id != qq.vec_id GROUP BY 1, 2), "
    "capped AS (SELECT query_id, neighbor_id FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
    "  ORDER BY n_hits DESC, ord_dist, neighbor_id) AS cand_rank FROM hits"
    f") WHERE cand_rank <= {ANN_LSH_CAP}), "
    "scored AS (SELECT capped.query_id, capped.neighbor_id, "
    + _SQL_COS.format(a="a", b="b") + " AS cosine "
    "FROM capped JOIN n a ON a.vec_id = capped.query_id "
    "JOIN n b ON b.vec_id = capped.neighbor_id) "
    "SELECT query_id, neighbor_id, cosine, rank FROM ("
    "  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id "
    "  ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM scored"
    f") WHERE rank <= {similarity.DEFAULT_K}"
)


@register("llm_ann_lsh", _ANN_CAPPED_SQL)
def llm_ann_lsh(spark, sf_dir):
    """Approximate top-k via sign-random-projection LSH buckets
    (MULTI-PROBE: own + Hamming-1 buckets per query) + exact re-rank
    (bucketed equi-join, never all-pairs).  The DEFAULT form is
    candidate-CAPPED (r16, x100-measured faster AND bounded): each
    query re-ranks at most ANN_LSH_CAP candidates, kept by (band-hit
    count DESC, order-plane |Δ| ASC, neighbor_id) — the multi-probe
    fan-in bound that makes the 170×-shuffle-at-x100 growth an
    explicit O(queries × cap) before the exact cosine stage."""
    return similarity.ann_lsh(_emb(spark, sf_dir))


@register(
    "llm_ann_lsh_uncapped",
    _BKT_CTE + f", probes AS ({_probe_union_sql()})"
    ", cand AS (SELECT DISTINCT qq.vec_id AS query_id, c.vec_id AS neighbor_id "
    "FROM probes qq JOIN bkt c ON qq.band = c.band AND qq.bucket = c.bucket "
    "AND c.vec_id != qq.vec_id), "
    "scored AS (SELECT cand.query_id, cand.neighbor_id, "
    + _SQL_COS.format(a="a", b="b") + " AS cosine "
    "FROM cand JOIN n a ON a.vec_id = cand.query_id JOIN n b ON b.vec_id = cand.neighbor_id) "
    "SELECT query_id, neighbor_id, cosine, rank FROM ("
    "  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id "
    "  ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM scored"
    f") WHERE rank <= {similarity.DEFAULT_K}",
)
def llm_ann_lsh_uncapped(spark, sf_dir):
    """The `max_candidates_per_query=None` OPT-OUT of the default
    candidate cap: the full multi-probe candidate set reaches the
    exact re-rank (highest recall — copies fixture 0.924/0.8 vs
    0.788/0.4 capped — at unbounded fan-in; the capped default is
    the 100 TB plan)."""
    return similarity.ann_lsh(
        _emb(spark, sf_dir), max_candidates_per_query=None
    )


# Chain-bounded candidate CTE (r11: the all-bucket-pairs cand was
# |bucket|² — one degenerate 13.5k-member bucket at 10× data spilled
# 128 GB; see similarity.neardup_candidates).  Identical chain logic
# on both engines: per (band, bucket), each member pairs with its next
# CHAIN_WINDOW successors in (ord0, ord1, vec_id) locality order
# (r12: raw order-plane projections — near-equal for near-dups even
# across a straddled sign bit; pairs LEAST/GREATEST-normalized).
_CHAIN_CAND_CTE = (
    ", chain AS ("
    + " UNION ALL ".join(
        f"SELECT vec_id AS v1, LEAD(vec_id, {i}) OVER "
        "(PARTITION BY band, bucket ORDER BY ord0, ord1, vec_id) AS v2 FROM bkt"
        for i in range(1, similarity.CHAIN_WINDOW + 1)
    )
    + "), cand AS (SELECT DISTINCT LEAST(v1, v2) AS vec_a, "
    "GREATEST(v1, v2) AS vec_b FROM chain WHERE v2 IS NOT NULL)"
)


@register(
    "llm_embed_neardup",
    _BKT_CTE + _CHAIN_CAND_CTE + " "
    "SELECT vec_a, vec_b, cosine FROM ("
    "  SELECT cand.vec_a, cand.vec_b, " + _SQL_COS.format(a="a", b="b") + " AS cosine "
    "  FROM cand JOIN n a ON a.vec_id = cand.vec_a JOIN n b ON b.vec_id = cand.vec_b"
    f") WHERE cosine >= {similarity.NEARDUP_COS}",
)
def llm_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs via chain-bounded LSH-bucket
    candidates + exact verify (O(n·bands·chain) candidate volume)."""
    return similarity.embedding_neardup_pairs(_emb(spark, sf_dir))


def _pointer_jump_closure_sql(seed: str, rounds: int = 25) -> str:
    """Min-label connected components as UNROLLED pointer-jumping
    rounds — the SAME construction the engine runs
    (corpus.duplicate_components: per round, label := least(own label,
    min neighbor label), then label := label(label)), expressed as
    chained MATERIALIZED CTEs so DuckDB evaluates each round once.

    Replaces the recursive-CTE transitive REACHABILITY closure, whose
    row count is Σ component_size² — the engine itself refuses to pay
    all-pairs costs, and after the r12 recall fix grew real embedding
    components enough that the gate paid 630 s at sf0.1 for a closure
    the engine computes in seconds (r12 VERDICT "what's wrong" #3).
    This form is O(edges) per round × `rounds`.

    `rounds` mirrors the engine's max_iter=25: pointer jumping halves
    remaining path length per round, so 25 rounds cover any diameter
    ≤ 2^25; the engine RAISES if unconverged at 25, so equal round
    counts guarantee result parity whenever the engine returns at all
    (extra rounds past the fixpoint are no-ops).

    `seed` is SQL for (vec, lab) = (node_id, node_id) over ALL nodes.
    Expects an `edges(src, dst)` CTE (both directions) in scope;
    leaves `comp(vec, component)` in scope."""
    parts = [f"l0 AS MATERIALIZED ({seed})"]
    for k in range(rounds):
        parts.append(
            f"n{k} AS MATERIALIZED (SELECT e.src AS vec, MIN(l.lab) AS nm "
            f"FROM edges e JOIN l{k} l ON l.vec = e.dst GROUP BY e.src)"
        )
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT l.vec, "
            f"LEAST(l.lab, COALESCE(n.nm, l.lab)) AS lab "
            f"FROM l{k} l LEFT JOIN n{k} n USING (vec))"
        )
        parts.append(
            f"l{k + 1} AS MATERIALIZED (SELECT s.vec, "
            f"LEAST(s.lab, COALESCE(p.lab, s.lab)) AS lab "
            f"FROM s{k} s LEFT JOIN s{k} p ON p.vec = s.lab)"
        )
    parts.append(f"comp AS (SELECT vec, lab AS component FROM l{rounds})")
    return ", ".join(parts)


@register(
    "llm_semantic_dedup",
    _BKT_CTE
    + _CHAIN_CAND_CTE + ", "
    "vp AS (SELECT vec_a, vec_b FROM ("
    "  SELECT cand.vec_a, cand.vec_b, " + _SQL_COS.format(a="a", b="b") + " AS cosine "
    "  FROM cand JOIN n a ON a.vec_id = cand.vec_a JOIN n b ON b.vec_id = cand.vec_b"
    f") WHERE cosine >= {similarity.NEARDUP_COS}), "
    # MATERIALIZED: edges feeds all 25 unrolled closure rounds — left
    # inline, DuckDB re-evaluates the whole candidate+cosine pipeline
    # once per round (measured 3x the OLD oracle's total)
    "edges AS MATERIALIZED (SELECT vec_a AS src, vec_b AS dst FROM vp "
    "UNION ALL SELECT vec_b, vec_a FROM vp), "
    + _pointer_jump_closure_sql("SELECT vec_id AS vec, vec_id AS lab FROM embeddings")
    + " SELECT vec AS vec_id, component, "
    "CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS component_size, "
    "vec = component AS keep FROM comp",
)
def llm_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup as a KEEP/DROP decision list:
    embedding-cosine near-dup pairs (LSH-bucketed candidates + exact
    quantized-cosine verify, never all-pairs) closed into connected
    components by min-label propagation; each vector gets its
    component, the component size, and keep=True for the canonical
    (minimum-id) member — the composition of the two verified
    primitives an actual dedup pass runs.  Oracle = the same bucketed
    pair derivation + a recursive-CTE reachability closure."""
    emb = _emb(spark, sf_dir)
    pairs = similarity.embedding_neardup_pairs(emb).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    comp = corpus.duplicate_components(
        emb.select(F.col("vec_id").alias("doc_id")), pairs
    )
    return comp.select(
        F.col("doc_id").alias("vec_id"),
        "component",
        "component_size",
        F.col("is_canonical").alias("keep"),
    )


@register(
    "llm_embed_covariance",
    _EMB_CTE
    + ", e AS (SELECT vec_id, unnest(range(0, len(qv))) AS i, "
    "unnest(qv) AS vi FROM q) "
    "SELECT CAST(a.i AS BIGINT) AS dim_i, CAST(b.i AS BIGINT) AS dim_j, "
    "CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(a.vi) AS BIGINT) AS sum_i, CAST(SUM(b.vi) AS BIGINT) AS sum_j, "
    "CAST(SUM(a.vi * b.vi) AS BIGINT) AS sum_ij "
    "FROM e a JOIN e b USING (vec_id) WHERE a.i <= b.i GROUP BY 1, 2",
)
def llm_embed_covariance(spark, sf_dir):
    """Distributed half of PCA/OPQ over the embedding corpus: exact
    integer second-moment sums per dimension pair (upper triangle),
    one shuffle-free double explode + a map-side-combined groupBy on
    d(d+1)/2 keys (similarity.embedding_covariance).  The
    eigendecomposition consumes these on the driver as a constant
    d x d problem (similarity.pca_rotation) — the correct
    cluster/driver split at any corpus size."""
    return similarity.embedding_covariance(_emb(spark, sf_dir))


_IVF_CTE = _EMB_CTE + (
    ", cent AS (SELECT label, dim, CAST(floor(CAST(SUM(qval) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cq "
    "FROM (SELECT label, unnest(range(0, len(qv))) AS dim, unnest(qv) AS qval FROM q) GROUP BY label, dim), "
    "cvec AS (SELECT label, list(cq ORDER BY dim) AS cqv FROM cent GROUP BY label), "
    "cn AS (SELECT label, cqv, CAST(list_sum(list_transform(cqv, v -> v * v)) AS BIGINT) AS ncq FROM cvec)"
)

_IVF_CELL_COS = (
    "CAST(list_sum([n.qv[i] * c.cqv[i] for i in range(1, len(n.qv)+1)]) AS DOUBLE)"
    " / sqrt(CAST(n.nq AS DOUBLE) * CAST(c.ncq AS DOUBLE))"
)


@register(
    "llm_ann_ivf",
    _IVF_CTE + ", assign AS (SELECT vec_id, cell FROM ("
    "  SELECT n.vec_id, c.label AS cell, ROW_NUMBER() OVER (PARTITION BY n.vec_id "
    f"  ORDER BY ({_IVF_CELL_COS}) DESC, c.label) AS cr FROM n, cn c) WHERE cr = 1), "
    "probe AS (SELECT vec_id, cell FROM ("
    "  SELECT n.vec_id, c.label AS cell, ROW_NUMBER() OVER (PARTITION BY n.vec_id "
    f"  ORDER BY ({_IVF_CELL_COS}) DESC, c.label) AS cr FROM n, cn c "
    f"  WHERE n.vec_id < {similarity.DEFAULT_N_QUERIES}) WHERE cr <= {similarity.IVF_PROBES}), "
    "cand AS (SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id "
    "FROM probe p JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id), "
    "scored AS (SELECT cand.query_id, cand.neighbor_id, "
    + _SQL_COS.format(a="a", b="b") + " AS cosine "
    "FROM cand JOIN n a ON a.vec_id = cand.query_id JOIN n b ON b.vec_id = cand.neighbor_id) "
    "SELECT query_id, neighbor_id, cosine, rank FROM ("
    "  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id "
    "  ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM scored"
    f") WHERE rank <= {similarity.DEFAULT_K}",
)
def llm_ann_ivf(spark, sf_dir):
    """IVF-flavored ANN: exact-integer centroid cells as the coarse
    quantizer, queries probe 2 cells, exact re-rank inside cells."""
    return similarity.ann_ivf(_emb(spark, sf_dir))


def _kmeans_oracle_sql() -> str:
    """Unroll the fixed-iteration Lloyd loop as chained CTEs — the
    same exact-integer argmin + floor-mean update the Spark operator
    runs, so assignments hash-match bit-for-bit."""
    dist = "list_sum([(q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]) for i in range(1, len(q.qv)+1)])"
    parts = [
        f"c0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {similarity.KMEANS_K})"
    ]
    for it in range(similarity.KMEANS_ITERS):
        parts.append(
            f"a{it} AS (SELECT vec_id, qv, cid, dist FROM ("
            f"  SELECT q.vec_id, q.qv, c.cid, {dist} AS dist, "
            f"  ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {dist}, c.cid) AS rn "
            f"  FROM q, c{it} c) WHERE rn = 1)"
        )
        if it + 1 < similarity.KMEANS_ITERS:
            parts.append(
                f"c{it + 1} AS (SELECT cid, list(cvd ORDER BY dim) AS cv FROM ("
                f"  SELECT cid, dim, CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cvd "
                f"  FROM (SELECT cid, unnest(range(0, len(qv))) AS dim, unnest(qv) AS v FROM a{it}) "
                f"  GROUP BY cid, dim) GROUP BY cid)"
            )
    last = f"a{similarity.KMEANS_ITERS - 1}"
    return (
        _EMB_CTE + ", " + ", ".join(parts)
        + f" SELECT vec_id, CAST(cid AS BIGINT) AS cid, CAST(dist AS BIGINT) AS dist FROM {last}"
    )


@register("llm_kmeans", _kmeans_oracle_sql())
def llm_kmeans(spark, sf_dir):
    """Distributed Lloyd k-means over quantized integer embeddings,
    fixed iterations: exact BIGINT squared-L2 argmin (tie → lower
    centroid id), floor(sum/n) centroid updates.  Per iteration: one
    K-row broadcast + one map-side-combined (cid, dim) shuffle."""
    return similarity.kmeans_assign(_emb(spark, sf_dir))


@register(
    "llm_kmeans_sizes",
    _kmeans_oracle_sql().replace(
        "SELECT vec_id, CAST(cid AS BIGINT) AS cid, CAST(dist AS BIGINT) AS dist FROM",
        "SELECT CAST(cid AS BIGINT) AS cid, CAST(COUNT(*) AS BIGINT) AS n_members, "
        "CAST(SUM(dist) AS BIGINT) AS total_dist FROM",
    ) + " GROUP BY cid",
)
def llm_kmeans_sizes(spark, sf_dir):
    """Cluster cardinalities + exact total within-cluster squared
    distance after the fixed k-means iterations."""
    return similarity.kmeans_sizes(_emb(spark, sf_dir))


@register(
    "llm_label_centroids",
    _EMB_CTE + ", e AS (SELECT label, unnest(range(0, len(qv))) AS dim, unnest(qv) AS qval FROM q) "
    "SELECT label, CAST(dim AS INT) AS dim, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(qval) AS BIGINT) AS qsum, "
    f"CAST(SUM(qval) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / {float(similarity.QUANT)} AS mean "
    "FROM e GROUP BY label, dim",
)
def llm_label_centroids(spark, sf_dir):
    """Exact per-label embedding centroids (integer sums per (label,
    dim), one map-side-combined shuffle)."""
    return similarity.label_centroids(_emb(spark, sf_dir))


# ---------------------------------------------------------------------------
# End-to-end corpus curation: dedup + quality filter + per-language
# stats composed into one pipeline — the shape of a real training-data
# job (every stage is an operator already verified above).
# ---------------------------------------------------------------------------


# The DuckDB quality-score formula over a `tokens` list column —
# shared by both curated-corpus variants (mirrors functions/text.py's
# quality_score exactly).
_QUALITY_EXPR_SQL = (
    f"CAST(len(list_filter(tokens, x -> x IN ({', '.join(repr(w) for w in T.STOPWORDS)}))) AS DOUBLE)"
    " / CAST(len(tokens) AS DOUBLE) * 0.3 + "
    "CAST(len(list_filter(tokens, x -> regexp_matches(x, '^[a-z]+$'))) AS DOUBLE)"
    " / CAST(len(tokens) AS DOUBLE) * 0.5 + "
    "CAST(CASE WHEN len(tokens) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END AS DOUBLE) * 0.2"
)


@register(
    "llm_curated_corpus",
    "WITH norm AS (SELECT doc_id, lang, lower(trim(text)) AS norm_text FROM documents), "
    r"toksl AS (SELECT doc_id, lang, regexp_split_to_array(norm_text, '\s+') AS tokens FROM norm), "
    "sh AS (SELECT doc_id, list_distinct(CASE WHEN len(tokens) >= 3 THEN "
    "[tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] for i in range(1, len(tokens)-1)] "
    "ELSE [] END) AS shingles FROM toksl), "
    "sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh), "
    "inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh), "
    f"dfok AS (SELECT shingle FROM inv0 GROUP BY shingle HAVING COUNT(*) <= {dedup.MAX_SHINGLE_DF}), "
    "inv AS (SELECT inv0.doc_id, inv0.shingle FROM inv0 JOIN dfok USING (shingle)), "
    "co AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS common "
    "FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2), "
    "pairs AS (SELECT doc_b FROM co c JOIN sizes sa ON sa.doc_id = c.doc_a "
    "JOIN sizes sb ON sb.doc_id = c.doc_b "
    "WHERE CAST(c.common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - c.common AS DOUBLE) >= "
    f"{dedup.JACCARD_THRESHOLD}), "
    "dropped AS (SELECT DISTINCT doc_b AS doc_id FROM pairs), "
    "qual AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens, "
    + _QUALITY_EXPR_SQL
    + " AS quality FROM toksl) "
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens "
    "FROM toksl t JOIN qual USING (doc_id) "
    "WHERE qual.quality >= 0.5 AND t.doc_id NOT IN (SELECT doc_id FROM dropped) "
    "GROUP BY lang",
)
def llm_curated_corpus(spark, sf_dir):
    """The composed training-data job: drop near-duplicates (exact
    inverted-index Jaccard, keep the lower doc_id), drop low-quality
    docs, and report the surviving corpus per language."""
    docs = _docs(spark, sf_dir)
    dropped = (
        dedup.jaccard_pairs(docs)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    quality = T.quality_score(docs).select("doc_id", "n_tokens", "quality")
    return (
        docs.join(dropped, "doc_id", "left_anti")
        .join(quality, "doc_id")
        .filter(F.col("quality") >= 0.5)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


@register(
    "llm_curated_corpus_cc",
    _BAND_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + ", cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bandrows a JOIN bandrows b ON a.band = b.band AND a.band_hash = b.band_hash "
    "AND a.doc_id < b.doc_id), "
    "vp AS (SELECT doc_a, doc_b FROM ("
    "  SELECT c.doc_a, c.doc_b, "
    "  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) / "
    "  CAST(len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) AS jaccard "
    "  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b"
    f") WHERE jaccard >= {dedup.JACCARD_THRESHOLD}), "
    "edges AS (SELECT doc_a AS src, doc_b AS dst FROM vp "
    "UNION ALL SELECT doc_b, doc_a FROM vp), "
    "reach AS (SELECT doc_id AS doc, doc_id AS other FROM documents "
    "UNION SELECT r.doc, e.dst FROM reach r JOIN edges e ON e.src = r.other), "
    "comp AS (SELECT doc, MIN(other) AS component FROM reach GROUP BY doc), "
    "qual AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens, "
    + _QUALITY_EXPR_SQL
    + " AS quality FROM toks) "
    "SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(q.n_tokens) AS BIGINT) AS total_tokens "
    "FROM documents d "
    "JOIN comp c ON c.doc = d.doc_id AND c.doc = c.component "
    "JOIN qual q ON q.doc_id = d.doc_id "
    "WHERE q.quality >= 0.5 GROUP BY d.lang",
)
def llm_curated_corpus_cc(spark, sf_dir):
    """Cluster-correct curation: keep only each duplicate CLUSTER's
    canonical doc (connected components over verified MinHash pairs),
    then quality-filter and report per language.  Stricter than the
    pair-based drop in llm_curated_corpus: in a star-shaped cluster
    (1-3, 2-3) the pair rule keeps both 1 and 2; components keep only
    the canonical 1."""
    docs = _docs(spark, sf_dir)
    keep = (
        corpus.duplicate_components(docs)
        .filter(F.col("is_canonical"))
        .select("doc_id")
    )
    quality = T.quality_score(docs).select("doc_id", "n_tokens", "quality")
    return (
        docs.join(keep, "doc_id")
        .join(quality, "doc_id")
        .filter(F.col("quality") >= 0.5)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


@register(
    "llm_jsonl_ingest",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def llm_jsonl_ingest(spark, sf_dir):
    """Raw-corpus ingest from gzip JSONL — the wire format training
    data usually arrives in: documents are exported once to
    .jsonl.gz (scratch, idempotent) and read back with an explicit
    schema (no inference job at scale); the round trip must be
    lossless vs the parquet original.  At 100 TB a JSONL directory is
    thousands of gzip shards; gzip is splittable per FILE, so shard
    count = parallelism — exactly how public corpora ship."""
    import pathlib

    out = pathlib.Path(_STREAM_TMP) / f"jsonl_{pathlib.Path(sf_dir).name}_v{_FIXTURE_VERSION}"
    if not (out / "_SUCCESS").exists():
        (
            _docs(spark, sf_dir)
            .repartition(4)
            .write.mode("overwrite")
            .option("compression", "gzip")
            .json(str(out))
        )
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    return (
        spark.read.schema(schema)
        .json(str(out))
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


@register(
    "llm_split_assign",
    "SELECT doc_id, lang, CAST(b AS BIGINT) AS bucket, "
    f"CASE WHEN b < {corpus.TRAIN_CUT} THEN 'train' "
    f"WHEN b < {corpus.VAL_CUT} THEN 'val' ELSE 'test' END AS split "
    "FROM (SELECT doc_id, lang, "
    "(instr('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 "
    "+ instr('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS b "
    "FROM documents)",
)
def llm_split_assign(spark, sf_dir):
    """Deterministic hash-based train/val/test assignment (stable under
    reruns and incremental corpus growth; no RNG, no shuffle)."""
    return corpus.split_assign(_docs(spark, sf_dir))


@register(
    "llm_length_buckets",
    "WITH toks AS (SELECT lang, "
    r"CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens "
    "FROM documents) "
    "SELECT lang, CAST(" + corpus._bucket_case("n_tokens") + " AS BIGINT) AS bucket, "
    "CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens "
    "FROM toks GROUP BY 1, 2",
)
def llm_length_buckets(spark, sf_dir):
    """Power-of-two token-length histogram per language — the input to
    a sequence-packing/batching stage."""
    return corpus.length_buckets(_docs(spark, sf_dir))


# PII scan: the fixture docs carry no PII, so both sides inject the
# same deterministic synthetic PII before scanning — the machinery
# (shared RE2-safe patterns, fixed redaction order) is what's checked.
# CAST(... AS STRING): STRING is valid in both Spark SQL and DuckDB
# (where it aliases VARCHAR), so the expression is shared verbatim.
_PII_AUG = (
    "text || CASE WHEN doc_id % 3 = 0 "
    "THEN ' contact user' || CAST(doc_id AS STRING) || '@example.com' ELSE '' END "
    "|| CASE WHEN doc_id % 5 = 0 "
    "THEN ' from 10.0.' || CAST(doc_id % 256 AS STRING) || '.1' ELSE '' END "
    "|| CASE WHEN doc_id % 7 = 0 "
    "THEN ' call +1 555 ' || CAST(1000 + doc_id % 9000 AS STRING) ELSE '' END"
)


@register(
    "llm_pii_scan",
    "WITH aug AS (SELECT doc_id, " + _PII_AUG + " AS text FROM documents) "
    "SELECT doc_id, "
    + ", ".join(
        f"CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT) AS {name}"
        for p, name in [
            (pii.EMAIL_RE, "n_emails"),
            (pii.IPV4_RE, "n_ips"),
            (pii.PHONE_RE, "n_phones"),
        ]
    )
    + ", "
    + "regexp_replace(regexp_replace(regexp_replace(text, "
    f"'{pii.EMAIL_RE}', '<EMAIL>', 'g'), "
    f"'{pii.IPV4_RE}', '<IP>', 'g'), "
    f"'{pii.PHONE_RE}', '<PHONE>', 'g') AS redacted_text "
    "FROM aug",
)
def llm_pii_scan(spark, sf_dir):
    """PII detection + redaction (emails / IPv4 / phone numbers) as
    JVM-side regex expressions; patterns are RE2-safe and shared
    verbatim with the oracle."""
    augmented = _docs(spark, sf_dir).select(
        "doc_id", F.expr(_PII_AUG).alias("text")
    )
    return pii.pii_scan(augmented)


@register(
    "llm_contamination",
    _SHINGLE_CTE
    + ", inv0 AS (SELECT doc_id, doc_id % 20 = 0 AS bench, unnest(shingles) AS shingle FROM sh), "
    f"dfok AS (SELECT shingle FROM inv0 GROUP BY shingle HAVING COUNT(*) <= {dedup.MAX_SHINGLE_DF}), "
    "inv AS (SELECT inv0.* FROM inv0 JOIN dfok USING (shingle)) "
    "SELECT t.doc_id AS train_doc_id, b.doc_id AS bench_doc_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_shared "
    "FROM inv t JOIN inv b ON t.shingle = b.shingle AND NOT t.bench AND b.bench "
    "GROUP BY 1, 2 HAVING COUNT(*) >= 2",
)
def llm_contamination(spark, sf_dir):
    """Benchmark-contamination scan: training docs sharing ≥2 distinct
    word-3-gram shingles with the held-out set (doc_id % 20 = 0), via
    capped inverted-index equi-join — never all-pairs."""
    from mysql_cdc_spark.operators.contamination import benchmark_contamination

    return benchmark_contamination(
        _docs(spark, sf_dir), F.col("doc_id") % 20 == 0
    )


@register(
    "llm_pack_sequences",
    "WITH toks AS (SELECT doc_id, "
    r"CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens "
    "FROM documents), "
    "placed AS (SELECT doc_id, n_tokens, "
    "CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start "
    "FROM toks) "
    "SELECT doc_id, n_tokens, tok_start, "
    "CAST(tok_start // 512 AS BIGINT) AS seq_start, "
    "CAST(greatest(tok_start + n_tokens - 1, tok_start) // 512 AS BIGINT) AS seq_end "
    "FROM placed",
)
def llm_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing (capacity 512): global token
    offsets via the chunked distributed prefix scan, then narrow
    arithmetic to sequence ranges."""
    return corpus.pack_sequences(_docs(spark, sf_dir), capacity=512)


@register(
    "llm_dup_components",
    _BAND_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + ", cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bandrows a JOIN bandrows b ON a.band = b.band AND a.band_hash = b.band_hash "
    "AND a.doc_id < b.doc_id), "
    "vp AS (SELECT doc_a, doc_b FROM ("
    "  SELECT c.doc_a, c.doc_b, "
    "  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) / "
    "  CAST(len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) AS jaccard "
    "  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b"
    f") WHERE jaccard >= {dedup.JACCARD_THRESHOLD}), "
    "edges AS (SELECT doc_a AS src, doc_b AS dst FROM vp "
    "UNION ALL SELECT doc_b, doc_a FROM vp), "
    "reach AS (SELECT doc_id AS doc, doc_id AS other FROM documents "
    "UNION SELECT r.doc, e.dst FROM reach r JOIN edges e ON e.src = r.other), "
    "comp AS (SELECT doc, MIN(other) AS component FROM reach GROUP BY doc) "
    "SELECT doc AS doc_id, component, "
    "CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS component_size, "
    "doc = component AS is_canonical FROM comp",
)
def llm_dup_components(spark, sf_dir):
    """Connected components over verified MinHash near-dup pairs
    (iterative min-label propagation; oracle = recursive CTE closure):
    pairs → keep/drop decisions."""
    return corpus.duplicate_components(_docs(spark, sf_dir))


@register(
    "llm_incremental_components",
    # identical full-recompute oracle as llm_dup_components: the
    # incremental (condensed-graph) labeling must equal it exactly.
    ORACLES["llm_dup_components"],
)
def llm_incremental_components(spark, sf_dir):
    """Incremental duplicate components: the 10% delta batch folds
    into the pre-componentized 90% base via graph condensation — new
    edges map through existing labels, components run on the tiny
    condensed graph, one relabel join (corpus.incremental_components).
    Hash-equal to the from-scratch components over the full corpus.

    The base labeling is computed FIRST and materialized with
    localCheckpoint — the persisted-index pattern (in production it
    would be read back from a table written by the previous run) — so
    the incremental job's own plan contains no base-corpus LSH or CC
    stage; its cost is O(delta + touched components).
    `tests/test_plans.py::test_incremental_components_skips_base_lsh_with_persisted_labels`
    asserts exactly that on the executed plan."""
    from mysql_cdc_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs(spark, sf_dir)
    base = docs.filter(F.col("doc_id") % 10 != 0)
    base_labels = corpus.duplicate_components(
        base, minhash_lsh_pairs(base)
    ).localCheckpoint()
    return corpus.incremental_components(
        base, docs.filter(F.col("doc_id") % 10 == 0), base_labels=base_labels
    )


@register(
    "llm_corpus_diff",
    "WITH oldv AS (SELECT doc_id, md5(lower(trim(text))) AS h, "
    "CAST(n_chars AS BIGINT) AS c FROM documents WHERE doc_id % 11 <> 0), "
    "newv AS (SELECT doc_id, md5(lower(trim("
    "CASE WHEN doc_id % 7 = 0 THEN 'edit ' || text ELSE text END))) AS h, "
    "CAST(n_chars AS BIGINT) AS c FROM documents WHERE doc_id % 13 <> 0) "
    "SELECT COALESCE(oldv.doc_id, newv.doc_id) AS doc_id, "
    "CASE WHEN oldv.h IS NULL THEN 'added' "
    "WHEN newv.h IS NULL THEN 'removed' "
    "WHEN oldv.h = newv.h THEN 'unchanged' ELSE 'changed' END AS status, "
    "oldv.c AS old_chars, newv.c AS new_chars "
    "FROM oldv FULL OUTER JOIN newv ON oldv.doc_id = newv.doc_id",
)
def llm_corpus_diff(spark, sf_dir):
    """Snapshot-versioning diff between two corpus versions (the audit
    before retraining on a crawl refresh): v1 drops every 11th doc
    (appears as `added` in v2), v2 drops every 13th (`removed`) and
    edits every 7th's text (`changed`); everything else `unchanged`.
    One full-outer shuffle join on doc_id over per-side content
    hashes — content never crosses the exchange
    (corpus.corpus_diff)."""
    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 11 != 0)
    new = docs.filter(F.col("doc_id") % 13 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.lit("edit "), F.col("text"))
        ).otherwise(F.col("text")),
    )
    return corpus.corpus_diff(old, new)


# V2-snapshot variant of the shingle→band CTE chain: same pipeline,
# but over the edited/filtered second corpus version.
_V2_BAND_CTE = _BAND_CTE.replace(
    "WITH norm AS (SELECT doc_id, lower(trim(text)) AS norm_text FROM documents), ",
    "WITH v2 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'edit ' || text "
    "ELSE text END AS text FROM documents WHERE doc_id % 13 <> 0), "
    "norm AS (SELECT doc_id, lower(trim(text)) AS norm_text FROM v2), ",
)


@register(
    "llm_refresh_pipeline",
    _V2_BAND_CTE
    + ", v1h AS (SELECT doc_id, md5(lower(trim(text))) AS h FROM documents "
    "WHERE doc_id % 11 <> 0), "
    "v2h AS (SELECT doc_id, md5(norm_text) AS h FROM norm), "
    "st AS (SELECT v2h.doc_id, CASE WHEN v1h.h IS NULL THEN 'added' "
    "WHEN v1h.h = v2h.h THEN 'unchanged' ELSE 'changed' END AS status "
    "FROM v2h LEFT JOIN v1h ON v1h.doc_id = v2h.doc_id), "
    "delta AS (SELECT doc_id, status FROM st WHERE status <> 'unchanged'), "
    "bse AS (SELECT doc_id FROM st WHERE status = 'unchanged'), "
    "cand AS (SELECT DISTINCT a.doc_id AS delta_id, bb.doc_id AS base_id "
    "FROM bandrows a JOIN delta d ON a.doc_id = d.doc_id "
    "JOIN bandrows bb ON a.band = bb.band AND a.band_hash = bb.band_hash "
    "JOIN bse ON bb.doc_id = bse.doc_id), "
    "ver AS (SELECT delta_id, base_id, jac FROM ("
    "  SELECT c.delta_id, c.base_id, "
    "  CAST(len(list_intersect(sd.shingles, sb.shingles)) AS DOUBLE) / "
    "  CAST(len(sd.shingles) + len(sb.shingles) "
    "   - len(list_intersect(sd.shingles, sb.shingles)) AS DOUBLE) AS jac "
    "  FROM cand c JOIN sh sd ON sd.doc_id = c.delta_id "
    "  JOIN sh sb ON sb.doc_id = c.base_id"
    f") WHERE jac >= {dedup.JACCARD_THRESHOLD}), "
    "top AS (SELECT delta_id, base_id, jac FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY delta_id "
    "  ORDER BY jac DESC, base_id) AS rn FROM ver) WHERE rn = 1) "
    "SELECT d.doc_id, d.status, "
    "CASE WHEN top.base_id IS NULL THEN 'keep' ELSE 'drop_dup' END AS action, "
    "top.base_id AS dup_of, top.jac AS jaccard "
    "FROM delta d LEFT JOIN top ON top.delta_id = d.doc_id",
)
def llm_refresh_pipeline(spark, sf_dir):
    """The composed INCREMENTAL corpus-refresh loop — the production
    sequence every crawl refresh runs, stitched from this round's
    pieces: (1) `corpus_diff` labels the new snapshot against the old
    one (hashes only across the shuffle); (2) only added/changed docs
    form the delta; (3) the delta probes the persisted LSH index of
    the unchanged base (`build_lsh_index` + `incremental_neardup
    (base_index=...)` — the base is never re-signed); (4) each delta
    doc gets a keep / drop_dup decision with its best base match.
    Unchanged docs cost one hash compare; total work is O(new
    snapshot scan + delta) — never O(corpus pairs)."""
    docs = _docs(spark, sf_dir)
    v1 = docs.filter(F.col("doc_id") % 11 != 0)
    v2 = docs.filter(F.col("doc_id") % 13 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.lit("edit "), F.col("text"))
        ).otherwise(F.col("text")),
    )
    diff = corpus.corpus_diff(v1, v2).filter(F.col("status") != "removed")
    base = v2.join(
        diff.filter(F.col("status") == "unchanged").select("doc_id"), "doc_id"
    )
    delta = v2.join(
        diff.filter(F.col("status") != "unchanged").select("doc_id", "status"),
        "doc_id",
    )
    index = dedup.build_lsh_index(base).localCheckpoint()
    matches = dedup.incremental_neardup(
        base, delta, max_matches_per_delta=1, base_index=index
    ).select(
        F.col("delta_id").alias("doc_id"), "base_id", "jaccard"
    )
    return delta.select("doc_id", "status").join(matches, "doc_id", "left").select(
        "doc_id",
        "status",
        F.when(F.col("base_id").isNull(), F.lit("keep"))
        .otherwise(F.lit("drop_dup"))
        .alias("action"),
        F.col("base_id").alias("dup_of"),
        "jaccard",
    )


@register(
    "llm_truncate_long_docs",
    r"WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') "
    "AS toks FROM documents) "
    "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
    "len(toks) > 64 AS was_truncated, "
    "CASE WHEN len(toks) > 64 THEN array_to_string(toks[1:64], ' ') "
    "ELSE array_to_string(toks, ' ') END AS text, "
    "CAST(LEAST(len(toks), 64) AS BIGINT) AS kept_tokens FROM t",
)
def llm_truncate_long_docs(spark, sf_dir):
    """Length-cap guard (corpus.truncate_docs, cap 64 for the fixture
    scale): a multi-GB document is one UNSPLITTABLE row whose token
    array lands in a single task no matter the partitioning, so real
    pipelines cap documents before the tokenization-heavy stages;
    the was_truncated flag keeps the cut tail auditable."""
    return corpus.truncate_docs(_docs(spark, sf_dir), max_tokens=64)


_PR_EDGES = (
    "e0 AS (SELECT o_custkey, l_suppkey, CAST(COUNT(*) AS BIGINT) AS w "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2), "
    "edges AS (SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src, "
    "'s' || CAST(l_suppkey AS VARCHAR) AS dst, w FROM e0 "
    "UNION ALL SELECT 's' || CAST(l_suppkey AS VARCHAR), "
    "'c' || CAST(o_custkey AS VARCHAR), w FROM e0), "
    "outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM edges GROUP BY 1), "
    "nodes AS (SELECT DISTINCT src AS node FROM edges "
    "UNION SELECT DISTINCT dst FROM edges), "
    "r0 AS (SELECT node, CAST(100000000 AS BIGINT) AS r FROM nodes)"
)


def _pr_iter(i: int) -> str:
    p = i - 1
    return (
        f"c{i} AS (SELECT e.dst, CAST(SUM(CAST(floor((r.r * e.w) / o.outw + 0.5) "
        f"AS BIGINT)) AS BIGINT) AS in_sum "
        f"FROM edges e JOIN outw o ON e.src = o.src "
        f"JOIN r{p} r ON r.node = e.src GROUP BY 1), "
        f"r{i} AS (SELECT n.node, CAST(15000000 + CAST(floor(0.85 * "
        f"COALESCE(c{i}.in_sum, 0) + 0.5) AS BIGINT) AS BIGINT) AS r "
        f"FROM nodes n LEFT JOIN c{i} ON c{i}.dst = n.node)"
    )


@register(
    "gr_pagerank",
    "WITH " + _PR_EDGES + ", " + _pr_iter(1) + ", " + _pr_iter(2)
    + " SELECT node, CAST(r AS DOUBLE) / 100000000.0 AS rank FROM r2",
)
def gr_pagerank(spark, sf_dir):
    """Fixed-iteration weighted PageRank on the customer<->supplier
    trade graph (operators/graph.py) — each power iteration is one
    map-side-combinable shuffle on the destination node; per-edge
    contributions DECIMAL-rounded before the fold so the result is
    engine- and partitioning-exact.  Oracle unrolls the same two
    iterations as chained CTEs."""
    from mysql_cdc_spark.operators import graph
    from mysql_cdc_spark.sources.io import read_table

    edges = graph.trade_edges(
        read_table(spark, sf_dir, "lineitem"), read_table(spark, sf_dir, "orders")
    )
    return graph.pagerank(edges)


@register(
    "er_record_linkage",
    "WITH base AS (SELECT c_custkey AS rid, "
    "substring(md5('n' || CAST(c_custkey AS VARCHAR)), 1, 6) || ' ' || "
    "substring(md5('m' || CAST(c_custkey AS VARCHAR)), 1, 8) AS name, "
    "c_nationkey AS nat FROM customer), "
    "dirty AS (SELECT rid + 10000000 AS rid, "
    "substring(name, 1, CAST(rid % 8 + 2 AS INTEGER)) || "
    "substring(name, CAST(rid % 8 + 4 AS INTEGER), 100) AS name, nat "
    "FROM base WHERE rid % 10 = 0), "
    "rec AS (SELECT * FROM base UNION ALL SELECT * FROM dirty), "
    "blocked AS ("
    "  SELECT rid, name, CAST(nat AS VARCHAR) || '|' || substring(name, 1, 3) AS bkey FROM rec "
    "  UNION ALL "
    "  SELECT rid, name, CAST(nat AS VARCHAR) || '|' || right(name, 3) AS bkey FROM rec), "
    "cand AS (SELECT DISTINCT a.rid AS rid_a, b.rid AS rid_b, "
    "a.name AS name_a, b.name AS name_b "
    "FROM blocked a JOIN blocked b ON a.bkey = b.bkey AND a.rid < b.rid) "
    "SELECT rid_a, rid_b, name_a, name_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev "
    "FROM cand WHERE levenshtein(name_a, name_b) <= 2",
)
def er_record_linkage(spark, sf_dir):
    """Entity resolution over structured records: md5-derived person
    names with planted one-char-corrupted twins; two blocking passes
    (name prefix / suffix per nation) generate candidates as bucketed
    equi-joins, Levenshtein <= 2 verifies — never all-pairs
    (operators/linkage.py)."""
    from mysql_cdc_spark.operators import linkage
    from mysql_cdc_spark.sources.io import read_table

    return linkage.record_matches(
        linkage.synth_records(read_table(spark, sf_dir, "customer"))
    )


@register(
    "llm_sample_hash",
    f"SELECT doc_id, lang, source, "
    f"(instr('0123456789abcdef', substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 "
    f"+ instr('0123456789abcdef', substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bucket "
    f"FROM documents WHERE "
    f"(instr('0123456789abcdef', substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 "
    f"+ instr('0123456789abcdef', substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1 < {corpus.SAMPLE_CUT}",
)
def llm_sample_hash(spark, sf_dir):
    """Deterministic ~5% eval-set sample: salted-md5 bucket < cut.
    Reproducible under reruns and incremental corpus growth (membership
    is per-doc, content-independent)."""
    return corpus.hash_sample(_docs(spark, sf_dir))


@register(
    "llm_mixture_sample",
    "SELECT doc_id, source, CAST(b AS BIGINT) AS bucket, CAST(cut AS BIGINT) AS cut "
    "FROM (SELECT doc_id, source, "
    "(instr('0123456789abcdef', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 "
    "+ instr('0123456789abcdef', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS b, "
    + corpus._mixture_case() + " AS cut FROM documents) WHERE b < cut",
)
def llm_mixture_sample(spark, sf_dir):
    """Deterministic weighted domain mixing (per-source keep rates as
    integer cuts of the 256-bucket hash space)."""
    return corpus.mixture_sample(_docs(spark, sf_dir))


@register(
    "llm_repetition",
    r"WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') "
    "AS tokens FROM documents), "
    "g AS (SELECT doc_id, CASE WHEN len(tokens) >= 3 THEN "
    "[tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] for i in range(1, len(tokens)-1)] "
    "ELSE [] END AS grams FROM toks) "
    "SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams, "
    "CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct, "
    "CASE WHEN len(grams) > 0 THEN "
    "CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE) "
    "ELSE 0.0 END AS dup_frac FROM g",
)
def llm_repetition(spark, sf_dir):
    """Gopher-style intra-document repeated-3-gram fraction (array
    expressions, shuffle-free)."""
    return T.repetition_stats(_docs(spark, sf_dir))


@register(
    "llm_cross_dup",
    _SHINGLE_CTE + ", "
    "sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh), "
    "inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh), "
    "dfc AS (SELECT shingle, COUNT(*) AS df FROM inv GROUP BY shingle), "
    "dup AS (SELECT i.doc_id, COUNT(*) AS n_dup FROM inv i "
    "JOIN dfc ON i.shingle = dfc.shingle AND dfc.df > 1 GROUP BY i.doc_id) "
    "SELECT s.doc_id, CAST(s.n_sh AS BIGINT) AS n_shingles, "
    "CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_shared, "
    "CASE WHEN s.n_sh > 0 THEN CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / CAST(s.n_sh AS DOUBLE) "
    "ELSE 0.0 END AS shared_frac "
    "FROM sizes s LEFT JOIN dup d ON s.doc_id = d.doc_id",
)
def llm_cross_dup(spark, sf_dir):
    """Per-document cross-corpus duplicated-shingle fraction via the
    inverted index (no pair materialization)."""
    return corpus.cross_dup_fraction(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Round-3 batch: model-based quality scoring, corpus rarity, quota sampling
# ---------------------------------------------------------------------------

_W_SQL = T.classifier_weight_sql("t")
_LOGIT_SQL = f"CAST(coalesce(list_sum(list_transform(tokens, t -> {_W_SQL})), 0) AS BIGINT)"


@register(
    "llm_quality_model",
    _TOKS_CTE + f" SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens, "
    f"{_LOGIT_SQL} AS logit, {_LOGIT_SQL} >= 0 AS keep FROM toks",
)
def llm_quality_model(spark, sf_dir):
    """Hashed-feature linear quality classifier: BIGINT logit from two
    md5s per token, pure array expressions (engine-neutral SQL shared
    with the oracle)."""
    return T.quality_classifier(_docs(spark, sf_dir))


@register(
    "llm_unigram_rarity",
    _TOKS_CTE + ", inv AS (SELECT doc_id, unnest(tokens) AS token FROM toks), "
    "v AS (SELECT token, COUNT(*) AS tf FROM inv GROUP BY token) "
    "SELECT inv.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
    "CAST(SUM(v.tf) AS BIGINT) AS sum_tf, "
    "CAST(SUM(v.tf) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_tf "
    "FROM inv JOIN v ON inv.token = v.token GROUP BY inv.doc_id",
)
def llm_unigram_rarity(spark, sf_dir):
    """Mean corpus term-frequency per document (CCNet-perplexity-proxy
    rarity signal; vocab count + token equi-join, integer-exact)."""
    return corpus.unigram_rarity(_docs(spark, sf_dir))


@register(
    "llm_stratified_sample",
    "SELECT doc_id, lang, source, rk FROM ("
    "  SELECT doc_id, lang, source, CAST(ROW_NUMBER() OVER ("
    "    PARTITION BY lang, source "
    "    ORDER BY md5('strat:' || CAST(doc_id AS STRING)), doc_id) AS BIGINT) AS rk"
    "  FROM documents"
    ") WHERE rk <= 5",
)
def llm_stratified_sample(spark, sf_dir):
    """Deterministic per-(lang, source) quota sample: salted-hash
    order, WindowGroupLimit top-k per stratum."""
    df = corpus.stratified_sample(_docs(spark, sf_dir), cap=5)
    return df.withColumn("rk", F.col("rk").cast("bigint"))


_SPAN_CTE = (
    r"WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tokens "
    "FROM documents), "
    "g AS (SELECT doc_id, CASE WHEN len(tokens) >= 8 THEN "
    "[md5(array_to_string(tokens[i : i+7], ' ')) for i in range(1, len(tokens) - 6)] "
    "ELSE [] END AS grams FROM toks), "
    "sh AS (SELECT doc_id, CASE WHEN len(grams) >= 9 THEN "
    "list_distinct([list_min(grams[j : j+8]) for j in range(1, len(grams) - 7)]) "
    "ELSE [] END AS wins FROM g), "
    "sizes AS (SELECT doc_id, len(wins) AS n_win FROM sh), "
    "inv AS (SELECT doc_id, unnest(wins) AS whash FROM sh), "
    "dfc AS (SELECT whash, COUNT(*) AS df FROM inv GROUP BY whash), "
    "dup AS (SELECT i.doc_id, COUNT(*) AS n_shared FROM inv i "
    "JOIN dfc ON i.whash = dfc.whash AND dfc.df > 1 GROUP BY i.doc_id)"
)


@register(
    "llm_dup_spans",
    _SPAN_CTE + " SELECT s.doc_id, CAST(s.n_win AS BIGINT) AS n_windows, "
    "CAST(COALESCE(d.n_shared, 0) AS BIGINT) AS n_shared, "
    "CASE WHEN s.n_win > 0 THEN CAST(COALESCE(d.n_shared, 0) AS DOUBLE) / CAST(s.n_win AS DOUBLE) "
    "ELSE 0.0 END AS span_frac "
    "FROM sizes s LEFT JOIN dup d ON s.doc_id = d.doc_id",
)
def llm_dup_spans(spark, sf_dir):
    """Cross-document duplicated-passage share via winnowing
    fingerprints (8-token grams, k=9 min-selection — alignment-free
    substring-dedup approximation; inverted index, no pair
    explosion)."""
    return dedup.dup_spans(_docs(spark, sf_dir))


@register(
    "llm_dup_span_ranges",
    r"WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tokens "
    "FROM documents), "
    "g AS (SELECT doc_id, CASE WHEN len(tokens) >= 8 THEN "
    "[md5(array_to_string(tokens[i : i+7], ' ')) for i in range(1, len(tokens) - 6)] "
    "ELSE [] END AS grams FROM toks), "
    "pos AS (SELECT doc_id, generate_subscripts(grams, 1) AS off, unnest(grams) AS ghash FROM g), "
    "dfc AS (SELECT ghash, COUNT(*) AS df FROM pos GROUP BY 1), "
    "hits AS (SELECT p.doc_id, p.off FROM pos p JOIN dfc USING (ghash) WHERE dfc.df > 1), "
    "lagged AS (SELECT doc_id, off, LAG(off) OVER (PARTITION BY doc_id ORDER BY off) AS prev_off FROM hits), "
    "isl AS (SELECT doc_id, off, SUM(CASE WHEN prev_off IS NULL OR off - prev_off > 8 "
    "THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY off) AS island FROM lagged) "
    "SELECT doc_id, CAST(MIN(off) AS BIGINT) AS span_start, "
    "CAST(MAX(off) + 7 AS BIGINT) AS span_end, "
    "CAST(MAX(off) + 8 - MIN(off) AS BIGINT) AS n_tokens "
    "FROM isl GROUP BY doc_id, island",
)
def llm_dup_span_ranges(spark, sf_dir):
    """Exact duplicated-span extraction: maximal [start, end] token
    ranges whose 8-gram windows all repeat somewhere in the corpus —
    the ranges Lee et al.-style substring dedup cuts from a training
    set (dedup.dup_span_ranges: position stream → gram-count join →
    per-doc gaps-and-islands merge; no doc pairs anywhere)."""
    return dedup.dup_span_ranges(_docs(spark, sf_dir))


@register(
    "llm_span_censor",
    r"WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tokens "
    "FROM documents), "
    "g AS (SELECT doc_id, CASE WHEN len(tokens) >= 8 THEN "
    "[md5(array_to_string(tokens[i : i+7], ' ')) for i in range(1, len(tokens) - 6)] "
    "ELSE [] END AS grams FROM toks), "
    "pos AS (SELECT doc_id, generate_subscripts(grams, 1) AS off, unnest(grams) AS ghash FROM g), "
    "dfc AS (SELECT ghash, COUNT(*) AS df FROM pos GROUP BY 1), "
    "hits AS (SELECT p.doc_id, p.off FROM pos p JOIN dfc USING (ghash) WHERE dfc.df > 1), "
    "lagged AS (SELECT doc_id, off, LAG(off) OVER (PARTITION BY doc_id ORDER BY off) AS prev_off FROM hits), "
    "isl AS (SELECT doc_id, off, SUM(CASE WHEN prev_off IS NULL OR off - prev_off > 8 "
    "THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY off) AS island FROM lagged), "
    "spans AS (SELECT doc_id, MIN(off) AS s, MAX(off) + 7 AS e FROM isl GROUP BY doc_id, island), "
    "cover AS (SELECT DISTINCT doc_id, unnest(generate_series(s, e)) AS i FROM spans), "
    "tpos AS (SELECT doc_id, generate_subscripts(tokens, 1) AS i, unnest(tokens) AS tok FROM toks), "
    "kept AS (SELECT t.doc_id, t.i, t.tok FROM tpos t ANTI JOIN cover c "
    "ON t.doc_id = c.doc_id AND t.i = c.i) "
    "SELECT t.doc_id, "
    "COALESCE(k.clean_text, '') AS clean_text, "
    "CAST(len(t.tokens) AS BIGINT) AS n_tokens, "
    "CAST(len(t.tokens) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed "
    "FROM toks t LEFT JOIN ("
    "  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text, COUNT(*) AS n_kept "
    "  FROM kept GROUP BY doc_id) k ON t.doc_id = k.doc_id",
)
def llm_span_censor(spark, sf_dir):
    """The write-side of substring dedup: every document re-emitted
    with its duplicated spans cut out (dedup.censor_dup_spans — span
    arrays broadcast back, token filtering as a pure array expression;
    the oracle rebuilds the same cleaned text relationally via a
    position anti-join)."""
    return dedup.censor_dup_spans(_docs(spark, sf_dir))


@register(
    "llm_bigram_lm",
    _TOKS_CTE + ", bg AS (SELECT unnest(CASE WHEN len(tokens) >= 2 THEN "
    "[tokens[i] || ' ' || tokens[i+1] for i in range(1, len(tokens))] "
    "ELSE [] END) AS g FROM toks), "
    "c AS (SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2, "
    "COUNT(*) AS c FROM bg GROUP BY 1, 2) "
    "SELECT w1, w2, CAST(c AS BIGINT) AS c, CAST(c1 AS BIGINT) AS c1, "
    "CAST(c AS DOUBLE) / CAST(c1 AS DOUBLE) AS cond_p FROM ("
    "  SELECT w1, w2, c, SUM(c) OVER (PARTITION BY w1) AS c1 FROM c"
    ") WHERE c >= 5",
)
def llm_bigram_lm(spark, sf_dir):
    """Corpus bigram LM: P(w2|w1) from one pass over the token stream
    (continuation-sum denominator, integer-exact)."""
    return T.bigram_lm(_docs(spark, sf_dir))


@register(
    "llm_stream_neardup",
    _BAND_CTE + ", cand AS (SELECT DISTINCT a.doc_id AS delta_id, b.doc_id AS base_id "
    "FROM bandrows a JOIN bandrows b ON a.band = b.band AND a.band_hash = b.band_hash "
    "AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0) "
    "SELECT delta_id, base_id, common, n_delta, n_base, jaccard FROM ("
    "  SELECT c.delta_id, c.base_id, "
    "  CAST(len(list_intersect(sd.shingles, sb.shingles)) AS BIGINT) AS common, "
    "  CAST(len(sd.shingles) AS BIGINT) AS n_delta, CAST(len(sb.shingles) AS BIGINT) AS n_base, "
    "  CAST(len(list_intersect(sd.shingles, sb.shingles)) AS DOUBLE) / "
    "  CAST(len(sd.shingles) + len(sb.shingles) - len(list_intersect(sd.shingles, sb.shingles)) AS DOUBLE) AS jaccard "
    "  FROM cand c JOIN sh sd ON sd.doc_id = c.delta_id JOIN sh sb ON sb.doc_id = c.base_id"
    f") WHERE jaccard >= {dedup.JACCARD_THRESHOLD}",
)
def llm_stream_neardup(spark, sf_dir):
    """STREAMING ingest dedup: the delta batch arrives as a FILE STREAM
    (4 parquet files, maxFilesPerTrigger=1 → 4 micro-batches), each
    micro-batch's band rows probe the STATIC base LSH index via a
    stream-static join (no stream-side state for the join itself;
    dropDuplicates carries the only state — (delta, base) pair keys,
    watermark-boundable in production since a delta doc's pairs all
    emit in its own micro-batch).  Hash-equal to the batch
    `llm_incremental_neardup` oracle: micro-batching must not change
    the answer."""
    import pathlib

    docs = _docs(spark, sf_dir)
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta_dir = (
        pathlib.Path(_STREAM_TMP)
        / f"neardup_delta_{pathlib.Path(sf_dir).name}_v{_FIXTURE_VERSION}"
    )
    if not (delta_dir / "_SUCCESS").exists():
        docs.filter(F.col("doc_id") % 10 == 0).repartition(4).write.mode(
            "overwrite"
        ).parquet(str(delta_dir))
    delta_stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(delta_dir))
    )
    return _drain(dedup.incremental_neardup(base, delta_stream))


@register(
    "llm_perplexity_filter",
    _TOKS_CTE + ", "
    "ref_bg AS (SELECT unnest(CASE WHEN len(tokens) >= 2 THEN "
    "[tokens[i] || ' ' || tokens[i+1] for i in range(1, len(tokens))] "
    "ELSE [] END) AS g FROM toks WHERE lang = 'en'), "
    "counts AS (SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2, "
    "COUNT(*) AS c FROM ref_bg GROUP BY 1, 2), "
    "c1 AS (SELECT w1, SUM(c) AS c1 FROM counts GROUP BY 1), "
    "v AS (SELECT COUNT(DISTINCT tok) AS v FROM "
    "  (SELECT unnest(tokens) AS tok FROM toks WHERE lang = 'en')), "
    "dbg AS (SELECT doc_id, unnest(CASE WHEN len(tokens) >= 2 THEN "
    "[tokens[i] || ' ' || tokens[i+1] for i in range(1, len(tokens))] "
    "ELSE [] END) AS g FROM toks), "
    "scored AS (SELECT doc_id, CAST(round(ln("
    "  CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)"
    "), 6) AS DECIMAL(18,6)) AS logp "
    "FROM (SELECT doc_id, split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2 FROM dbg) b "
    "LEFT JOIN counts c ON b.w1 = c.w1 AND b.w2 = c.w2 "
    "LEFT JOIN c1 ON b.w1 = c1.w1 CROSS JOIN v), "
    "per AS (SELECT t.doc_id, CAST(COUNT(s.logp) AS BIGINT) AS n_bigrams, "
    "CAST(SUM(s.logp) AS DOUBLE) AS sum_logp "
    "FROM toks t LEFT JOIN scored s ON t.doc_id = s.doc_id GROUP BY 1) "
    "SELECT doc_id, n_bigrams, sum_logp, "
    "CASE WHEN n_bigrams > 0 THEN round(exp(-(CAST(sum_logp AS DOUBLE) / n_bigrams)), 4) END AS ppl, "
    "CASE WHEN n_bigrams = 0 THEN 'unscored' "
    "WHEN round(exp(-(CAST(sum_logp AS DOUBLE) / n_bigrams)), 4) <= 30.0 THEN 'head' "
    "WHEN round(exp(-(CAST(sum_logp AS DOUBLE) / n_bigrams)), 4) > 300.0 THEN 'tail' "
    "ELSE 'middle' END AS bucket FROM per",
)
def llm_perplexity_filter(spark, sf_dir):
    """CCNet-style perplexity quality filter: add-one bigram LM trained
    on the English subcorpus, every document scored under it, bucketed
    head/middle/tail (functions/text.py lm_perplexity — integer-exact
    counts + DECIMAL-rounded log-prob fold for engine determinism)."""
    docs = _docs(spark, sf_dir)
    return T.lm_perplexity(docs, docs.filter(F.col("lang") == "en"))


_SRC_SHINGLE_CTE = (
    "WITH norm AS (SELECT doc_id, source, lower(trim(text)) AS norm_text FROM documents), "
    r"toks AS (SELECT doc_id, source, regexp_split_to_array(norm_text, '\s+') AS tokens FROM norm), "
    "sh AS (SELECT doc_id, source, list_distinct(CASE WHEN len(tokens) >= 3 THEN "
    "[tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] for i in range(1, len(tokens)-1)] "
    "ELSE [] END) AS shingles FROM toks), "
    "inv AS (SELECT DISTINCT source, shingle FROM "
    "  (SELECT source, unnest(shingles) AS shingle FROM sh)), "
    "sizes AS (SELECT source, COUNT(*) AS n FROM inv GROUP BY source)"
)


@register(
    "llm_source_overlap",
    _SRC_SHINGLE_CTE + ", inter AS ("
    "  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common"
    "  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.source < b.source"
    "  GROUP BY 1, 2) "
    "SELECT source_a, source_b, CAST(n_common AS BIGINT) AS n_common, "
    "CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard "
    "FROM inter "
    "JOIN sizes sa ON sa.source = source_a "
    "JOIN sizes sb ON sb.source = source_b",
)
def llm_source_overlap(spark, sf_dir):
    """Cross-source shingle-overlap matrix (pairwise Jaccard over
    source shingle sets) — ranks source pairs for cross-dedup."""
    return corpus.source_overlap(_docs(spark, sf_dir))


@register(
    "llm_zipf_slope",
    r"WITH toks AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok "
    "FROM documents), "
    "freq AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok), "
    "ranked AS (SELECT tok, freq, ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rank FROM freq) "
    "SELECT round(regr_slope(ln(freq), ln(rank)), 6) AS zipf_slope, "
    "CAST(COUNT(*) AS BIGINT) AS n_vocab, CAST(SUM(freq) AS BIGINT) AS total_tokens "
    "FROM ranked",
)
def llm_zipf_slope(spark, sf_dir):
    """Zipf-exponent fit of the corpus unigram distribution (OLS of
    ln freq on ln rank) — corpus-quality signal, regression over the
    vocabulary only."""
    return corpus.zipf_slope(_docs(spark, sf_dir))


_PQ_DSUB = similarity.DIMS // similarity.PQ_M
_PQ_DIST = (
    f"list_sum([(s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]) "
    f"for i in range(1, {_PQ_DSUB} + 1)])"
)


_PQ_BEST_CTE = (
    _EMB_CTE + f", subs AS ("
    f"  SELECT vec_id, CAST(t.s AS INTEGER) AS sub, "
    f"  qv[t.s * {_PQ_DSUB} + 1 : (t.s + 1) * {_PQ_DSUB}] AS sv "
    f"  FROM q CROSS JOIN range({similarity.PQ_M}) t(s)), "
    f"cb AS (SELECT vec_id AS code, sub AS csub, sv AS cv FROM subs "
    f"  WHERE vec_id < {similarity.PQ_KSUB}), "
    f"best AS (SELECT vec_id, sub, code, dist FROM ("
    f"  SELECT s.vec_id, s.sub, c.code, {_PQ_DIST} AS dist, "
    f"  ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub ORDER BY {_PQ_DIST}, c.code) AS rn "
    f"  FROM subs s JOIN cb c ON s.sub = c.csub) WHERE rn = 1)"
)


@register(
    "llm_pq_codes",
    _PQ_BEST_CTE
    + " SELECT vec_id, string_agg(CAST(code AS VARCHAR), '-' ORDER BY sub) AS codes, "
    "CAST(SUM(dist) AS BIGINT) AS recon_err "
    "FROM best GROUP BY vec_id",
)
def llm_pq_codes(spark, sf_dir):
    """Product-quantization codes (4 subspaces × 16-entry codebooks,
    exact integer argmin) + exact reconstruction error — the
    compressed-index encoding step for billion-vector ANN."""
    return similarity.pq_codes(_emb(spark, sf_dir))


_ADC_LUT_DIST = (
    f"list_sum([(qs.qsv[i] - ce.cv[i]) * (qs.qsv[i] - ce.cv[i]) "
    f"for i in range(1, {_PQ_DSUB} + 1)])"
)


@register(
    "llm_ann_adc",
    _PQ_BEST_CTE + f", qsub AS ("
    f"  SELECT vec_id AS query_id, CAST(t.s AS INTEGER) AS sub, "
    f"  qv[t.s * {_PQ_DSUB} + 1 : (t.s + 1) * {_PQ_DSUB}] AS qsv "
    f"  FROM q CROSS JOIN range({similarity.PQ_M}) t(s) "
    f"  WHERE vec_id < {similarity.DEFAULT_N_QUERIES}), "
    f"lut AS (SELECT qs.query_id, qs.sub, ce.code, {_ADC_LUT_DIST} AS d "
    f"  FROM qsub qs JOIN cb ce ON qs.sub = ce.csub), "
    f"scored AS (SELECT l.query_id, b.vec_id AS neighbor_id, "
    f"  CAST(SUM(l.d) AS BIGINT) AS adc_dist "
    f"  FROM best b JOIN lut l ON b.sub = l.sub AND b.code = l.code "
    f"  WHERE b.vec_id <> l.query_id GROUP BY 1, 2) "
    f"SELECT query_id, neighbor_id, adc_dist, CAST(rank AS BIGINT) AS rank FROM ("
    f"  SELECT query_id, neighbor_id, adc_dist, "
    f"  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank "
    f"  FROM scored) WHERE rank <= {similarity.DEFAULT_K}",
)
def llm_ann_adc(spark, sf_dir):
    """PQ asymmetric-distance top-k: queries keep full vectors, the
    corpus is searched through its 16-bit PQ codes via broadcast
    per-query lookup tables — all-integer, the compressed-index
    search path."""
    return similarity.ann_adc(_emb(spark, sf_dir))


# IVF centroid CTEs re-based onto the PQ CTE chain (both extend
# _EMB_CTE; names are disjoint) for the composed IVFADC oracle.
_IVF_SUFFIX = _IVF_CTE[len(_EMB_CTE):]


@register(
    "llm_ann_ivfpq",
    _PQ_BEST_CTE + _IVF_SUFFIX + ", assign AS (SELECT vec_id, cell FROM ("
    "  SELECT n.vec_id, c.label AS cell, ROW_NUMBER() OVER (PARTITION BY n.vec_id "
    f"  ORDER BY ({_IVF_CELL_COS}) DESC, c.label) AS cr FROM n, cn c) WHERE cr = 1), "
    "probe AS (SELECT vec_id, cell FROM ("
    "  SELECT n.vec_id, c.label AS cell, ROW_NUMBER() OVER (PARTITION BY n.vec_id "
    f"  ORDER BY ({_IVF_CELL_COS}) DESC, c.label) AS cr FROM n, cn c "
    f"  WHERE n.vec_id < {similarity.DEFAULT_N_QUERIES}) WHERE cr <= {similarity.IVF_PROBES}), "
    "cand AS (SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id "
    "FROM probe p JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id), "
    "qsub AS ("
    f"  SELECT vec_id AS query_id, CAST(t.s AS INTEGER) AS sub, "
    f"  qv[t.s * {_PQ_DSUB} + 1 : (t.s + 1) * {_PQ_DSUB}] AS qsv "
    f"  FROM q CROSS JOIN range({similarity.PQ_M}) t(s) "
    f"  WHERE vec_id < {similarity.DEFAULT_N_QUERIES}), "
    f"lut AS (SELECT qs.query_id, qs.sub, ce.code, {_ADC_LUT_DIST} AS d "
    "  FROM qsub qs JOIN cb ce ON qs.sub = ce.csub), "
    "scored AS (SELECT c.query_id, c.neighbor_id, CAST(SUM(l.d) AS BIGINT) AS adc_dist "
    "  FROM cand c JOIN best b ON b.vec_id = c.neighbor_id "
    "  JOIN lut l ON l.query_id = c.query_id AND b.sub = l.sub AND b.code = l.code "
    "  GROUP BY 1, 2) "
    "SELECT query_id, neighbor_id, adc_dist, CAST(rank AS BIGINT) AS rank FROM ("
    "  SELECT query_id, neighbor_id, adc_dist, "
    "  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank "
    f"  FROM scored) WHERE rank <= {similarity.DEFAULT_K}",
)
def llm_ann_ivfpq(spark, sf_dir):
    """Full compressed-index ANN (FAISS IVFADC): coarse cells prune the
    corpus to 2 probed cells per query, PQ asymmetric distance ranks
    only the survivors through their codes — the composition of
    llm_ann_ivf's topology and llm_ann_adc's LUT scoring."""
    return similarity.ann_ivfpq(_emb(spark, sf_dir))


# Residual IVFADC oracle building blocks (r14): exact-integer residual
# r = qv − cqv(assigned cell); PQ codebook/codes/LUTs over residual
# subvectors, LUT keyed by (query, probed cell) because the query
# residual depends on the cell — the IDENTICAL construction
# similarity.ann_ivfpq_residual runs.
_RES_LIST = "[{a}.qv[i] - c.cqv[i] for i in range(1, len({a}.qv)+1)]"
_RDIST = (
    f"list_sum([(s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]) "
    f"for i in range(1, {_PQ_DSUB} + 1)])"
)
_RLUT_DIST = (
    f"list_sum([(qs.qsv[i] - ce.cv[i]) * (qs.qsv[i] - ce.cv[i]) "
    f"for i in range(1, {_PQ_DSUB} + 1)])"
)


@register(
    "llm_ann_ivfpq_residual",
    _EMB_CTE + _IVF_SUFFIX + ", assign AS (SELECT vec_id, cell FROM ("
    "  SELECT n.vec_id, c.label AS cell, ROW_NUMBER() OVER (PARTITION BY n.vec_id "
    f"  ORDER BY ({_IVF_CELL_COS}) DESC, c.label) AS cr FROM n, cn c) WHERE cr = 1), "
    "rres AS MATERIALIZED (SELECT a.vec_id, a.cell, " + _RES_LIST.format(a="n") + " AS rv "
    "  FROM assign a JOIN n ON n.vec_id = a.vec_id JOIN cn c ON c.label = a.cell), "
    f"rsub AS MATERIALIZED (SELECT vec_id, cell, CAST(t.s AS INTEGER) AS sub, "
    f"  rv[t.s * {_PQ_DSUB} + 1 : (t.s + 1) * {_PQ_DSUB}] AS sv "
    f"  FROM rres CROSS JOIN range({similarity.PQ_M}) t(s)), "
    f"rcb AS MATERIALIZED (SELECT vec_id AS code, sub AS csub, sv AS cv FROM rsub "
    f"  WHERE vec_id < {similarity.PQ_KSUB}), "
    f"rbest AS MATERIALIZED (SELECT vec_id, cell, sub, code FROM ("
    f"  SELECT s.vec_id, s.cell, s.sub, c.code, "
    f"  ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub ORDER BY {_RDIST}, c.code) AS rn "
    f"  FROM rsub s JOIN rcb c ON s.sub = c.csub) WHERE rn = 1), "
    "probe AS (SELECT vec_id, cell FROM ("
    "  SELECT n.vec_id, c.label AS cell, ROW_NUMBER() OVER (PARTITION BY n.vec_id "
    f"  ORDER BY ({_IVF_CELL_COS}) DESC, c.label) AS cr FROM n, cn c "
    f"  WHERE n.vec_id < {similarity.DEFAULT_N_QUERIES}) WHERE cr <= {similarity.IVF_PROBES}), "
    "qres AS (SELECT p.vec_id AS query_id, p.cell, " + _RES_LIST.format(a="n") + " AS qrv "
    "  FROM probe p JOIN n ON n.vec_id = p.vec_id JOIN cn c ON c.label = p.cell), "
    f"qrsub AS (SELECT query_id, cell, CAST(t.s AS INTEGER) AS sub, "
    f"  qrv[t.s * {_PQ_DSUB} + 1 : (t.s + 1) * {_PQ_DSUB}] AS qsv "
    f"  FROM qres CROSS JOIN range({similarity.PQ_M}) t(s)), "
    f"rlut AS (SELECT qs.query_id, qs.cell, qs.sub, ce.code, {_RLUT_DIST} AS d "
    "  FROM qrsub qs JOIN rcb ce ON qs.sub = ce.csub), "
    "scored AS (SELECT l.query_id, b.vec_id AS neighbor_id, "
    "  CAST(SUM(l.d) AS BIGINT) AS adc_dist "
    "  FROM rbest b JOIN rlut l ON l.cell = b.cell AND b.sub = l.sub AND b.code = l.code "
    "  WHERE b.vec_id <> l.query_id GROUP BY 1, 2), "
    # IVFADC+R (r18): exact-L2 re-rank of the top rerank*k ADC rows —
    # the identical refinement the Spark operator runs (collision ties
    # in the 65k-tuple code space made one organic query's recall 0.0)
    "short AS (SELECT query_id, neighbor_id, adc_dist FROM ("
    "  SELECT query_id, neighbor_id, adc_dist, "
    "  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS srank "
    f"  FROM scored) WHERE srank <= {similarity.PQ_RERANK * similarity.DEFAULT_K}), "
    "rer AS (SELECT s.query_id, s.neighbor_id, s.adc_dist, "
    "  list_sum([(nq.qv[i] - nn.qv[i]) * (nq.qv[i] - nn.qv[i]) "
    f"  for i in range(1, {similarity.DIMS} + 1)]) AS xdist "
    "  FROM short s JOIN n nq ON nq.vec_id = s.query_id "
    "  JOIN n nn ON nn.vec_id = s.neighbor_id) "
    "SELECT query_id, neighbor_id, adc_dist, CAST(rank AS BIGINT) AS rank FROM ("
    "  SELECT query_id, neighbor_id, adc_dist, "
    "  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY xdist, neighbor_id) AS rank "
    f"  FROM rer) WHERE rank <= {similarity.DEFAULT_K}",
)
def llm_ann_ivfpq_residual(spark, sf_dir):
    """TRUE FAISS IVFADC (r14): PQ over exact-integer RESIDUALS
    (x − cell centroid) with one shared residual codebook, per-(query,
    probed cell) LUTs — on clustered corpora the raw-vector PQ wastes
    its codewords re-describing the cluster centers the coarse
    quantizer already encodes (measured: adversarial-fixture recall@5
    0.572 raw → 0.696 residual, tools/ann_recall.py)."""
    return similarity.ann_ivfpq_residual(_emb(spark, sf_dir))


# Rotated-residual IVFADC oracle (r14 VERDICT #5).  The LEARNED OPQ
# rotation (covariance eigh + balanced allocation,
# similarity.ann_ivfpq_opq) is not SQL-expressible, so the gate
# verifies the identical machinery under the deterministic
# data-independent orthonormal rotation (Jégou et al.'s random-
# rotation baseline, similarity.fixed_rotation_int): the rotation
# matrix is embedded verbatim in BOTH the Spark plan and this SQL, and
# the hash covers rotation application, floor quantization, codebook,
# LUT and ADC bit-for-bit.  The learned-rotation quality is pinned by
# the recall floors in tests/test_ann_recall.py (OPQ beats
# ann_ivfpq_residual on all three fixtures there).
_ROT_LIT = "[" + ", ".join(
    "[" + ",".join(str(v) for v in row) + "]"
    for row in similarity.fixed_rotation_int()
) + "]"
_ROT_APPLY = (
    f"list_transform({_ROT_LIT}, row -> CAST(FLOOR(CAST("
    "list_sum([row[i] * {vec}[i] for i in range(1, len({vec}) + 1)]) "
    f"AS DOUBLE) / {similarity.OPQ_SCALE}.0) AS BIGINT))"
)


@register(
    "llm_ann_ivfpq_rr",
    _EMB_CTE + _IVF_SUFFIX + ", assign AS (SELECT vec_id, cell FROM ("
    "  SELECT n.vec_id, c.label AS cell, ROW_NUMBER() OVER (PARTITION BY n.vec_id "
    f"  ORDER BY ({_IVF_CELL_COS}) DESC, c.label) AS cr FROM n, cn c) WHERE cr = 1), "
    "rres0 AS MATERIALIZED (SELECT a.vec_id, a.cell, " + _RES_LIST.format(a="n") + " AS rv0 "
    "  FROM assign a JOIN n ON n.vec_id = a.vec_id JOIN cn c ON c.label = a.cell), "
    "rres AS MATERIALIZED (SELECT vec_id, cell, "
    + _ROT_APPLY.format(vec="rv0") + " AS rv FROM rres0), "
    f"rsub AS MATERIALIZED (SELECT vec_id, cell, CAST(t.s AS INTEGER) AS sub, "
    f"  rv[t.s * {_PQ_DSUB} + 1 : (t.s + 1) * {_PQ_DSUB}] AS sv "
    f"  FROM rres CROSS JOIN range({similarity.PQ_M}) t(s)), "
    f"rcb AS MATERIALIZED (SELECT vec_id AS code, sub AS csub, sv AS cv FROM rsub "
    f"  WHERE vec_id < {similarity.PQ_KSUB}), "
    f"rbest AS MATERIALIZED (SELECT vec_id, cell, sub, code FROM ("
    f"  SELECT s.vec_id, s.cell, s.sub, c.code, "
    f"  ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub ORDER BY {_RDIST}, c.code) AS rn "
    f"  FROM rsub s JOIN rcb c ON s.sub = c.csub) WHERE rn = 1), "
    "probe AS (SELECT vec_id, cell FROM ("
    "  SELECT n.vec_id, c.label AS cell, ROW_NUMBER() OVER (PARTITION BY n.vec_id "
    f"  ORDER BY ({_IVF_CELL_COS}) DESC, c.label) AS cr FROM n, cn c "
    f"  WHERE n.vec_id < {similarity.DEFAULT_N_QUERIES}) WHERE cr <= {similarity.IVF_PROBES}), "
    "qres0 AS (SELECT p.vec_id AS query_id, p.cell, " + _RES_LIST.format(a="n") + " AS qrv0 "
    "  FROM probe p JOIN n ON n.vec_id = p.vec_id JOIN cn c ON c.label = p.cell), "
    "qres AS (SELECT query_id, cell, "
    + _ROT_APPLY.format(vec="qrv0") + " AS qrv FROM qres0), "
    f"qrsub AS (SELECT query_id, cell, CAST(t.s AS INTEGER) AS sub, "
    f"  qrv[t.s * {_PQ_DSUB} + 1 : (t.s + 1) * {_PQ_DSUB}] AS qsv "
    f"  FROM qres CROSS JOIN range({similarity.PQ_M}) t(s)), "
    f"rlut AS (SELECT qs.query_id, qs.cell, qs.sub, ce.code, {_RLUT_DIST} AS d "
    "  FROM qrsub qs JOIN rcb ce ON qs.sub = ce.csub), "
    "scored AS (SELECT l.query_id, b.vec_id AS neighbor_id, "
    "  CAST(SUM(l.d) AS BIGINT) AS adc_dist "
    "  FROM rbest b JOIN rlut l ON l.cell = b.cell AND b.sub = l.sub AND b.code = l.code "
    "  WHERE b.vec_id <> l.query_id GROUP BY 1, 2) "
    "SELECT query_id, neighbor_id, adc_dist, CAST(rank AS BIGINT) AS rank FROM ("
    "  SELECT query_id, neighbor_id, adc_dist, "
    "  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank "
    f"  FROM scored) WHERE rank <= {similarity.DEFAULT_K}",
)
def llm_ann_ivfpq_rr(spark, sf_dir):
    """Rotated-residual IVFADC under the FIXED orthonormal rotation
    (random-rotation PQ baseline) — the hash-verifiable twin of the
    learned-OPQ path: same pipeline (`similarity.ann_ivfpq_opq`), the
    rotation passed explicitly so DuckDB replicates it literal-for-
    literal.  The learned covariance-eigenbasis rotation (balanced-
    allocated per Ge et al. 2013 — pure PCA ordering measured 0.36 vs
    0.516 un-rotated) is exercised by the recall floors, where it wins
    on all three fixtures (correlated 0.516→0.768, copies 0.724→0.784,
    adversarial 0.696→0.732)."""
    return similarity.ann_ivfpq_opq(
        _emb(spark, sf_dir), rotation_int=similarity.fixed_rotation_int()
    )


# ---------------------------------------------------------------------------
# Round 6 — πps weighted sampling, shard planning, profiling, anomaly,
# incremental-view maintenance, schema evolution, BPE
# ---------------------------------------------------------------------------

_PPS_SALTED = "'pps:' || CAST(doc_id AS VARCHAR)"
_PPS_BUCKET = " + ".join(
    f"(instr('0123456789abcdef', substring(md5({_PPS_SALTED}), {i + 1}, 1)) - 1) * {16 ** (5 - i)}"
    for i in range(6)
)


@register(
    "llm_weighted_sample",
    "WITH scored AS ("
    "  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, "
    f"  CAST({_PPS_BUCKET} AS BIGINT) AS bucket, "
    f"  CAST(least({corpus.PPS_M}, {corpus.PPS_RATE_NUM} * greatest(CAST(n_chars AS BIGINT), 1)) AS BIGINT) AS cut "
    "  FROM documents) "
    f"SELECT doc_id, source, n_chars, bucket, cut, "
    f"CAST({corpus.PPS_M} AS DOUBLE) / CAST(cut AS DOUBLE) AS ht_weight "
    "FROM scored WHERE bucket < cut",
)
def llm_weighted_sample(spark, sf_dir):
    """Poisson πps (length-proportional) sample with exact integer
    keep/drop decisions and Horvitz–Thompson inverse-probability
    weights — unbiased downstream corpus statistics from the sample."""
    return corpus.weighted_sample(_docs(spark, sf_dir))


@register(
    "llm_shard_plan",
    "WITH placed AS ("
    "  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, "
    "  CAST(COALESCE(SUM(CAST(n_chars AS BIGINT)) OVER ("
    "    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS char_start "
    "  FROM documents) "
    f"SELECT char_start // {corpus.SHARD_TARGET_CHARS} AS shard_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS shard_chars, "
    "CAST(MIN(doc_id) AS BIGINT) AS first_doc, CAST(MAX(doc_id) AS BIGINT) AS last_doc "
    "FROM placed GROUP BY 1",
)
def llm_shard_plan(spark, sf_dir):
    """Output-shard planning: cut the doc_id-ordered corpus every
    SHARD_TARGET_CHARS characters via the distributed prefix scan and
    roll up one planning row per output file — the anti-small-files
    step of a 100 TB corpus write."""
    return corpus.shard_plan(_docs(spark, sf_dir))


@register("llm_bpe_vocab", bpe.vocab_oracle_sql())
def llm_bpe_vocab(spark, sf_dir):
    """BPE merge-rule training (Sennrich et al. 2016) over the corpus
    word-frequency table: R rounds of pair-count → argmax → rewrite,
    each running on the vocabulary only (|V| ≪ corpus); the oracle
    unrolls the same data-dependent rounds as chained CTEs."""
    return bpe.merges_df(spark, _docs(spark, sf_dir))


@register("llm_bpe_encode", bpe.encode_oracle_sql())
def llm_bpe_encode(spark, sf_dir):
    """Greedy application of the learned BPE merges to every document
    (chained regexp_replace literals, narrow plan): per-doc word,
    char-symbol, and BPE-symbol counts — the compression the learned
    vocabulary buys."""
    docs = _docs(spark, sf_dir)
    return bpe.encode_token_counts(docs, bpe.train_merges(docs))


@register(
    "llm_chunk_overlap",
    "WITH toks AS ("
    "  SELECT doc_id, "
    r"  CAST(len(str_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens "
    "  FROM documents"
    ") SELECT doc_id, "
    f"CAST(g.i // {corpus.CHUNK_STRIDE} AS BIGINT) AS chunk_id, "
    "CAST(g.i AS BIGINT) AS tok_start, "
    f"CAST(least(g.i + {corpus.CHUNK_SIZE}, n_tokens) AS BIGINT) AS tok_end, "
    f"CAST(least(g.i + {corpus.CHUNK_SIZE}, n_tokens) - g.i AS BIGINT) AS chunk_tokens "
    f"FROM toks CROSS JOIN LATERAL (SELECT unnest(range(0, n_tokens, {corpus.CHUNK_STRIDE})) AS i) g "
    "WHERE n_tokens > 0",
)
def llm_chunk_overlap(spark, sf_dir):
    """Sliding-window document chunking (64-token chunks, 16-token
    overlap): the retrieval/long-context prep step; narrow
    sequence-explode plan, all-integer chunk math."""
    return corpus.chunk_overlap(_docs(spark, sf_dir))


@register(
    "llm_dataset_card",
    "WITH per_source AS ("
    "  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "  CAST(SUM(n_chars) AS BIGINT) AS total_chars, "
    "  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs, "
    "  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups "
    "  FROM documents GROUP BY source), "
    "corpus AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS corpus_chars FROM documents) "
    "SELECT source, n_docs, total_chars, n_langs, n_exact_dups, "
    "CAST(total_chars AS DOUBLE) / CAST(corpus_chars AS DOUBLE) AS char_share "
    "FROM per_source CROSS JOIN corpus",
)
def llm_dataset_card(spark, sf_dir):
    """Dataset-card rollup: the per-source summary a corpus release
    documents — volume, language breadth, exact-dup count, share of
    the corpus.  One grouped aggregate + a broadcast 1-row total;
    the share is a single IEEE division of exact integers."""
    docs = _docs(spark, sf_dir)
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5("text"))).cast("bigint").alias("n_exact_dups"),
    )
    corpus = docs.agg(F.sum("n_chars").cast("bigint").alias("corpus_chars"))
    return per_source.crossJoin(F.broadcast(corpus)).select(
        "source",
        "n_docs",
        "total_chars",
        "n_langs",
        "n_exact_dups",
        (F.col("total_chars").cast("double") / F.col("corpus_chars").cast("double")).alias(
            "char_share"
        ),
    )


# Recall evaluation: the banded-LSH candidate pairs measured against
# the exact inverted-index Jaccard pairs as ground truth.  Reuses the
# registered oracles' own CTE fragments so all three computations stay
# definitionally in lockstep.
_MH_PAIRS_SQL = (
    ", cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bandrows a JOIN bandrows b ON a.band = b.band AND a.band_hash = b.band_hash "
    "AND a.doc_id < b.doc_id), "
    "mh_pairs AS (SELECT doc_a, doc_b FROM ("
    "  SELECT c.doc_a, c.doc_b, "
    "  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) / "
    "  CAST(len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) AS jaccard "
    "  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b"
    f") WHERE jaccard >= {dedup.JACCARD_THRESHOLD})"
)

_EX_PAIRS_SQL = (
    ", sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh), "
    "inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh), "
    f"dfok AS (SELECT shingle FROM inv0 GROUP BY shingle HAVING COUNT(*) <= {dedup.MAX_SHINGLE_DF}), "
    "inv AS (SELECT inv0.doc_id, inv0.shingle FROM inv0 JOIN dfok USING (shingle)), "
    "co AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS common "
    "FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2), "
    "ex_pairs AS (SELECT doc_a, doc_b FROM ("
    "  SELECT c.doc_a, c.doc_b, "
    "  CAST(c.common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - c.common AS DOUBLE) AS jaccard "
    "  FROM co c JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b"
    f") WHERE jaccard >= {dedup.JACCARD_THRESHOLD})"
)


@register(
    "llm_minhash_recall",
    _BAND_CTE + _MH_PAIRS_SQL + _EX_PAIRS_SQL
    + ", j AS (SELECT COUNT(*) AS n_common FROM mh_pairs JOIN ex_pairs USING (doc_a, doc_b)) "
    "SELECT CAST((SELECT COUNT(*) FROM ex_pairs) AS BIGINT) AS n_truth, "
    "CAST((SELECT COUNT(*) FROM mh_pairs) AS BIGINT) AS n_candidates, "
    "CAST(n_common AS BIGINT) AS n_common, "
    "CAST(n_common AS DOUBLE) / CAST((SELECT COUNT(*) FROM ex_pairs) AS DOUBLE) AS recall "
    "FROM j",
)
def llm_minhash_recall(spark, sf_dir):
    """Self-evaluation of the LSH index: banded-MinHash pair recall
    against the exact inverted-index Jaccard ground truth — the number
    that justifies (bands, rows-per-band) at scale, computed with the
    SAME verified operators it evaluates.  (The two pair sets differ
    only where banding misses or the ground truth's df-cap drops a
    pair — both visible in the counts.)"""
    docs = _docs(spark, sf_dir)
    mh = dedup.minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    ex = dedup.jaccard_pairs(docs).select("doc_a", "doc_b")
    # ONE full-outer join + ONE aggregate (r19): the old form ran the
    # mh pipeline twice and the ex pipeline twice (count + join each)
    # — both are full LSH/inverted-index pipelines, so every extra
    # reference re-executed their post-cache stages.  Tagged-union
    # counting computes all three counts in a single pass per side
    # (sweep wall 11.6 s → measured ~6 s; identical result row).
    tagged = mh.withColumn("_mh", F.lit(1)).join(
        ex.withColumn("_ex", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
    )
    return tagged.agg(
        F.sum("_ex").cast("bigint").alias("n_truth"),
        F.sum("_mh").cast("bigint").alias("n_candidates"),
        F.count(F.when(F.col("_mh").isNotNull() & F.col("_ex").isNotNull(), 1))
        .cast("bigint")
        .alias("n_common"),
    ).select(
        "n_truth",
        "n_candidates",
        "n_common",
        (F.col("n_common").cast("double") / F.col("n_truth").cast("double")).alias("recall"),
    )


@register(
    "llm_ann_recall",
    _BKT_CTE
    + ", exact_pairs AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, "
    + _SQL_COS.format(a="a", b="b") + " AS cosine "
    f"FROM n a, n b WHERE a.vec_id < {similarity.DEFAULT_N_QUERIES} AND b.vec_id != a.vec_id), "
    "exact_top AS (SELECT query_id, neighbor_id FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
    "  ORDER BY cosine DESC, neighbor_id) AS rank FROM exact_pairs"
    f") WHERE rank <= {similarity.DEFAULT_K}), "
    # multi-probe CAPPED candidates, identical to llm_ann_lsh's
    # (r16: the cap is the default) construction
    f"probes AS ({_probe_union_sql()}), "
    "hits AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id, "
    "COUNT(*) AS n_hits, "
    "MAX(ABS(qq.ord0 - c.ord0) + ABS(qq.ord1 - c.ord1)) AS ord_dist "
    "FROM probes qq JOIN bkt c ON qq.band = c.band AND qq.bucket = c.bucket "
    "AND c.vec_id != qq.vec_id GROUP BY 1, 2), "
    "cand AS (SELECT query_id, neighbor_id FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
    "  ORDER BY n_hits DESC, ord_dist, neighbor_id) AS cand_rank FROM hits"
    f") WHERE cand_rank <= {ANN_LSH_CAP}), "
    "ann_scored AS (SELECT cand.query_id, cand.neighbor_id, "
    + _SQL_COS.format(a="a", b="b") + " AS cosine "
    "FROM cand JOIN n a ON a.vec_id = cand.query_id JOIN n b ON b.vec_id = cand.neighbor_id), "
    "ann_top AS (SELECT query_id, neighbor_id FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
    "  ORDER BY cosine DESC, neighbor_id) AS rank FROM ann_scored"
    f") WHERE rank <= {similarity.DEFAULT_K}) "
    "SELECT CAST((SELECT COUNT(*) FROM exact_top) AS BIGINT) AS n_truth, "
    "CAST((SELECT COUNT(*) FROM ann_top) AS BIGINT) AS n_ann, "
    "CAST((SELECT COUNT(*) FROM ann_top JOIN exact_top USING (query_id, neighbor_id)) AS BIGINT) AS n_common, "
    "CAST((SELECT COUNT(*) FROM ann_top JOIN exact_top USING (query_id, neighbor_id)) AS DOUBLE) / "
    "CAST((SELECT COUNT(*) FROM exact_top) AS DOUBLE) AS recall_at_k",
)
def llm_ann_recall(spark, sf_dir):
    """Recall@k of the LSH-bucketed ANN against the exact brute-force
    KNN baseline, computed with the same verified operators — the
    bucket-configuration justification number (like llm_minhash_recall
    for the dedup index)."""
    emb = _emb(spark, sf_dir)
    exact = similarity.knn(emb).select("query_id", "neighbor_id")
    ann = similarity.ann_lsh(emb).select("query_id", "neighbor_id")
    common = ann.join(exact, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common")
    )
    return (
        common.crossJoin(
            F.broadcast(exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth")))
        )
        .crossJoin(F.broadcast(ann.agg(F.count(F.lit(1)).cast("bigint").alias("n_ann"))))
        .select(
            "n_truth",
            "n_ann",
            "n_common",
            (F.col("n_common").cast("double") / F.col("n_truth").cast("double")).alias(
                "recall_at_k"
            ),
        )
    )
