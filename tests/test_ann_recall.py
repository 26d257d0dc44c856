"""ANN recall@k floors vs exact KNN (r13 VERDICT #3), pinned the way
tests/test_chain_recall.py pins the dedup chain floors.

The oracle gate checks HASH PARITY on the ANN paths — DuckDB replicates
the same probe construction, so a recall cliff is invisible to it.
These tests measure recall@k against the exact brute-force `knn` on two
fixtures with known neighbor structure and pin the measured floors
(tools/ann_recall.py has the full sf0.1/x10 measurement; PLANS.md r14
the table):

- "copies": base vectors + small-noise copies — every query's true
  top-k are its own copies (the shape real embedding corpora have:
  near-dups + paraphrases).  Measured r14 (after the multi-probe fix
  this fixture forced — single-probe lsh was 0.784/0.2): lsh
  0.924/0.8, ivf 0.864/0.8, adc 0.68, ivfpq 0.776.  The residual lsh
  misses are copies ≥2 sign flips away in BOTH bands — the standard
  2-band sign-LSH trade, recoverable only with more bands/probes.
- the ADVERSARIAL clustered fixture (tools/chain_recall.emb_fixture):
  mutually near-orthogonal centers in one hot LSH bucket, members
  straddling a band hyperplane.  Measured: lsh/ivf 1.0, adc/ivfpq
  0.57 (PQ on 120 vectors is quantization-noise-bound — recorded, not
  hidden).

The structureless sf0.1 random vectors are deliberately NOT pinned
high: ANN pruning on data with no neighbor structure is random
subsampling (measured lsh 0.26 / ivf 0.42 / pq 0.06-0.08) — that is a
property of the data, not the index; the floors there live in the
tool's output and PLANS.md.
"""

from __future__ import annotations

import numpy as np
import pytest

from mysql_cdc_spark.operators import similarity as sim
from tools.ann_recall import adversarial_embeddings, measure

N_QUERIES, K = 50, 5


def _copies_fixture(spark, n_base: int = 200, copies: int = 5):
    """Base vectors + small-noise copies; labels = base id (the IVF
    cells).  Every vector's exact top-(copies-1) neighbors are its own
    copy family, at cosine ~0.999 vs ~0 cross-family."""
    rng = np.random.default_rng(42)
    rows = []
    for b in range(n_base):
        base = rng.normal(0, 1, sim.DIMS)
        base /= np.linalg.norm(base)
        for c in range(copies):
            v = base + rng.normal(0, 0.01, sim.DIMS)
            v /= np.linalg.norm(v)
            rows.append((b * copies + c, [float(x) for x in v.astype(np.float32)], b % 16))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )


def _by_path(rows: list[dict]) -> dict[str, dict]:
    return {r["path"]: r for r in rows}


@pytest.fixture(scope="module")
def copies_recall(spark):
    return _by_path(measure(spark, _copies_fixture(spark), N_QUERIES, K))


@pytest.fixture(scope="module")
def adversarial_recall(spark):
    return _by_path(measure(spark, adversarial_embeddings(spark), N_QUERIES, K))


def test_copies_fixture_recall_floors(copies_recall):
    r = copies_recall
    # measured r14 (multi-probe lsh; IVF_PROBES=3): lsh 0.924/0.8,
    # ivf 0.916/0.8, adc 0.68, ivfpq 0.724 (PQ dips slightly with more
    # probed cells — extra quantization-noise candidates crowd the
    # top-k; quantization-bound either way) — floors at
    # measured-with-margin.  r16: ann_lsh's DEFAULT is now capped at
    # ANN_DEFAULT_CAP=24 — measured 0.788/0.4 on this fixture (the
    # VERDICT-pinned 0.76/0.4 floor holds); the uncapped opt-out keeps
    # the old 0.924/0.8 and its old floor.
    assert r["ann_lsh"]["mean"] >= 0.76, r["ann_lsh"]
    assert r["ann_lsh_uncapped"]["mean"] >= 0.88, r["ann_lsh_uncapped"]
    assert r["ann_ivf"]["mean"] >= 0.85, r["ann_ivf"]
    assert r["ann_adc"]["mean"] >= 0.55, r["ann_adc"]
    assert r["ann_ivfpq"]["mean"] >= 0.60, r["ann_ivfpq"]
    # r18 IVFADC+R: exact re-rank of the ADC shortlist lifted the
    # shipped residual from 0.724/0.0 to 0.916/0.8 here (the pure-ADC
    # baseline stays visible as ann_ivfpq_residual_noR)
    assert r["ann_ivfpq_residual"]["mean"] >= 0.85, r["ann_ivfpq_residual"]
    assert r["ann_ivfpq_residual"]["min"] >= 0.6, r["ann_ivfpq_residual"]
    assert r["ann_ivfpq_residual_noR"]["mean"] >= 0.60, r["ann_ivfpq_residual_noR"]
    # the bucketed paths must also never strand a single query
    assert r["ann_lsh"]["min"] >= 0.4, r["ann_lsh"]
    assert r["ann_lsh_uncapped"]["min"] >= 0.6, r["ann_lsh_uncapped"]
    assert r["ann_ivf"]["min"] >= 0.6, r["ann_ivf"]


def test_adversarial_fixture_recall_floors(adversarial_recall):
    r = adversarial_recall
    # measured r14: lsh 1.0 / ivf 1.0 — the hot-bucket straddle shape
    # must not break the candidate paths (r16: capped default measured
    # 0.976 here; uncapped stays 1.0)
    assert r["ann_lsh"]["mean"] >= 0.95, r["ann_lsh"]
    assert r["ann_lsh_uncapped"]["mean"] >= 0.95, r["ann_lsh_uncapped"]
    assert r["ann_ivf"]["mean"] >= 0.95, r["ann_ivf"]
    # PQ on 120 tightly-clustered vectors is quantization-noise-bound:
    # measured 0.572 — pinned so it can only get better silently
    assert r["ann_adc"]["mean"] >= 0.45, r["ann_adc"]
    assert r["ann_ivfpq"]["mean"] >= 0.45, r["ann_ivfpq"]
    # TRUE IVFADC (residual encoding, r14) must beat raw-vector PQ on
    # clustered data — measured 0.696 vs 0.572 pure-ADC; with the r18
    # re-rank the shipped residual reads 1.0/1.0 here
    assert r["ann_ivfpq_residual"]["mean"] >= 0.90, r["ann_ivfpq_residual"]
    assert r["ann_ivfpq_residual"]["min"] >= 0.8, r["ann_ivfpq_residual"]
    assert r["ann_ivfpq_residual_noR"]["mean"] >= 0.60, r["ann_ivfpq_residual_noR"]
    assert r["ann_ivfpq_residual_noR"]["mean"] >= r["ann_ivfpq"]["mean"], r


def test_ann_lsh_candidate_cap_bounds_and_recall(spark, copies_recall):
    """r14 VERDICT #4: `max_candidates_per_query` must (a) actually
    bound the re-rank fan-in per query, (b) cut deterministically, and
    (c) at a generous cap reproduce the uncapped result exactly."""
    from pyspark.sql import functions as F

    emb = _copies_fixture(spark)
    cap = 7
    # (a) with k larger than the cap, output rows per query ≤ cap —
    # the only way that holds is the candidate set itself being capped
    capped = sim.ann_lsh(
        emb, n_queries=N_QUERIES, k=10_000, max_candidates_per_query=cap
    )
    per_q = capped.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    assert per_q and all(r["n"] <= cap for r in per_q), per_q
    # (b) two runs agree row-for-row (n_hits DESC, neighbor_id cut)
    a = sorted(map(tuple, capped.collect()))
    b = sorted(map(tuple, sim.ann_lsh(
        emb, n_queries=N_QUERIES, k=10_000, max_candidates_per_query=cap
    ).collect()))
    assert a == b
    # capped candidates are a subset of the uncapped candidate set
    uncapped = sim.ann_lsh(
        emb, n_queries=N_QUERIES, k=10_000, max_candidates_per_query=None
    )
    un_pairs = {(r["query_id"], r["neighbor_id"]) for r in uncapped.collect()}
    assert {(q, n) for q, n, *_ in a} <= un_pairs
    # (c) cap ≥ every query's candidate count → identical to uncapped
    max_cand = max(
        r["n"] for r in uncapped.groupBy("query_id")
        .agg(F.count("*").alias("n")).collect()
    )
    wide = sim.ann_lsh(
        emb, n_queries=N_QUERIES, k=10_000,
        max_candidates_per_query=max_cand,
    )
    assert sorted(map(tuple, wide.collect())) == sorted(
        map(tuple, uncapped.collect())
    )
    # recall trade-off at an AGGRESSIVE cap, measured r15 and pinned at
    # measured-with-margin (uncapped is 0.924/0.8 on this fixture):
    #   (n_hits DESC, ord_dist, id):  cap7 0.76/0.4, cap24 0.788/0.4
    #   (ord_dist, n_hits DESC, id):  cap7 0.628,    cap24 0.816
    #   composite ord-2M*(hits-1):    cap7 0.76,     cap24 0.812/0.8
    # The lexicographic hits-then-locality form is kept: it is the
    # standard multi-probe priority, carries no fixture-tuned constant
    # (the composite's 2M bonus is data-scale-dependent), and wins at
    # tight caps where the knob actually matters.  Hit count ALONE
    # (the first r15 attempt) collapsed to 0.596/0.0 — the ord_dist
    # secondary key is load-bearing.
    from tools.ann_recall import measure_one

    rec = measure_one(
        spark, emb, N_QUERIES, K,
        lambda e: sim.ann_lsh(e, n_queries=N_QUERIES, k=K,
                              max_candidates_per_query=7),
    )
    assert rec["mean"] >= 0.70, rec
    assert rec["min"] >= 0.2, rec


def _correlated_fixture(spark, n_base: int = 200, copies: int = 5):
    """Anisotropic fixture: eigenvalues decaying 8→0.05 mixed by a
    random orthogonal matrix, so the variance is strongly correlated
    ACROSS raw dimensions — the shape PQ's contiguous subspace split
    is worst at, and the one an OPQ rotation exists to fix."""
    rng = np.random.default_rng(7)
    d = sim.DIMS
    scales = np.geomspace(8.0, 0.05, d)
    q, _ = np.linalg.qr(rng.normal(0, 1, (d, d)))
    rows = []
    for b in range(n_base):
        base = q @ (rng.normal(0, 1, d) * scales)
        base /= np.linalg.norm(base)
        for c in range(copies):
            v = base + rng.normal(0, 0.01, d)
            v /= np.linalg.norm(v)
            rows.append((b * copies + c, [float(x) for x in v.astype(np.float32)], b % 16))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )


def test_opq_rotation_beats_residual_pq(spark, copies_recall, adversarial_recall):
    """r14 VERDICT #5: OPQ = covariance eigenbasis BALANCED-ALLOCATED
    across PQ subspaces (Ge et al. 2013), wired into the residual
    IVFADC path.  Measured r15 recall@5 (all deterministic fixtures):

        fixture      residual   opq(pca-order)   opq(balanced)
        correlated     0.516        0.360            0.768
        copies         0.724          —              0.784
        adversarial    0.696          —              0.732

    Pure PCA ordering LOST to no rotation at all (subspace 0 swallowed
    nearly all variance and its 16 codewords drowned) — the balanced
    allocation is load-bearing, and floors are pinned only where the
    rotation wins, which after balancing is all three fixtures.

    r18: the rotation comparison runs against the PURE-ADC residual
    (``rerank=None``) — the shipped residual default now carries the
    IVFADC+R exact re-rank, which would mask what the rotation itself
    buys (re-ranked residual ties or beats OPQ on these fixtures)."""
    for r, floor in ((copies_recall, 0.70), (adversarial_recall, 0.65)):
        assert r["ann_ivfpq_opq"]["mean"] >= floor, r["ann_ivfpq_opq"]
        assert (
            r["ann_ivfpq_opq"]["mean"] >= r["ann_ivfpq_residual_noR"]["mean"]
        ), (r["ann_ivfpq_opq"], r["ann_ivfpq_residual_noR"])
    cor = _by_path(measure(spark, _correlated_fixture(spark), N_QUERIES, K))
    assert cor["ann_ivfpq_opq"]["mean"] >= 0.70, cor["ann_ivfpq_opq"]
    assert (
        cor["ann_ivfpq_opq"]["mean"]
        >= cor["ann_ivfpq_residual_noR"]["mean"] + 0.15
    ), (cor["ann_ivfpq_opq"], cor["ann_ivfpq_residual_noR"])


def test_residual_rerank_organic_min_recall(spark):
    """r17 VERDICT #5 closed: ann_ivfpq_residual's min recall@5 was
    0.0 on one organic query at BOTH x10 and x100 (true neighbors sat
    at ADC ranks 80-320 behind code-tuple-colliding lower-id families
    — 65k tuples cannot separate an x100-dense corpus).  The IVFADC+R
    exact re-rank (shortlist PQ_RERANK*k, measured to cover the x100
    collision depth) restores 1.0/1.0 on the organic fixtures; pinned
    here with margin.  Skips when the stress fixture has not been
    generated (tools/scale_stress.py builds it)."""
    from pathlib import Path

    from mysql_cdc_spark.sources.io import read_table
    from tools.ann_recall import ORGANIC_X10, topk_sets, recall_at_k

    if not Path(ORGANIC_X10, "_done").exists():
        pytest.skip("organic x10 stress fixture not generated")
    emb = read_table(spark, ORGANIC_X10, "embeddings").cache()
    emb.count()
    try:
        truth = topk_sets(sim.knn(emb, n_queries=N_QUERIES, k=K))
        got = topk_sets(sim.ann_ivfpq_residual(emb, n_queries=N_QUERIES, k=K))
    finally:
        emb.unpersist()
    r = recall_at_k(truth, got)
    assert r["mean"] >= 0.95, r
    assert r["min"] >= 0.6, r  # the r17 defect was min == 0.0
