"""Chain-window candidate recall pinned against ALL-PAIRS ground
truth (r11 VERDICT #1).

The ground truth is computed in PURE PYTHON (hashlib/numpy mirrors of
the engine-neutral signature contracts) — independent of Spark AND of
the DuckDB oracles — on the exact adversarial fixture the r11 verdict
named: k distinct near-dup clusters id-INTERLEAVED inside one hot
bucket (tools/chain_recall.py builds it; PLANS.md r12 has the full
measurement table).
"""

from __future__ import annotations

import pytest

from mysql_cdc_spark.operators import dedup, similarity
from tools.chain_recall import (
    comp_pair_recall,
    emb_fixture,
    jaccard,
    py_band_keys,
    py_cos,
    py_minhash,
    py_quant,
    py_sign_bits,
    text_fixture,
)

K_CLUSTERS, MEMBERS = 48, 6
N = K_CLUSTERS * MEMBERS


def test_text_chain_recall_bound(spark):
    """Text path: default (locality order, chain=32) must hold the
    measured recall floor on the interleaved-cluster fixture, and
    strictly beat the r11 id-order form."""
    docs, shs, info = text_fixture(K_CLUSTERS, MEMBERS)
    keys = [py_band_keys(py_minhash(s)) for s in shs]
    truth = {
        (i, j)
        for i in range(N)
        for j in range(i + 1, N)
        if any(keys[i][b] == keys[j][b] for b in range(dedup.LSH_BANDS))
        and jaccard(shs[i], shs[j]) >= dedup.JACCARD_THRESHOLD
    }
    assert len(truth) == 720  # deterministic fixture: all within-cluster pairs

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r[0], r[1])
        for r in dedup.minhash_lsh_pairs(df).select("doc_a", "doc_b").collect()
    }
    assert not (got - truth)  # bounded candidates never invent pairs
    pair_recall = len(got & truth) / len(truth)
    comp_recall = comp_pair_recall(N, truth, got)
    assert pair_recall >= 0.94, pair_recall        # measured 0.9528
    assert comp_recall == 1.0, comp_recall         # measured 1.0

    got_id = {
        (r[0], r[1])
        for r in dedup.minhash_lsh_pairs(df, locality_order=False)
        .select("doc_a", "doc_b")
        .collect()
    }
    assert len(got & truth) > len(got_id & truth)  # locality order must win


def test_embedding_chain_recall_bound(spark):
    """Embedding path: projection-order chain candidates must be
    near-lossless on the straddled-hyperplane fixture where the r11
    id-order form measured 0.21 pair recall."""
    np = pytest.importorskip("numpy")
    vecs = emb_fixture(K_CLUSTERS, MEMBERS)
    qs = [py_quant(np.array(v, dtype=np.float32)) for _, v in vecs]
    bits = [py_sign_bits(q) for q in qs]
    ppb = similarity.PLANES_PER_BAND
    nb = similarity.N_PLANES // ppb
    truth = {
        (i, j)
        for i in range(N)
        for j in range(i + 1, N)
        if any(
            bits[i][b * ppb : (b + 1) * ppb] == bits[j][b * ppb : (b + 1) * ppb]
            for b in range(nb)
        )
        and py_cos(qs[i], qs[j]) >= similarity.NEARDUP_COS
    }
    assert len(truth) >= 700  # ~all 720 within-cluster pairs

    edf = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        (r[0], r[1])
        for r in similarity.embedding_neardup_pairs(edf)
        .select("vec_a", "vec_b")
        .collect()
    }
    assert not (got - truth)
    pair_recall = len(got & truth) / len(truth)
    assert pair_recall >= 0.99, pair_recall                  # measured 0.9986
    assert comp_pair_recall(N, truth, got) == 1.0            # measured 1.0


def test_chain_equals_all_pairs_on_small_buckets(spark):
    """The oracle-validity invariant: a bucket with ≤ chain+1 members
    emits the FULL least/greatest-normalized pair set under ANY
    within-bucket ordering — which is why the gate oracles built on
    the all-pairs band join stay value-exact (fixture bucket maxima
    are far below chain)."""
    import random

    rng = random.Random(5)
    rows = []
    for bucket in range(4):
        ids = rng.sample(range(1000 * bucket, 1000 * bucket + 500), 33)
        sigs = {i: f"s{rng.randrange(7)}" for i in ids}  # scrambled order key
        rows += [(i, 0, f"b{bucket}", sigs[i]) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, band int, band_hash string, sig string")
    expect = set()
    for bucket in range(4):
        ids = sorted(i for i, _, bh, _ in rows if bh == f"b{bucket}")
        expect |= {(a, b) for a in ids for b in ids if a < b}
    for order_cols in (None, ["sig"]):
        got = {
            (r[0], r[1])
            for r in dedup._chain_candidates(
                df, ["band", "band_hash"], order_cols=order_cols
            ).collect()
        }
        assert got == expect, order_cols


def test_simhash_chain_recall_bound(spark):
    """SimHash path: the existing bit-string locality sort must hold
    its measured floor on a constructive hot-block fixture whose
    cluster interleave (40) EXCEEDS the chain window (32) — the
    pigeonhole regime a 16-bit block bucket reaches at corpus scale.
    Measured (PLANS.md r12): id order 0.83 pair / 0.992 comp; bit-
    string sort 0.965 / 1.000 — evidence the simhash path does NOT
    need the minhash path's projection passes (the simhash IS a
    Hamming-locality key; transposed projections measured only +0.005
    pair recall for a full extra pass)."""
    from tools.chain_recall import simhash_fixture, simhash_truth

    k_clusters, members = 40, 4
    n = k_clusters * members
    docs, sims, _, info = simhash_fixture(k_clusters, members)
    assert info["hot_blocks"], info
    truth = simhash_truth(sims)
    assert len(truth) == 240  # deterministic search: all within-cluster pairs

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r[0], r[1])
        for r in dedup.simhash_pairs(df).select("doc_a", "doc_b").collect()
    }
    assert not (got - truth)  # bounded candidates never invent pairs
    pair_recall = len(got & truth) / len(truth)
    assert pair_recall >= 0.95, pair_recall            # measured 0.9708 (M=4)
    assert comp_pair_recall(n, truth, got) == 1.0

    got_id = {
        (r[0], r[1])
        for r in dedup.simhash_pairs(df, locality_order=False)
        .select("doc_a", "doc_b")
        .collect()
    }
    assert len(got & truth) > len(got_id & truth)      # locality order must win
