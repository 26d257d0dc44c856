"""Chain-window candidate recall vs ALL-PAIRS ground truth
(r11 VERDICT #1).

The r11 scale fix bounded within-bucket LSH candidates to each
member's next `chain` successors in doc_id order.  Its recall cost
was asserted ("the standard banding trade"), never measured — and the
adversarial miss case is known precisely: k DISTINCT near-dup
clusters whose members INTERLEAVE by id inside one hot bucket put
same-cluster successors k positions apart, beyond any fixed chain.

This tool builds exactly that fixture for BOTH paths and measures
pair recall and same-component pair recall against an all-pairs
ground truth computed in PURE PYTHON (hashlib/numpy mirrors of the
engine-neutral signature contracts) — independent of Spark AND of the
DuckDB oracles, so it also closes the r11 "oracle co-evolved with the
fix" concern: a shared misconception in the chain semantics cannot
pass this audit.

Text fixture: every doc = common block B (shared by ALL docs — its
shingles win some band's minhash minima, funneling every doc into ONE
band bucket) + cluster block C_c + per-member unique tail.  Within-
cluster Jaccard >= threshold, cross-cluster << threshold.  doc_id i
belongs to cluster i % k: same-cluster ids are k apart.

Embedding fixture: cluster centers share band-0's 4 sign bits (one
hot bucket) and are mutually near-orthogonal (cos < threshold);
members = center + noise, with the center projected onto one band-1
hyperplane so members STRADDLE it — for opposite-side member pairs
the hot band-0 bucket is the ONLY meet point.  vec_id i -> cluster
i % k.

Measured orderings: `id` (the r11 form: within-bucket order by
doc_id) vs `sig` (r12: order by the full signature first — near-dups
agree on most signature positions, so same-cluster members sort into
chain-coverable runs regardless of id interleaving).

Usage: python tools/chain_recall.py [k_clusters] [members]
Output: one JSON row per (path, order, chain) + ground-truth stats.
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mysql_cdc_spark.operators import dedup, similarity  # noqa: E402

# ---------------------------------------------------------------------------
# pure-Python signature mirrors (the engine-neutral contracts)
# ---------------------------------------------------------------------------


def py_shingles(text: str, n: int = dedup.SHINGLE_WORDS) -> set[str]:
    toks = text.lower().strip().split()
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def py_minhash(sh: set[str], k: int = dedup.MINHASH_K) -> list[str]:
    hs = [hashlib.md5(s.encode()).hexdigest() for s in sh]
    return [min(h[4 * s : 4 * s + 4] for h in hs) for s in range(k)]


def py_band_keys(mh: list[str], bands: int = dedup.LSH_BANDS) -> list[str]:
    rpb = len(mh) // bands
    return [
        hashlib.md5(
            "|".join([str(b)] + mh[b * rpb : (b + 1) * rpb]).encode()
        ).hexdigest()
        for b in range(bands)
    ]


def jaccard(a: set[str], b: set[str]) -> float:
    c = len(a & b)
    return c / (len(a) + len(b) - c)


W = np.array(similarity.WEIGHTS, dtype=np.int64)  # (8 planes, 64 dims)


def py_quant(v32: np.ndarray) -> np.ndarray:
    return np.floor(v32.astype(np.float64) * similarity.QUANT).astype(np.int64)


def py_sign_bits(q: np.ndarray) -> str:
    return "".join("1" if d >= 0 else "0" for d in (W @ q))


def py_cos(qa: np.ndarray, qb: np.ndarray) -> float:
    dot = int(qa @ qb)
    return dot / np.sqrt(float(qa @ qa) * float(qb @ qb))


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def _magic_token(slice_idx: int) -> str:
    """Token t whose triple-shingle's md5 slice `slice_idx` is '0000' —
    the guaranteed global minimum (other shingles can only TIE, which
    still yields the same minhash VALUE), so planting 't t t' in every
    doc pins mh[slice_idx] corpus-wide."""
    for t in range(300_000):
        tok = f"hot{t}"
        h = hashlib.md5(f"{tok} {tok} {tok}".encode()).hexdigest()
        if h[4 * slice_idx : 4 * slice_idx + 4] == "0000":
            return tok
    raise RuntimeError("no magic token found")


def text_fixture(k_clusters: int, members: int):
    """Every doc carries two planted shingles that pin band 0's two
    minhash slices to '0000' — ONE band bucket holds every doc; the
    Jaccard structure (within >= thr, cross << thr) is asserted."""
    thr = dedup.JACCARD_THRESHOLD
    t0, t1 = _magic_token(0), _magic_token(1)
    B = f"{t0} {t0} {t0} {t1} {t1} {t1}"
    nc, nu = 26, 7
    docs = []
    for i in range(k_clusters * members):
        c = i % k_clusters
        cb = " ".join(f"k{c}w{j}" for j in range(nc))
        uniq = " ".join(f"m{i}u{j}" for j in range(nu))
        docs.append((i, f"{B} {cb} {uniq}"))
    shs = [py_shingles(t) for _, t in docs]
    keys = [py_band_keys(py_minhash(s)) for s in shs]
    hot = [b for b in range(dedup.LSH_BANDS)
           if len({kk[b] for kk in keys}) == 1]
    assert hot, "planted minima failed to unify a band"
    w_j = jaccard(shs[0], shs[k_clusters])       # same cluster (0, k)
    x_j = jaccard(shs[0], shs[1])                # adjacent clusters
    assert w_j >= thr and x_j < thr * 0.8, (w_j, x_j)
    return docs, shs, {"hot_bands": hot, "within_j": round(w_j, 3),
                       "cross_j": round(x_j, 3)}


def emb_fixture(k_clusters: int, members: int, dims: int = similarity.DIMS):
    """Centers: shared band-0 bits, mutually cos < NEARDUP_COS; one
    band-1 plane projected out so members straddle it."""
    rng = np.random.default_rng(7)
    thr = similarity.NEARDUP_COS
    target = None
    centers: list[np.ndarray] = []
    straddle_plane = similarity.PLANES_PER_BAND  # first plane of band 1
    wp = W[straddle_plane].astype(np.float64)
    tries = 0
    while len(centers) < k_clusters and tries < 200_000:
        tries += 1
        c = rng.normal(0, 1, dims)
        c -= (wp @ c) / (wp @ wp) * wp              # band-1 plane dot ≈ 0
        c /= np.linalg.norm(c)
        bits = py_sign_bits(py_quant(c.astype(np.float32)))
        b0 = bits[: similarity.PLANES_PER_BAND]
        if target is None:
            target = b0
        if b0 != target:
            continue
        if any(abs(float(c @ e)) >= thr * 0.8 for e in centers):
            continue
        centers.append(c)
    if len(centers) < k_clusters:
        raise RuntimeError(f"only {len(centers)} centers found")
    vecs = []
    for i in range(k_clusters * members):
        c = centers[i % k_clusters]
        # tiny noise + a band-1-plane nudge with alternating sign so
        # members provably straddle the projected-out hyperplane
        v = c + rng.normal(0, 0.004, dims) + (1 if (i // k_clusters) % 2 else -1) * 0.01 * wp / np.linalg.norm(wp)
        v /= np.linalg.norm(v)
        v32 = v.astype(np.float32)
        # band-0 bits must stay on target (hot bucket); retry nudge if not
        if py_sign_bits(py_quant(v32))[: similarity.PLANES_PER_BAND] != target:
            v = c + rng.normal(0, 0.001, dims)
            v32 = (v / np.linalg.norm(v)).astype(np.float32)
        vecs.append((i, [float(x) for x in v32]))
    return vecs


# --- SimHash mirror + constructive hot-bucket fixture ----------------------

SIMHASH_BITS = dedup.SIMHASH_BITS
SIMHASH_BANDS = 4
SIMHASH_WIDTH = SIMHASH_BITS // SIMHASH_BANDS
_SIM_PAT: dict[str, np.ndarray] = {}


def _sim_pat(s: str) -> np.ndarray:
    if s not in _SIM_PAT:
        h = hashlib.md5(s.encode()).hexdigest()
        _SIM_PAT[s] = np.array(
            [(int(h[j // 4], 16) >> (3 - j % 4)) & 1 for j in range(SIMHASH_BITS)],
            dtype=np.int32,
        )
    return _SIM_PAT[s]


def py_simhash(sh: set[str]) -> str:
    """Mirror of dedup.simhash_signatures (majority of md5 hex-MSB bits;
    empty set → all-ones)."""
    if not sh:
        return "1" * SIMHASH_BITS
    cnt = sum(_sim_pat(s) for s in sh)
    n = len(sh)
    return "".join("1" if 2 * cnt[j] >= n else "0" for j in range(SIMHASH_BITS))


def hamming(a: str, b: str) -> int:
    return sum(x != y for x, y in zip(a, b))


def simhash_fixture(k_clusters: int, members: int, max_tries: int = 400_000):
    """Constructive hot-block collision fixture: why it exists — a
    16-bit simhash block has only 65,536 values, so at corpus scale a
    block bucket holds n/65k docs and DISTINCT clusters share buckets
    by pigeonhole.  At fixture scale collisions never occur randomly,
    so they are SEARCHED: a dominant common preamble B pins most block
    bits, and cluster/member token sets are rejection-sampled until
    block 0 matches B's base value exactly (hot bucket) while cluster
    bases stay > HAM+4 apart (cross pairs can never verify) and
    members stay within 2 bits of their cluster base (within pairs
    always verify).  Incremental vote counting keeps the ~40k-try
    search fast."""
    nb, nc, nu = 60, 12, 2
    B = " ".join(f"bb{j}" for j in range(nb))
    base_sh = py_shingles(B)
    base_cnt = sum(_sim_pat(s) for s in base_sh)
    base_n = len(base_sh)

    def bits_from(cnt, n):
        return "".join("1" if 2 * cnt[j] >= n else "0" for j in range(SIMHASH_BITS))

    base_bits = bits_from(base_cnt, base_n)

    def sig_incr(text):
        sh = py_shingles(text)
        new = [s for s in sh if s not in base_sh]
        cnt = base_cnt.copy()
        for s in new:
            cnt = cnt + _sim_pat(s)
        return sh, bits_from(cnt, base_n + len(new))

    ham = dedup.HAMMING_THRESHOLD
    clusters, tries = [], 0
    while len(clusters) < k_clusters and tries < max_tries:
        tries += 1
        cb = " ".join(f"k{tries}w{j}" for j in range(nc))
        _, bits = sig_incr(f"{B} {cb}")
        if bits[:SIMHASH_WIDTH] != base_bits[:SIMHASH_WIDTH]:
            continue
        if any(hamming(bits, pb) <= ham + 4 for _, pb in clusters):
            continue
        clusters.append((cb, bits))
    if len(clusters) < k_clusters:
        raise RuntimeError(f"only {len(clusters)} colliding clusters in {tries} tries")

    docs, sims, shs = [], [], []
    for i in range(k_clusters * members):
        cb, cbits = clusters[i % k_clusters]
        for t in range(800):
            uq = " ".join(f"m{i}u{j}t{t}" for j in range(nu))
            sh, bits = sig_incr(f"{B} {cb} {uq}")
            if bits[:SIMHASH_WIDTH] == base_bits[:SIMHASH_WIDTH] and hamming(bits, cbits) <= 2:
                break
        else:
            raise RuntimeError(f"no block-preserving unique tail for member {i}")
        docs.append((i, f"{B} {cb} {uq}"))
        sims.append(bits)
        shs.append(sh)
    hot = [
        b
        for b in range(SIMHASH_BANDS)
        if len({s[b * SIMHASH_WIDTH : (b + 1) * SIMHASH_WIDTH] for s in sims}) == 1
    ]
    assert hot, "search failed to pin a hot block"
    return docs, sims, shs, {"hot_blocks": hot, "search_tries": tries}


def simhash_truth(sims: list[str]) -> set[tuple[int, int]]:
    n = len(sims)
    ham = dedup.HAMMING_THRESHOLD
    w = SIMHASH_WIDTH
    truth = set()
    for i in range(n):
        for j in range(i + 1, n):
            if any(
                sims[i][b * w : (b + 1) * w] == sims[j][b * w : (b + 1) * w]
                for b in range(SIMHASH_BANDS)
            ) and hamming(sims[i], sims[j]) <= ham:
                truth.add((i, j))
    return truth


# ---------------------------------------------------------------------------
# ground truth + metrics
# ---------------------------------------------------------------------------


def components(n: int, pairs: set[tuple[int, int]]) -> list[int]:
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [find(i) for i in range(n)]


def comp_pair_recall(n, truth_pairs, got_pairs) -> float:
    ct = components(n, truth_pairs)
    cg = components(n, got_pairs)
    same_t = [(i, j) for i in range(n) for j in range(i + 1, n) if ct[i] == ct[j]]
    if not same_t:
        return 1.0
    kept = sum(1 for i, j in same_t if cg[i] == cg[j])
    return kept / len(same_t)


def report(path, n, truth_pairs, runs):
    for (order, chain), got in runs.items():
        inter = len(truth_pairs & got)
        print(json.dumps({
            "path": path, "order": order, "chain": chain,
            "truth_pairs": len(truth_pairs), "found_of_truth": inter,
            "extra_found": len(got - truth_pairs),
            "pair_recall": round(inter / len(truth_pairs), 4) if truth_pairs else 1.0,
            "component_pair_recall": round(comp_pair_recall(n, truth_pairs, got), 4),
        }), flush=True)


def main() -> None:
    k_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    members = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n = k_clusters * members

    from mysql_cdc_spark.session import get_spark

    spark = get_spark("chain-recall")

    # ---- text path --------------------------------------------------------
    docs, shs, info = text_fixture(k_clusters, members)
    sigs = [py_minhash(s) for s in shs]
    keys = [py_band_keys(m) for m in sigs]
    # all-pairs-within-bucket candidates (pre-r11 semantics), exact verify
    truth = set()
    for i in range(n):
        for j in range(i + 1, n):
            if any(keys[i][b] == keys[j][b] for b in range(dedup.LSH_BANDS)):
                if jaccard(shs[i], shs[j]) >= dedup.JACCARD_THRESHOLD:
                    truth.add((i, j))
    within_truth = sum(1 for (i, j) in truth if i % k_clusters == j % k_clusters)
    print(json.dumps({"path": "text", "fixture": info, "n_docs": n,
                      "truth_pairs": len(truth), "within_cluster_truth": within_truth}))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    runs = {}
    for order in ("id", "locality"):
        for chain in (8, 32):
            got = dedup.minhash_lsh_pairs(
                df, chain=chain, locality_order=(order == "locality")
            ).select("doc_a", "doc_b").collect()
            runs[(order, chain)] = {(r[0], r[1]) for r in got}
    report("text", n, truth, runs)

    # ---- embedding path ----------------------------------------------------
    vecs = emb_fixture(k_clusters, members)
    qs = [py_quant(np.array(v, dtype=np.float32)) for _, v in vecs]
    bits = [py_sign_bits(q) for q in qs]
    ppb = similarity.PLANES_PER_BAND
    nb = similarity.N_PLANES // ppb
    truth_e = set()
    for i in range(n):
        for j in range(i + 1, n):
            if any(bits[i][b * ppb:(b + 1) * ppb] == bits[j][b * ppb:(b + 1) * ppb]
                   for b in range(nb)):
                if py_cos(qs[i], qs[j]) >= similarity.NEARDUP_COS:
                    truth_e.add((i, j))
    hot_only = sum(
        1 for (i, j) in truth_e
        if bits[i][ppb:] != bits[j][ppb:] and i % k_clusters == j % k_clusters
    )
    print(json.dumps({"path": "embedding", "n_vecs": n, "truth_pairs": len(truth_e),
                      "pairs_meeting_ONLY_in_hot_band0_bucket": hot_only}))

    edf = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    runs_e = {}
    for order in ("id", "locality"):
        for chain in (8, 32):
            got = similarity.embedding_neardup_pairs(
                edf, chain=chain, locality_order=(order == "locality")
            ).select("vec_a", "vec_b").collect()
            runs_e[(order, chain)] = {(r[0], r[1]) for r in got}
    report("embedding", n, truth_e, runs_e)

    # ---- simhash path ------------------------------------------------------
    # Interleave must exceed chain to be adversarial; the constructive
    # search finds ~40 colliding clusters in ~40k tries.
    k_sim = min(k_clusters, 40)
    sdocs, sims, _, sinfo = simhash_fixture(k_sim, members)
    ns = k_sim * members
    truth_s = simhash_truth(sims)
    within_s = sum(1 for (i, j) in truth_s if i % k_sim == j % k_sim)
    print(json.dumps({"path": "simhash", "fixture": sinfo, "n_docs": ns,
                      "truth_pairs": len(truth_s), "within_cluster_truth": within_s}))
    sdf = spark.createDataFrame(sdocs, "doc_id long, text string")
    runs_s = {}
    for order in ("id", "locality"):
        for chain in (8, 32):
            got = dedup.simhash_pairs(
                sdf, chain=chain, locality_order=(order == "locality")
            ).select("doc_a", "doc_b").collect()
            runs_s[(order, chain)] = {(r[0], r[1]) for r in got}
    report("simhash", ns, truth_s, runs_s)


if __name__ == "__main__":
    main()
