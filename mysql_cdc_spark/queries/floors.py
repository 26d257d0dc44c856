"""Per-query HEADLINE wall floors (r18 VERDICT #4).

The quiet-run headline total drifted 6.81 s (r17) → 7.48 s (r18)
while the throughput floors (decode/codec) stayed green — wall drift
was unattributable to a query.  These floors are the min-of-3 quiet
walls per HEADLINE query at sf0.1 on local[32] (recorded r19, host
load ~5/32 cores); tests/test_headline_floors.py re-times each query
against its floor with a generous band (1.5x, absolute slack for
sub-second queries), so the NEXT drift names the query that moved
instead of reading as ambient vibe.  bench.py embeds the comparison
in its artifact for the same reason.

Re-record (only with a justification in PLANS.md):
    python - <<'EOF'
    ... run each HEADLINE query 1 warm + 3 timed through the noop
    sink at sf0.1, print min per query ...
    EOF
"""

from __future__ import annotations

# min-of-3 quiet walls, sf0.1, local[32], r19
HEADLINE_FLOORS: dict[str, float] = {
    "cdc_envelope": 0.670,
    "cdc_select_all": 0.363,
    "cdc_update_sum": 0.589,
    "cdc_latest_state": 1.057,
    "cdc_txn_events": 1.127,
    "llm_dedup_minhash": 0.768,
    "llm_knn": 0.693,
    "llm_text_stats": 0.227,
    "ts_asof_join": 0.495,
    "ts_range_join": 0.640,
    "sk_hll_user_minutes": 0.733,
}

# band: 1.5x relative, with 0.3 s absolute slack so sub-second
# queries aren't failed by scheduler jitter alone
REL_BAND = 1.5
ABS_SLACK = 0.3


def allowed_wall(name: str) -> float:
    floor = HEADLINE_FLOORS[name]
    return max(floor * REL_BAND, floor + ABS_SLACK)
