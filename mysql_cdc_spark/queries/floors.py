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

# Re-recorded at the END of optimization round 20 (PLANS.md): the
# round's changes moved most headline minima well below the r19
# floors (cdc_latest_state 0.452 -> 0.166 after the rows_dt rebalance
# removal; cdc_select_all 0.248 -> 0.098; construction memo zeroes
# nine queries' plan-build wall) — a regression back to the r19 plan
# shapes would have passed inside the old bands.  Values are the
# per-query min across two independent quiet passes (load_1m 2.1-5.7
# falling, min-of-5 each, separate sessions), sf0.1, local[32].
HEADLINE_FLOORS: dict[str, float] = {
    "cdc_envelope": 0.198,
    "cdc_select_all": 0.098,
    "cdc_update_sum": 0.124,
    "cdc_latest_state": 0.166,
    "cdc_txn_events": 0.059,
    "llm_dedup_minhash": 0.555,
    "llm_knn": 0.342,
    "llm_text_stats": 0.158,
    "ts_asof_join": 0.196,
    "ts_range_join": 0.321,
    "sk_hll_user_minutes": 0.248,
}

# band: 1.5x relative, with absolute slack so sub-second queries
# aren't failed by scheduler jitter alone.  Slack raised 0.3 -> 0.6
# when the floors were re-recorded: every fixture is a single-row-
# group parquet file, so each query's FIRST stage is one task and a
# co-tenant burst lands entirely on that task (cdc_latest_state read
# 0.45 s and 1.32 s minutes apart this round).  0.6 s absorbs the
# measured burst while still flagging the >=2x walls the stale floors
# would have let pass (e.g. cdc_txn_events regressing to its old
# 1.1 s wall now exceeds its 0.66 s band).
REL_BAND = 1.5
ABS_SLACK = 0.6

# The floors are min walls at THIS core count; at any other
# local[$SPARK_GRAFT_CPUS] the comparison is meaningless (the driver
# also benches at a lower core count to measure scaling, where longer
# walls are the expected answer, not a regression — measured at
# cpus=8 on a quiet host: cdc_envelope 0.98 s vs its 32-core 0.87 s
# band).  bench.py reports floors_exceeded=None when the core count
# differs, exactly like its sf-dir guard.
FLOORS_CPUS = 32

# Host normalization (r19, second recalibration): the floors are
# absolute seconds recorded on ONE sandbox instance, but instances
# vary — at end-of-round the same HEAD read every headline wall a
# uniform 2.4-3.1x its floor on a fresh instance (idle, zero steal,
# same core count) while the pure-Python codec throughput matched the
# recording host, i.e. a global Spark-wall multiplier, not a query.
# The headline set is therefore its own host-speed anchor: the MEDIAN
# wall/floor ratio across the measured queries is the host index, and
# each query's band scales by it.  One query regressing 2x moves its
# own ratio, barely moves the median, and still flags; a uniformly
# slower host moves the median and nothing flags spuriously.  The
# index is capped so a change that regresses EVERYTHING (a global
# session-config mistake) still trips every floor rather than
# normalizing itself away.
HOST_INDEX_CAP = 4.0


def host_speed_index(walls: dict[str, float]) -> float:
    """Median wall/floor ratio over the measured headline queries,
    clamped to [1, HOST_INDEX_CAP].  `walls` maps query name -> min
    wall seconds; names without a recorded floor are ignored."""
    ratios = sorted(
        walls[n] / HEADLINE_FLOORS[n]
        for n in walls
        if n in HEADLINE_FLOORS and HEADLINE_FLOORS[n] > 0
    )
    if not ratios:
        return 1.0
    mid = len(ratios) // 2
    med = (
        ratios[mid]
        if len(ratios) % 2
        else (ratios[mid - 1] + ratios[mid]) / 2
    )
    return min(max(1.0, med), HOST_INDEX_CAP)


def allowed_wall(name: str, host_index: float = 1.0) -> float:
    # The floor (a real query wall) scales with host speed; the
    # absolute slack (scheduler-jitter absorption for single-task
    # first stages) deliberately does NOT — that keeps HOST_INDEX_CAP
    # meaningful for sub-second floors, where a slack that scaled with
    # the index would swallow even a capped global regression.
    floor = HEADLINE_FLOORS[name] * host_index
    return max(floor * REL_BAND, floor + ABS_SLACK)
