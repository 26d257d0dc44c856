"""Per-query HEADLINE wall floors (r18 VERDICT #4): each headline
query's min wall at sf0.1 must stay inside a generous band of its
recorded quiet floor (queries/floors.py) — so cross-round headline
drift is attributable to a NAMED query, not ambient tenancy.  The
band (1.5x + absolute slack) absorbs the measured ±15% host swing; a
real plan regression (a new shuffle, a lost pushdown) lands well
outside it.

r19 host normalization: the floors are absolute seconds from one
sandbox instance, and instances differ by a global Spark-wall
multiplier (measured: a fresh idle instance read EVERY headline wall
a uniform 2.4-3.1x its floor while pure-Python codec throughput
matched the recording host).  The headline set anchors its own host
speed — bands scale by the median wall/floor ratio (capped in
floors.py), so one regressed query still flags while a slower host
does not flag everything.  All queries are therefore measured by one
module fixture before any comparison runs.
"""

from __future__ import annotations

import time

import pytest

from mysql_cdc_spark.queries.floors import (
    FLOORS_CPUS,
    HEADLINE_FLOORS,
    allowed_wall,
    host_speed_index,
)

SF01 = "/root/testdata/sf0.1"

# Floors were recorded at local[FLOORS_CPUS]; at any other core count
# longer walls are expected, not a regression (bench.py applies the
# same guard).
pytestmark = pytest.mark.skipif(
    __import__("os").environ.get("SPARK_GRAFT_CPUS", "32") != str(FLOORS_CPUS),
    reason=f"headline floors recorded at local[{FLOORS_CPUS}]",
)


def _wall(queries, name) -> float:
    t0 = time.perf_counter()
    queries[name](spark=_wall.spark, sf_dir=SF01).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


@pytest.fixture(scope="module")
def headline_walls(spark):
    """One warm pass, then min-of-up-to-3 walls per query: pass 1
    times every query once, and extra reps go only to queries outside
    their band at the pass-1 host index — fast hosts pay ~1 rep per
    query, noisy readings get re-tried before they can fail."""
    from mysql_cdc_spark.queries import QUERIES

    _wall.spark = spark
    for name in HEADLINE_FLOORS:  # warm (JIT, codegen, footers)
        QUERIES[name](spark, SF01).write.format("noop").mode(
            "overwrite"
        ).save()

    walls = {name: _wall(QUERIES, name) for name in sorted(HEADLINE_FLOORS)}
    for _ in range(2):
        idx = host_speed_index(walls)
        retry = [
            n for n in walls if walls[n] > allowed_wall(n, idx)
        ]
        if not retry:
            break
        for name in retry:
            walls[name] = min(walls[name], _wall(QUERIES, name))
    return walls, host_speed_index(walls)


def test_host_index_normalizes_host_not_query():
    """Pure-unit pin of the normalization's discrimination: a uniform
    host multiplier is absorbed; one query regressing on a normal host
    still flags; an everything-regressed change saturates the cap and
    still flags."""
    from mysql_cdc_spark.queries.floors import HOST_INDEX_CAP

    # uniform 3x host: index 3, nothing flags
    walls = {n: f * 3.0 for n, f in HEADLINE_FLOORS.items()}
    idx = host_speed_index(walls)
    assert abs(idx - 3.0) < 1e-9
    assert all(walls[n] <= allowed_wall(n, idx) for n in walls)

    # one query at 4x on an otherwise 1x host: index ~1, that query flags
    name = "llm_dedup_minhash"
    walls = dict(HEADLINE_FLOORS)
    walls[name] = HEADLINE_FLOORS[name] * 4.0
    idx = host_speed_index(walls)
    assert idx < 1.2
    flagged = [n for n in walls if walls[n] > allowed_wall(n, idx)]
    assert flagged == [name]

    # everything at 8x (global regression): cap binds, floors still trip
    walls = {n: f * 8.0 for n, f in HEADLINE_FLOORS.items()}
    idx = host_speed_index(walls)
    assert idx == HOST_INDEX_CAP
    assert any(walls[n] > allowed_wall(n, idx) for n in walls)


@pytest.mark.parametrize("name", sorted(HEADLINE_FLOORS))
def test_headline_wall_within_floor_band(headline_walls, name):
    walls, idx = headline_walls
    best = walls[name]
    assert best <= allowed_wall(name, idx), (
        f"{name}: min wall {best:.3f}s exceeds band "
        f"{allowed_wall(name, idx):.3f}s (floor {HEADLINE_FLOORS[name]:.3f}s"
        f", host index {idx:.2f}) "
        "— attribute or re-record the floor with a PLANS.md note"
    )
