"""Decode-throughput floors (r13 VERDICT #1).

`decode_rows_per_sec` drifted 439,996 (r11) → 386,922 (r13) with no
attribution.  r14 profiling found the envelope pipeline's EXECUTION was
never the problem (~0.30 s isolated for 400k rows); the drift lived in
driver-side DataFrame CONSTRUCTION — `changes()` built ~100 stacked
Column objects (one Py4J round-trip each, 0.42-0.51 s measured) and
`read_table` re-resolved the relation per call (~0.11 s) — which the
bench's construct-per-pass timing counts.  Both were fixed (selectExpr
string form; stat-keyed read memo).  These floors pin the three legs
separately so the next regression is attributable on sight:

- pure-Python codec rows/s (single-threaded, very stable),
- envelope plan-construction wall (the r12-r13 leak),
- end-to-end envelope rows/s, constructed per pass like the bench.

Floors are ~2x under the r14 measured values (codec 160k/s, construct
0.10-0.15 s, envelope >=1.1M rows/s at sf0.001*explode on local[32]):
generous enough for machine noise, tight enough that the r13 form
(construct ~0.5 s, envelope ~590k rows/s at sf0.1) fails them.
"""

from __future__ import annotations

import time

import pytest

from tests.conftest import SF_SMOKE


def test_codec_decode_throughput_floor():
    """Pure byte-codec hot loop (no Spark): the same fixture shape the
    bench's codec_rows_per_sec uses — 30k rows of (LONG, NEWDECIMAL,
    VARCHAR) across write/update events with table maps and xids."""
    from mysql_cdc_spark.sources.binlog_codec import (
        TYPE_LONG, TYPE_NEWDECIMAL, TYPE_VARCHAR, UPDATE_ROWS_EVENT,
        WRITE_ROWS_EVENT, BinlogWriter, TableDef, decode_binlog,
    )

    t = TableDef(
        "foo", "auto",
        [(TYPE_LONG, None), (TYPE_NEWDECIMAL, (12, 4)), (TYPE_VARCHAR, 50)],
    )
    cat = {("foo", "auto"): ["id", "val", "word"]}
    w = BinlogWriter()
    n_rows = 0
    for batch in range(200):
        w.write_table_map(t, ts=batch)
        rows = [[batch * 100 + i, f"{i}.5000", f"word{i}"] for i in range(100)]
        w.write_rows(WRITE_ROWS_EVENT, t, rows, ts=batch)
        w.write_rows(
            UPDATE_ROWS_EVENT, t,
            [(r, [r[0], f"{i}.7500", f"w{i}"]) for i, r in enumerate(rows[:50])],
            ts=batch,
        )
        n_rows += 150
    fixture = w.getvalue()
    # Measurement isolation: inside the full pytest process the live heap
    # (every collected test module + pyspark) is large, and the cyclic GC
    # walks ALL of it whenever the allocation-heavy decode loop trips a
    # collection — measured 1.41M -> 0.68-0.88M rows/s on the width-walk
    # leg from GC alone, i.e. the floor was timing the ambient heap, not
    # the codec.  Collect once, then keep the collector out of the timed
    # regions (decode output is acyclic, so refcounting still frees it).
    import gc

    decode_binlog(fixture, cat)  # warm (parse memos, bytecode)
    gc.collect()
    best = float("inf")
    gc.disable()
    try:
        for _ in range(3):
            t0 = time.perf_counter()
            decode_binlog(fixture, cat)
            best = min(best, time.perf_counter() - t0)
    finally:
        gc.enable()
    rows_per_sec = n_rows / best
    # r16 codec campaign: compiled per-shape field decoders +
    # integer-domain decimal decode measured 288k rows/s on this
    # fixture (interleaved A/B vs the r15 form's 171k = 1.68x
    # per-core); floor at ~half-of-measured, above the old form's
    # ceiling so a revert fails.
    assert rows_per_sec >= 140_000, f"codec decode {rows_per_sec:,.0f} rows/s < 140k floor"
    # r17 vectorization probe (PLANS.md): the width-walk path
    # (images='none' — exact row cardinality, no value
    # materialization) measured 1.54M rows/s on the 200 MB log, 6.1x
    # the full decode.  Header/CRC/framing is 1.1% of full-decode
    # wall (0.45 s of 39.9 s), so numpy-vectorizing headers is noise;
    # the 6.1x IS reachable by consumers through the DataSource's
    # columns= pruning.  Floor the fast path at ~60% of measured so a
    # regression to per-value decode on the pruned path fails loudly.
    # r19 recalibration: the 900k floor (60% of the r17 host's measured
    # 1.54M) flaked on the r19 sandbox, whose per-rep spread is wide
    # (same-session 10-rep interleaved: width-walk 584k-1,119k, best
    # 1.12M; per-value full decode 428k-609k, best 609k).  Keep the
    # discrimination the floor exists for — "pruned path regressed to
    # per-value decode" caps at ~610k best-of-N here — but place the
    # floor between the two populations (750k) and take best-of-7 so a
    # single downclocked rep cannot fail a healthy fast path.
    decode_binlog(fixture, cat, images="none")  # warm skip plans
    gc.collect()
    best_none = float("inf")
    gc.disable()
    try:
        for _ in range(7):
            t0 = time.perf_counter()
            decode_binlog(fixture, cat, images="none")
            best_none = min(best_none, time.perf_counter() - t0)
    finally:
        gc.enable()
    none_per_sec = n_rows / best_none
    assert none_per_sec >= 750_000, (
        f"width-walk decode {none_per_sec:,.0f} rows/s < 750k floor"
    )


@pytest.fixture(scope="module")
def _warm_envelope(spark):
    from mysql_cdc_spark.queries import QUERIES

    df = QUERIES["cdc_envelope"](spark, SF_SMOKE)
    df.write.format("noop").mode("overwrite").save()
    return df


def test_envelope_construction_cost_floor(spark, _warm_envelope):
    """Constructing the cdc_envelope plan must stay cheap: the r12-r13
    Column-builder form measured 0.42-0.51 s per construction (a chain
    of Py4J round-trips), which the bench counts against decode
    throughput.  The selectExpr form measures 0.10-0.15 s."""
    from mysql_cdc_spark.queries import QUERIES

    best = float("inf")
    # best-of-7 (was 3): construction is ~0.2 s here, so extra reps are
    # cheap, and a single ambient burst spanning three reps once failed
    # a healthy plan (0.557 s under load-3 co-tenancy, 0.13-0.21 quiet)
    # — the bound itself stays, the r12-r13 regression form cannot
    # clear it on any rep.
    for _ in range(7):
        t0 = time.perf_counter()
        QUERIES["cdc_envelope"](spark, SF_SMOKE)
        best = min(best, time.perf_counter() - t0)
    assert best <= 0.35, f"envelope plan construction {best:.3f}s > 0.35s floor"


def test_envelope_decode_throughput_floor(spark):
    """End-to-end envelope decode (scan -> explode -> project -> noop),
    constructed per pass exactly like bench.py times it.  At sf0.1
    (400k envelope rows) the r14 form measures ~0.30-0.38 s/pass =
    ~1.1-1.3M rows/s; the r13 form's ~0.5 s of extra per-pass
    construction put it at ~470k.  Floor 600k: the old form fails, the
    new has ~2x margin.  (Smaller SFs are useless here — at sf0.01 the
    envelope is 40k rows and the wall is pure fixed overhead.)"""
    from mysql_cdc_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.1"
    df = QUERIES["cdc_envelope"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm
    n_rows = df.count()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        QUERIES["cdc_envelope"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    rows_per_sec = n_rows / best
    assert rows_per_sec >= 600_000, f"envelope {rows_per_sec:,.0f} rows/s < 600k floor"


def test_multicore_decode_per_core_floor():
    """r14 VERDICT #3: the 100 TB decode claim rests on mapInPandas
    parallelism across binlog FILES.  Measured r15 on the x10 log
    (400 files): 1 core 57k rows/s, 8 cores 368k (6.4×, 80% per-core
    retention), 32 cores 995k (17.4×, 54%) — the 32-way drop is
    machine memory bandwidth, not Spark (a pure-Python
    multiprocessing decode of the same files retains only 62% at 32
    procs), and Arrow batch handling is not the lever (the envelope
    DataFrame build alone runs 589k rows/s, 10× above pipeline
    throughput; decode and envelope_records split the per-task cost
    ~50/50 at ~188k rows/s each).

    This floor pins the PARALLEL path at 8 cores on the sf0.1 log (40
    files, measured 231k rows/s total / 29k per core in a fresh JVM):
    a regression that serializes the per-file decode onto one core
    (the failure the repartition-by-path in read_binlog_envelope
    exists to prevent) lands at ≤90k total and fails both floors."""
    import json
    import pathlib
    import subprocess
    import sys

    from mysql_cdc_spark.queries._shared import _FIXTURE_VERSION, _STREAM_TMP

    fixture = pathlib.Path(_STREAM_TMP) / f"binlog_sf0.1_v{_FIXTURE_VERSION}"
    if not any(fixture.glob("binlog.*")):
        from mysql_cdc_spark.sources import binlog_source as bs
        from mysql_cdc_spark.session import get_spark

        get_spark("floor-fixture")  # session only needed by generator callers
        bs.generate_binlog_from_events("/root/testdata/sf0.1", str(fixture))
    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/decode_scaling.py",
         "--worker", "8", str(fixture)],
        capture_output=True, text=True, timeout=600,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"worker produced no result: {proc.stderr[-1500:]}"
    m = json.loads(lines[-1])
    assert m["rows_per_sec"] >= 120_000, m
    assert m["rows_per_sec_per_core"] >= 15_000, m


def test_knn_path_wall_floor(spark):
    """r15 VERDICT #6: llm_knn moved 1.30x in the driver bench while
    everything else sat inside the ambient band.  Interleaved A/B
    (tools/ab_bench.py --queries=llm_knn) measured r14 vs r15 at
    ratio 0.994 and r15 vs r16 at 0.963 - code-identical; the move
    was ambient.  This floor pins the path so the next move is
    attributable on sight: quiet best-of-3 measures ~0.63 s at sf0.1
    (broadcast queries + single corpus scan + two-stage top-k);
    ceiling at ~2.5x measured absorbs tenancy."""
    from mysql_cdc_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.1"
    df = QUERIES["llm_knn"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        QUERIES["llm_knn"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    assert best <= 1.6, f"llm_knn wall {best:.3f}s > 1.6s floor"
