"""Shuffle/spill evidence one decade past the overhead-bound regime
(r10 VERDICT #1): run the headline + dedup/refresh family at sf0.1 and
at the K× organic fixture (K=10 → sf1-equivalent), capturing per-query
executor metrics — shuffle read/write bytes, memory/disk spill, input
bytes — via the Spark UI REST API (the public status endpoint), and
report walls + byte ratios so superlinear shuffles are visible, not
extrapolated.

Method: one UI-enabled session; before each measured run, snapshot the
set of (stageId, attemptId) already present; after the run, sum the
metrics of stages NOT in the snapshot.  AQE re-attempts and skipped
stages are naturally excluded (skipped stages report zero tasks).

The session gets ``apply_scale_profile`` (mysql_cdc_spark/session.py)
with the fixture's on-disk byte size — the same sizing rules a cluster
deployment would use, exercised here per r10 VERDICT #7.

Usage: python tools/sf_metrics.py [K] [name ...]   (default K=10, full set)
Output: one JSON line per query + a trailing summary line.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1"

TARGET = [  # HEADLINE ∪ dedup/refresh family (r10 VERDICT #1 list)
    "cdc_envelope", "cdc_select_all", "cdc_update_sum",
    "cdc_latest_state", "cdc_txn_events",
    "llm_dedup_minhash", "llm_knn", "llm_text_stats",
    "ts_asof_join", "ts_range_join", "sk_hll_user_minutes",
    "llm_dedup_jaccard", "llm_dup_span_ranges", "llm_span_censor",
    "llm_incremental_neardup", "llm_refresh_pipeline",
    "llm_semantic_dedup",
    # r13 (r12 VERDICT #3): the r12/r13 surfaces — MP4 demux (classic +
    # fragmented; corpus is derived from the fixture's events table so
    # it scales with K) and the declarative stateful twin
    "mm_mp4_meta", "mm_mp4_keyframe_sample", "mm_mp4_quarantine",
    "mm_mp4_fragmented", "mm_mp4_fragmented_keyframes",
    "cdc_stream_latest_state_agg",
    # r14: the ANN family changed this round (multi-probe lsh,
    # IVF_PROBES=3) — its candidate fan-out is query-side-only by
    # design; keep that claim measured at K×
    "llm_ann_lsh", "llm_ann_ivf", "llm_ann_adc", "llm_ann_ivfpq",
    "llm_ann_ivfpq_residual",
    # r15 surfaces: codec-level table pushdown, the capped multi-probe
    # re-rank, rotated-residual PQ, schema evolution through the byte
    # path, and streaming xid assembly
    "cdc_binlog_pushdown", "llm_ann_lsh_uncapped", "llm_ann_ivfpq_rr",
    "cdc_binlog_schema_evo", "cdc_stream_txn_events",
    # r16 surfaces: delta-type (only_ops) pushdown and the DROP/
    # type-widening schema-evolution gate
    "cdc_binlog_only_ops", "cdc_binlog_schema_evo_drop",
    # r16 DataSource surfaces: the byte path through the Python Data
    # Source protocol (batch + Catalyst pushdown + streaming drain +
    # stateful assembly composition)
    "cdc_ds_envelope", "cdc_ds_pushdown", "cdc_ds_stream_envelope",
    "cdc_ds_stream_txn", "cdc_ds_archive_roundtrip", "cdc_ds_compact",
    "cdc_ds_stream_since",
]

_FIELDS = {
    "shuffleReadBytes": "shuffle_read",
    "shuffleWriteBytes": "shuffle_write",
    "memoryBytesSpilled": "spill_mem",
    "diskBytesSpilled": "spill_disk",
    "inputBytes": "input",
}


def _api(ui: str, path: str):
    with urllib.request.urlopen(f"{ui}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def _stages(ui: str, app_id: str) -> list[dict]:
    return _api(ui, f"applications/{app_id}/stages")


def _snapshot(ui: str, app_id: str) -> set[tuple[int, int]]:
    return {(s["stageId"], s["attemptId"]) for s in _stages(ui, app_id)}


def _collect(ui: str, app_id: str, seen: set[tuple[int, int]]) -> dict[str, int]:
    # brief settle: the status store is updated off the event bus
    time.sleep(0.4)
    out = {v: 0 for v in _FIELDS.values()}
    out["stages"] = 0
    for s in _stages(ui, app_id):
        if (s["stageId"], s["attemptId"]) in seen or s.get("status") == "SKIPPED":
            continue
        out["stages"] += 1
        for api_key, name in _FIELDS.items():
            out[name] += int(s.get(api_key, 0) or 0)
    return out


def _dir_bytes(d: str) -> int:
    return sum(p.stat().st_size for p in Path(d).rglob("*") if p.is_file())


def main() -> None:
    import os

    k = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10
    names = [a for a in sys.argv[1:] if not a.isdigit()] or TARGET

    from pyspark.sql import SparkSession

    from mysql_cdc_spark.queries import QUERIES
    from mysql_cdc_spark.session import apply_scale_profile
    from tools.scale_stress import ensure_organic

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sf-metrics")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")           # metrics source
        .config("spark.ui.retainedStages", "20000")   # no eviction mid-sweep
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    big = ensure_organic(spark, k)
    results: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf0.1", BASE), (f"x{k}", big)):
        prof = apply_scale_profile(spark, _dir_bytes(sf_dir))
        for name in names:
            fn = QUERIES[name]
            seen = _snapshot(ui, app_id)
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
                seen = _snapshot(ui, app_id)
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                wall = time.perf_counter() - t0
                m = _collect(ui, app_id, seen)
                m["wall"] = round(wall, 3)
            except Exception as exc:  # noqa: BLE001 — record the bomb, keep sweeping
                m = _collect(ui, app_id, seen)
                m["error"] = str(exc).split("\n")[0][:300]
            results.setdefault(name, {})[sf_label] = m
            print(json.dumps({"query": name, "sf": sf_label, **m}), flush=True)
            # release finished shuffles before the next query: the
            # ContextCleaner only deletes shuffle files after driver GC
            # notices the dependency is unreachable — back-to-back
            # multi-GB queries otherwise accumulate toward disk-full.
            import gc as _gc

            _gc.collect()
            spark.sparkContext._jvm.System.gc()
        results.setdefault("_profile", {})[sf_label] = prof

    summary = {}
    for name in names:
        a, b = results[name]["sf0.1"], results[name][f"x{k}"]
        if "error" in a or "error" in b:
            summary[name] = {"wall_ratio": "FAILED"}
            continue
        row = {
            "wall_ratio": round(b["wall"] / a["wall"], 2) if a["wall"] else None,
            "shuffle_w_ratio": (
                round(b["shuffle_write"] / a["shuffle_write"], 2)
                if a["shuffle_write"] else (None if not b["shuffle_write"] else "new")
            ),
            "spill": b["spill_disk"] + b["spill_mem"],
        }
        summary[name] = row
    ok = [n for n in names if summary[n].get("wall_ratio") != "FAILED"]
    superlinear = [
        n for n, r in summary.items()
        if isinstance(r.get("wall_ratio"), float) and r["wall_ratio"] > k * 1.3
    ] + [n for n in names if summary[n].get("wall_ratio") == "FAILED"]
    print(json.dumps({
        "mode": "sf_metrics", "k": k,
        "bytes_sf0.1": _dir_bytes(BASE), f"bytes_x{k}": _dir_bytes(big),
        "ratios": summary,
        "total_wall_sf0.1": round(sum(results[n]["sf0.1"]["wall"] for n in ok), 2),
        f"total_wall_x{k}": round(sum(results[n][f"x{k}"]["wall"] for n in ok), 2),
        "superlinear": superlinear,
    }, ), flush=True)


if __name__ == "__main__":
    main()
