"""Event-log compaction: rewrite a parquet event-log directory into a
small number of offset-range-ordered files.

A long-running CDC ingest (BinlogTailer → parquet appends) produces
one small file per drain — the classic small-file swamp that kills
scan parallelism economics at scale (every file costs a task + footer
read).  Compaction is the standing maintenance job: coalesce to
~target file count with `repartitionByRange` on the offset so each
output file covers a contiguous offset range (range-ordered files keep
downstream offset-filtered reads prunable), verify the rewrite moved
every row unchanged (count + order-insensitive xxhash64 checksum),
then swap via two os.replace renames.  Each rename is atomic but the
PAIR is not: a crash between them leaves the data only in the
``.precompact`` backup.  Every run therefore starts by recovering any
stale ``.compacting`` / ``.precompact`` leftovers (restore or discard —
see ``_recover_stale_dirs``), so a crashed run never wedges the next.

Usage: python tools/compact_event_log.py <log_dir> [n_files]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def checksum(df) -> tuple[int, int]:
    """(row_count, order-insensitive content checksum).  DECIMAL
    accumulation: exact, and immune to ANSI overflow on the sum."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def _recover_stale_dirs(log_dir: str) -> None:
    """Clean up leftovers from a prior crashed run.

    The swap below is two sequential os.replace calls — NOT atomic as a
    pair.  Crash windows and their recovery:
    - stale ``.compacting`` (crash before/during verify): incomplete
      rewrite, discard it;
    - stale ``.precompact`` with ``log_dir`` present (crash after both
      renames, before rmtree): swap completed, drop the backup;
    - stale ``.precompact`` with ``log_dir`` MISSING (crash between the
      two renames): the data lives only in the backup — restore it.
    Without this, a leftover non-empty .precompact makes
    os.replace(log_dir, backup) raise ENOTEMPTY and wedges the tool.
    """
    import shutil

    tmp = log_dir.rstrip("/") + ".compacting"
    backup = log_dir.rstrip("/") + ".precompact"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    if os.path.isdir(backup):
        if os.path.isdir(log_dir):
            shutil.rmtree(backup)
        else:
            os.replace(backup, log_dir)


def compact_event_log(spark, log_dir: str, n_files: int = 4) -> dict:
    """Compact `log_dir` in place; returns a stats dict."""
    _recover_stale_dirs(log_dir)
    src = spark.read.parquet(log_dir)
    before_files = len([p for p in os.listdir(log_dir) if p.endswith(".parquet")])
    n_before, h_before = checksum(src)

    tmp = log_dir.rstrip("/") + ".compacting"
    (
        src.repartitionByRange(n_files, "offset")
        .sortWithinPartitions("offset")
        .write.mode("overwrite")
        .parquet(tmp)
    )

    out = spark.read.parquet(tmp)
    n_after, h_after = checksum(out)
    if (n_before, h_before) != (n_after, h_after):
        raise RuntimeError(
            f"compaction checksum mismatch: {(n_before, h_before)} != {(n_after, h_after)}"
        )

    backup = log_dir.rstrip("/") + ".precompact"
    os.replace(log_dir, backup)
    os.replace(tmp, log_dir)
    import shutil

    shutil.rmtree(backup)
    after_files = len([p for p in os.listdir(log_dir) if p.endswith(".parquet")])
    return {
        "rows": n_before,
        "files_before": before_files,
        "files_after": after_files,
        "checksum": h_before,
    }


def main() -> None:
    from mysql_cdc_spark.session import get_spark

    log_dir = sys.argv[1]
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    stats = compact_event_log(get_spark("compact-event-log"), log_dir, n_files)
    print(stats)


if __name__ == "__main__":
    main()
