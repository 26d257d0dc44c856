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
then swap the directories ATOMICALLY with renameat2(RENAME_EXCHANGE)
(public Linux syscall, glibc wrapper): old and new change places in one
kernel operation, so there is no instant at which ``log_dir`` does not
exist — a crash anywhere leaves it pointing at either the complete old
or the complete verified new data.  Where renameat2 is unavailable
(non-Linux / old glibc) the swap falls back to two os.replace renames,
whose crash window between them is healed by ``_recover_stale_dirs``
at the start of every run (restore-from-backup semantics), so a
crashed run never wedges or loses data on either path.

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


AT_FDCWD = -100          # linux/fcntl.h
RENAME_EXCHANGE = 2      # linux/fs.h


def _exchange_dirs(a: str, b: str) -> bool:
    """Atomically swap two directories in one renameat2(RENAME_EXCHANGE)
    call; returns False when the syscall/wrapper is unavailable (caller
    falls back to the two-rename path)."""
    import ctypes
    import ctypes.util

    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6", use_errno=True)
        renameat2 = libc.renameat2
    except (OSError, AttributeError):
        return False
    rc = renameat2(
        ctypes.c_int(AT_FDCWD), os.fsencode(a),
        ctypes.c_int(AT_FDCWD), os.fsencode(b),
        ctypes.c_uint(RENAME_EXCHANGE),
    )
    if rc != 0:
        err = ctypes.get_errno()
        # EINVAL/ENOSYS: flag or syscall unsupported (old kernel/fs) —
        # fall back; anything else is a real failure.
        if err in (22, 38):  # EINVAL, ENOSYS
            return False
        raise OSError(err, f"renameat2({a}, {b}, RENAME_EXCHANGE) failed")
    return True


def _recover_stale_dirs(log_dir: str) -> None:
    """Clean up leftovers from a prior crashed run.

    With the RENAME_EXCHANGE swap the only leftovers are a stale
    ``.compacting`` (pre-swap: incomplete rewrite; post-swap: the OLD
    data, already superseded) — discard either — and, from the
    two-rename fallback path only:
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
    if os.path.isdir(tmp) and os.path.isdir(log_dir):
        shutil.rmtree(tmp)
    elif os.path.isdir(tmp) and not os.path.isdir(log_dir):
        # defensive: cannot happen on either swap path (log_dir is
        # only ever absent between the fallback's two renames, and then
        # .compacting still holds the verified new data) — restore it
        # rather than delete the only copy.
        os.replace(tmp, log_dir)
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

    import shutil

    if _exchange_dirs(tmp, log_dir):
        # one atomic kernel op: log_dir now holds the verified new
        # data, tmp holds the old — log_dir existed at every instant
        shutil.rmtree(tmp)
    else:
        # portability fallback: two renames with a recovery-healed
        # crash window (see _recover_stale_dirs)
        backup = log_dir.rstrip("/") + ".precompact"
        os.replace(log_dir, backup)
        os.replace(tmp, log_dir)
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
