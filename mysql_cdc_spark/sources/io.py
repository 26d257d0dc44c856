"""Fixture table IO.

The driver's parquet fixtures store some timestamps at nanosecond
precision, which the Spark vectorized parquet reader rejects
(PARQUET_TYPE_ILLEGAL).  We read those columns as raw int64
(`spark.sql.legacy.parquet.nanosAsLong`, runtime-settable) and convert
to TimestampType with exact integer `div 1000` truncation — matching
DuckDB's ns→us truncation so oracle comparisons agree bit-for-bit.

Column detection reads only the parquet footer (driver-side, O(1)).

The resolved DataFrame is memoized per (session, path, stat): reading
a table costs ~0.11 s of driver-side work (relation resolution, footer
read, conversion projection), and every query construction pays it —
at r14 that was ~25% of the bench's per-pass wall on the cdc family.
A production engine caches exactly this in its catalog.  Staleness is
keyed by (mtime_ns, size): rewriting a fixture/scratch table changes
the stat and misses the memo; the bounded map just drops old entries.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pyarrow.types as patypes
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (id(spark), path, mtime_ns, size) -> resolved DataFrame.  Bounded;
# cleared wholesale when full (same policy as the codec's parse memos).
_READ_MEMO: dict[tuple, DataFrame] = {}
_READ_MEMO_MAX = 256


def clear_read_memo() -> None:
    """Drop all memoized table reads (tests / explicit invalidation)."""
    _READ_MEMO.clear()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; ns-timestamp columns arrive as int64
    (``spark.sql.legacy.parquet.nanosAsLong`` is set at session build —
    session.py) and are converted here with exact integer truncation.
    The table may be a single file (driver fixtures) or a directory of
    part files (derived/stress tables)."""
    import glob
    import os

    path = f"{sf_dir}/{name}.parquet"
    # Session confs are set BEFORE the memo lookup so a memo hit on a
    # fresh/externally-built session still gets the one config the
    # fixture reader cannot do without (r14 ADVICE: a hit skipped it).
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false":
        # Naive us-precision fixture timestamps must read as TimestampType
        # (UTC session), not TIMESTAMP_NTZ, for a stable envelope schema.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    try:
        st = os.stat(path)
        key = (id(spark), path, st.st_mtime_ns, st.st_size)
        if os.path.isdir(path):
            # Rewriting a part file IN PLACE does not bump the directory
            # mtime (only create/delete/rename do) — fold the newest part
            # file's stat into the key so that case misses (r14 ADVICE).
            newest = (0, 0)
            for part in os.scandir(path):
                pst = part.stat()
                newest = max(newest, (pst.st_mtime_ns, pst.st_size))
            key = key + newest
    except OSError:
        key = None
    if key is not None:
        memo = _READ_MEMO.get(key)
        if memo is not None:
            return memo
    df = spark.read.parquet(path)
    schema_file = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(f"{path}/*.parquet"))
        if not parts:
            return df  # empty directory table: nothing to convert
        schema_file = parts[0]
    ns_cols = [
        field.name
        for field in pq.read_schema(schema_file)
        if patypes.is_timestamp(field.type) and field.type.unit == "ns"
    ]
    if ns_cols:
        df = df.selectExpr(
            *(
                f"timestamp_micros(`{c}` div 1000) AS `{c}`" if c in ns_cols else f"`{c}`"
                for c in df.columns
            )
        )
    if key is not None:
        if len(_READ_MEMO) >= _READ_MEMO_MAX:
            _READ_MEMO.clear()
        _READ_MEMO[key] = df
    return df
