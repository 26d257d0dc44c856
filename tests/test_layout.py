"""Z-order layout: the property that makes it worth doing — every
file's (user, hour) bounding rectangle is far smaller than the full
range on BOTH dimensions, which no single-column sort achieves."""

from __future__ import annotations

from mysql_cdc_spark.operators.layout import zorder_file_stats


def _grid_events(spark):
    # full 256x256 (u, h) grid, one event per cell: u = user_id % 256,
    # h = hours-since-epoch % 256 (ts in whole hours)
    rows = [(u * 256 + h, u, h * 3_600_000_000) for u in range(64) for h in range(64)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long")
    return df.selectExpr(
        "event_id", "user_id", "timestamp_micros(ts_us) AS ts"
    )


def test_every_file_is_a_tight_rectangle(spark):
    stats = {r["file_id"]: r for r in zorder_file_stats(_grid_events(spark)).collect()}
    assert sum(r["n_rows"] for r in stats.values()) == 64 * 64
    for r in stats.values():
        # 64 files over a 16-bit z space -> each file covers 1024 z
        # cells = a 32x32 (or tighter) rectangle; a time-only sort
        # would give every file the FULL 0-255 user span.
        assert r["max_u"] - r["min_u"] <= 32
        assert r["max_h"] - r["min_h"] <= 32


def test_two_predicate_pruning_beats_linear_layout(spark):
    """A point lookup (u0, h0) must touch exactly one z file; the
    same data laid out by hour alone leaves every file's user span at
    the full range, pruning nothing on user."""
    ev = _grid_events(spark)
    stats = zorder_file_stats(ev).collect()
    u0, h0 = 17, 42
    touched = [
        r for r in stats
        if r["min_u"] <= u0 <= r["max_u"] and r["min_h"] <= h0 <= r["max_h"]
    ]
    assert len(touched) == 1

    # linear (hour-sorted) strawman: bucket files by h alone
    from pyspark.sql import functions as F
    linear = (
        ev.selectExpr("user_id % 256 AS u", "unix_micros(ts) div 3600000000 AS h")
        .withColumn("file_id", F.expr("h div 1 div 1"))  # 64 h-values -> 64 files
        .groupBy("file_id")
        .agg(F.min("u").alias("min_u"), F.max("u").alias("max_u"))
        .collect()
    )
    # every hour-file spans (almost) the whole user range -> user
    # predicate prunes nothing
    assert all(r["max_u"] - r["min_u"] >= 60 for r in linear)


def test_zorder_write_produces_prunable_footer_stats(spark, tmp_path):
    """The write path end-to-end: range-partitioned z-sorted parquet
    files must carry tight per-file (u, h) min/max in their FOOTERS —
    the stats a file-skipping reader consults — and a two-predicate
    point lookup must match only a small fraction of files."""
    import pyarrow.parquet as pq
    from mysql_cdc_spark.operators.layout import zorder_write

    path = str(tmp_path / "zorder")
    zorder_write(_grid_events(spark), path, files=16)

    import glob
    stats = []
    for f in glob.glob(path + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins = {"u": None, "h": None}
        maxs = {"u": None, "h": None}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        if mins["u"] is not None:
            stats.append((mins["u"], maxs["u"], mins["h"], maxs["h"]))
    assert len(stats) >= 8                     # real multi-file layout
    # 16 files over the 64x64 grid -> each file's z range spans a
    # bounded rectangle; footer spans must be far below the full range
    for mu, xu, mh, xh in stats:
        assert xu - mu <= 32 and xh - mh <= 32
    # two-predicate point lookup: footer stats alone must prune to
    # at most 2 of 16 files (boundary files can straddle)
    u0, h0 = 21, 13
    touched = [s for s in stats if s[0] <= u0 <= s[1] and s[2] <= h0 <= s[3]]
    assert 1 <= len(touched) <= 2
