"""Live schema-version tracking as a custom stateful streaming
operator: the streaming twin of operators/history.py:schema_evolution.

The reference discovers schema dynamically from the stream (SURVEY
§1.4) — the natural streaming consumer of that idea is "what does
every table look like RIGHT NOW, and how many schema versions has it
been through?", maintained incrementally as DDL flows in, not
recomputed from the full log each time.

State design: keyed by (db, tbl, col) with a SCALAR-ONLY state row
(net, last_offset, n_ddls) — finer-grained than per-table state, which
parallelizes hot tables across their columns and keeps the state
schema to plain longs.  The fold is COMMUTATIVE on purpose (±1 sums,
max offset): an AvailableNow file stream batches files by modification
time, which need not match log order, so any order-sensitive fold
would be wrong-by-timing.  Each micro-batch emits the column's new net
presence; the per-table rollup (version count, live column count) is a
tiny batch aggregate over the final emissions, selected by the
strictly-increasing n_ddls counter rather than by offset.

The DDL substream is a vanishing fraction of the binlog, and state per
key is 3 longs — negligible state-store footprint at any scale.  DDL
parsing (action/column extraction) happens JVM-side BEFORE the Python
stateful fold.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType(), False),
        T.StructField("tbl", T.StringType(), False),
        T.StructField("col", T.StringType(), False),
        T.StructField("net", T.LongType(), False),
        T.StructField("as_of_offset", T.LongType(), False),
        T.StructField("n_ddls", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("net", T.LongType(), False),
        T.StructField("last_offset", T.LongType(), False),
        T.StructField("n_ddls", T.LongType(), False),
    ]
)


def _fold_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    net, last_offset, n_ddls = tuple(state.get) if state.exists else (0, -1, 0)
    touched = False
    for pdf in pdfs:
        # Commutative fold: ±1 sums and max() are replay-order-proof,
        # so it does not matter which order the source delivers files
        # in (AvailableNow file streams batch by modification time,
        # which need not match log order).
        net += int((pdf["action"] == "ADD").sum()) - int((pdf["action"] != "ADD").sum())
        n_ddls += len(pdf)
        last_offset = max(last_offset, int(pdf["offset"].max()))
        touched = True
    if touched:
        state.update((int(net), last_offset, int(n_ddls)))
        db, tbl, col = key
        yield pd.DataFrame(
            [
                {
                    "db": db,
                    "tbl": tbl,
                    "col": col,
                    "net": int(net),
                    "as_of_offset": last_offset,
                    "n_ddls": int(n_ddls),
                }
            ]
        )


def schema_version_stateful(changes_stream: DataFrame) -> DataFrame:
    """Fold the DDL substream into per-(table, column) net presence
    (update output mode; one row per touched column per batch)."""
    ddl = changes_stream.where(
        (F.col("op") == "query") & F.col("sql").rlike("^ALTER TABLE ")
    ).select(
        "db",
        "tbl",
        "offset",
        F.regexp_extract("sql", r" (ADD|DROP) COLUMN ", 1).alias("action"),
        F.regexp_extract("sql", r" (ADD|DROP) COLUMN (\w+)", 2).alias("col"),
    )
    return ddl.groupBy("db", "tbl", "col").applyInPandasWithState(
        _fold_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def table_schema_rollup(updates: DataFrame) -> DataFrame:
    """Reduce the drained per-batch column emissions to one live row
    per table: current dynamic-column count, total schema versions,
    last DDL offset.  Runs on |tables × cols × batches| rows — tiny."""
    # n_ddls strictly increases with every emission of a key, so it —
    # not as_of_offset — identifies the final state even when the
    # source delivered log files out of offset order.
    final_cols = updates.groupBy("db", "tbl", "col").agg(
        F.expr("max_by(struct(net, n_ddls), n_ddls)").alias("last"),
        F.max("as_of_offset").alias("col_offset"),
    )
    return final_cols.groupBy("db", "tbl").agg(
        F.max("col_offset").alias("as_of_offset"),
        F.sum((F.col("last.net") > 0).cast("bigint")).cast("bigint").alias("n_extra_cols"),
        F.sum("last.n_ddls").cast("bigint").alias("n_versions"),
    )
