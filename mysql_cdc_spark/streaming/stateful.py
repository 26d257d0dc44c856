"""Custom stateful streaming operator: per-key latest-state replay
maintained in Spark streaming STATE (`applyInPandasWithState`) — the
escape hatch SURVEY §2.6 reserves for semantics the built-in windowed
aggregations can't express (here: arbitrary per-key reducer state that
must survive across micro-batches and emit incremental updates).

The reducer keeps one (offset, value, delta_type) triple per
(db, tbl, id) — O(1) state per key, the streaming twin of the batch
``max(struct(...))`` aggregate in operators/aggregates.py — and emits
the key's new best image whenever a batch advances it.  Keys arrive
Arrow-batched per group; state is checkpointed by the engine, so a
restart resumes with every key's last image intact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType(), False),
        T.StructField("tbl", T.StringType(), False),
        T.StructField("id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("as_of_offset", T.LongType(), False),
        T.StructField("is_deleted", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("dtype", T.StringType(), False),
    ]
)


def _update_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    best = tuple(state.get) if state.exists else None
    for pdf in pdfs:
        for offset, value, dtype in zip(pdf["offset"], pdf["value"], pdf["_delta_type"]):
            offset = int(offset)
            if best is None or offset > best[0]:
                best = (offset, None if pd.isna(value) else float(value), str(dtype))
    if best is not None:
        state.update(best)
        db, tbl, id_ = key
        yield pd.DataFrame(
            [
                {
                    "db": db,
                    "tbl": tbl,
                    "id": None if id_ is None else int(id_),
                    "value": best[1],
                    "as_of_offset": best[0],
                    "is_deleted": best[2] == "delete",
                }
            ]
        )


def latest_state_stateful(rows_dt_stream: DataFrame) -> DataFrame:
    """Streaming latest-state over a rows_dt stream (update output
    mode): each micro-batch emits the new current image for every key
    it touched.  `update-before` images are excluded up front, exactly
    as in the batch operator."""
    from pyspark.sql import functions as F

    from mysql_cdc_spark.model import DT_UPDATE_BEFORE

    rows = rows_dt_stream.filter(F.col("_delta_type") != DT_UPDATE_BEFORE).select(
        "db", "tbl", "id", "offset", "value", "_delta_type"
    )
    return rows.groupBy("db", "tbl", "id").applyInPandasWithState(
        _update_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
