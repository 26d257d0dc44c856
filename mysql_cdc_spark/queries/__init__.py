"""Query registry: every operator exposed as (spark, sf_dir) -> DataFrame,
with a matching DuckDB oracle SQL string.

This is the driver-facing inventory for SURVEY.md §2: each entry is one
implemented capability, runnable standalone and verified value-by-value
against DuckDB on the same parquet fixtures.

Determinism contract for oracle-checked queries:
- every computed column is aliased identically on both sides;
- group sums over DOUBLE go through DECIMAL(18,2) accumulation (exact,
  order-independent) and are cast back to DOUBLE, so Spark's partial
  aggregation order and DuckDB's cannot produce last-ulp differences;
- outputs are scalar columns only (no maps/arrays) so value hashing is
  engine-neutral.
"""

from __future__ import annotations

from mysql_cdc_spark.queries._registry import (  # noqa: F401
    HEADLINE,
    ORACLES,
    QUERIES,
    REGISTRATION_ORDER,
    QueryFn,
    finalize_order,
    register,
)

# Importing the domain modules populates the registry (side effects).
from mysql_cdc_spark.queries import (  # noqa: E402, F401
    binlog,
    cdc,
    dq,
    llm,
    mm,
    sk,
    sql,
    stream,
    ts,
)

finalize_order()

from mysql_cdc_spark.queries.rotation import rotate_window  # noqa: E402

rotate_window()

# Test/tool surface re-exported from the shared helpers.
from mysql_cdc_spark.queries._shared import (  # noqa: E402, F401
    _CKSUM_ROW_SPARK,
    _docs,
    _head_offset,
    _rows_dt,
)
