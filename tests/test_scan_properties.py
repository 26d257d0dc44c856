"""Property tests for the chunked distributed prefix scan: for ANY
values, ANY chunk span and ANY marker placement, the distributed
result equals the sequential fold."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mysql_cdc_spark.functions.scan import running_agg

# Cents values (exact under DECIMAL(18,2)), including negatives.
_VALUES = st.lists(
    st.integers(-10_000, 10_000).map(lambda c: Decimal(c) / 100),
    min_size=1,
    max_size=60,
)


@given(_VALUES, st.integers(1, 16))
@settings(max_examples=15, deadline=None)
def test_running_sum_equals_sequential_fold(spark, vals, chunk_span):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "offset long, v decimal(18,2)"
    )
    got = {
        r["offset"]: Decimal(r["rs"])
        for r in running_agg(df, "offset", F.col("v"), "rs", chunk_span=chunk_span).collect()
    }
    acc = Decimal(0)
    for i, v in enumerate(vals):
        acc += v
        assert got[i] == acc


@given(_VALUES, st.integers(1, 16), st.booleans())
@settings(max_examples=10, deadline=None)
def test_string_value_path_matches_column_path(spark, vals, chunk_span, inclusive):
    """The batched-construction path (``value`` as a SQL string) must
    be row-identical to the Column-builder path for any values, span
    and inclusivity — pins the r19 construction-cost rewrite."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "offset long, v decimal(18,2)"
    )
    via_col = running_agg(
        df, "offset", F.col("v"), "rs", inclusive=inclusive, chunk_span=chunk_span
    )
    via_str = running_agg(
        df, "offset", "v", "rs", inclusive=inclusive, chunk_span=chunk_span
    )
    assert via_str.schema == via_col.schema
    a = sorted(map(tuple, via_col.collect()))
    b = sorted(map(tuple, via_str.collect()))
    assert a == b


@given(st.lists(st.booleans(), min_size=1, max_size=60), st.integers(1, 16))
@settings(max_examples=15, deadline=None)
def test_marker_prefix_count_equals_sequential(spark, markers, chunk_span):
    """The transaction-tagging form: count of markers STRICTLY before
    each row (inclusive=False) for arbitrary marker placement."""
    df = spark.createDataFrame(
        [(i, int(m)) for i, m in enumerate(markers)], "offset long, m long"
    )
    got = {
        r["offset"]: int(r["cnt"])
        for r in running_agg(
            df, "offset", F.col("m"), "cnt", inclusive=False, chunk_span=chunk_span
        ).collect()
    }
    seen = 0
    for i, m in enumerate(markers):
        assert got[i] == seen
        seen += int(m)
