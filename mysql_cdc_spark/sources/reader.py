"""User-facing binlog read helpers: thread (or DERIVE) the
``columns=`` projection option so narrow queries skip image decode.

Why this exists (r17 VERDICT #4): pyspark 4.1's Python Data Source
protocol has no Catalyst column-pruning endpoint — ``reader(schema)``
always receives the full schema (measured probe, PLANS.md r17) — so a
user who writes ``scan.select("offset", "xid")`` still pays full image
decode unless they ALSO pass ``.option("columns", ...)``.  The 6.1×
width-walk win (wide tables, no image materialization) should not
require knowing that trick:

* :func:`read_binlog` — the explicit form, ``columns=`` as a python
  list.
* :func:`read_binlog_pruned` — the automatic form: build the query
  against a full-schema scan, read the ANALYZED plan's references
  (the optimized plan prunes harder than the rebuild can re-apply —
  see required_scan_columns), re-read with exactly the envelope
  columns the query text touches, rebuild.

Deriving the projection from the optimized plan is safe because
over-inclusion is harmless (a superset decodes more than needed but
never changes results) and the extraction is deliberately
over-inclusive: every attribute reference ``name#id`` printed by any
operator ABOVE the scan counts, plus every envelope-named output
column of the final frame (covers the no-op ``select *`` case where
no operator re-lists columns).  Equality with the unpruned result is
pinned by tests/test_auto_prune.py across projection/filter/aggregate
shapes."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from mysql_cdc_spark.sources.binlog_source import _ENVELOPE_COLS


def read_binlog(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    **options: str,
) -> DataFrame:
    """``spark.read.format("mysql_binlog")`` with ``columns=`` as a
    list and remaining reader options passed through."""
    r = spark.read.format("mysql_binlog")
    if columns is not None:
        r = r.option("columns", ",".join(columns))
    for k, v in options.items():
        r = r.option(k, str(v))
    return r.load(path)


def required_scan_columns(df: DataFrame) -> list[str]:
    """The envelope columns ``df``'s ANALYZED plan references, in
    envelope order.

    The ANALYZED plan (not the optimized one) is deliberate: the
    rebuild re-applies the user's query to the narrowed scan, so the
    projection must keep every column the query TEXT touches — the
    optimizer may prune harder (e.g. a selected-but-never-aggregated
    column), and rebuilding against that tighter set fails analysis
    (measured: ``select(a, b, c).groupBy(c).count()`` optimized down
    to [c] and the re-applied select couldn't resolve ``a``).

    Extraction: drop the scan relation's own lines (they enumerate the
    FULL output and would mark everything referenced), then collect
    ``col#id`` attribute references from every remaining operator, and
    union the final frame's envelope-named output columns.  Returns at
    least one column — a pure ``count(*)`` plan references nothing,
    but a zero-column Arrow batch carries no row count, so the
    cheapest envelope column (``offset``) stands in.

    The plan renders with spark.sql.debug.maxToStringFields raised for
    the probe (r18 ADVICE): the default (25) elides operator fields as
    '... N more fields', and a wide query could hide a referenced
    envelope column inside the ellipsis — the rebuild against the
    under-included ``columns=`` scan would then fail analysis on a
    valid query (pinned by test_auto_prune's wide-projection case)."""
    spark = df.sparkSession
    _key = "spark.sql.debug.maxToStringFields"
    try:
        old = spark.conf.get(_key)
    except Exception:
        old = None
    spark.conf.set(_key, "100000")
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    finally:
        if old is None:
            spark.conf.unset(_key)
        else:
            spark.conf.set(_key, old)
    body = "\n".join(
        ln
        for ln in plan.splitlines()
        if "RelationV2" not in ln and "mysql_binlog" not in ln
    )
    needed = {
        c
        for c in _ENVELOPE_COLS
        if re.search(rf"(?<![A-Za-z0-9_]){re.escape(c)}#\d", body)
    }
    needed.update(c for c in df.columns if c in _ENVELOPE_COLS)
    if not needed:
        needed = {"offset"}
    return [c for c in _ENVELOPE_COLS if c in needed]


def read_binlog_pruned(
    spark: SparkSession,
    path: str,
    build,
    **options: str,
) -> DataFrame:
    """Automatic projection pruning: ``build`` is a function
    DataFrame → DataFrame expressing the query; it is applied once to
    a full-schema scan to learn the required envelope columns (no job
    runs — only the analyzed plan is inspected), then re-applied to a
    scan narrowed with ``columns=`` so the codec skips image decode
    for everything the query never reads.

        top_xids = read_binlog_pruned(
            spark, log_dir,
            lambda env: env.filter("op = 'xid'").select("offset", "xid"),
        )

    Matches the manual ``.option("columns", ...)`` plan exactly
    (parity pinned in tests/test_auto_prune.py; ds_bench's
    ``datasource_auto_pruned`` row tracks auto == manual wall)."""
    if "columns" in options:
        # a user-supplied projection would silently override the
        # derived one in the rebuild — explicit wins, so just build
        raise ValueError(
            "read_binlog_pruned derives columns= itself; pass an "
            "explicit projection through read_binlog(columns=...) instead"
        )
    probe = build(read_binlog(spark, path, **options))
    cols = required_scan_columns(probe)
    if set(cols) == set(_ENVELOPE_COLS):
        return probe  # nothing to prune: reuse the already-built plan
    return build(read_binlog(spark, path, columns=cols, **options))
