"""Change-event data model.

The reference's unit of data is one map per binlog event with rows
nested inside (``read-event-header``, reference
src/cdc/mysql_binlog.clj:290-328; ``read-wud-rows`` :611-682).  Here
that becomes a fixed *envelope* StructType carried by every event, with
the row images as nested (nullable) fields.

Envelope columns
----------------
offset     BIGINT     byte offset in the log; strictly increasing per
                      file (reference :325, progress state :914-916)
log_file   STRING     log-rotation support (ROTATE handling :888-905)
ts         TIMESTAMP  header timestamp (:318)
server_id  BIGINT     (:320)
xid        BIGINT     commit id — non-null only on `xid` events (:393-394)
db         STRING     from TABLE_MAP (:512)
tbl        STRING     from TABLE_MAP (:513)
op         STRING     event kind, see OPS below
before_id / before_value   update/delete before-image (typed columns —
                      we fix the reference's ordinal-only schema gap,
                      see SURVEY §1.4)
after_id / after_value     insert/update after-image
sql        STRING     QUERY_EVENT statement text (:376-378)

The binlog decode path (sources/binlog_source.py) produces the generic
MAP<STRING,STRING> image payload for dynamic per-table schemas
(GENERIC_ENVELOPE_SCHEMA below is its core shape); the typed columns
here are the "registered schema" fast path used by the derived stream.

Delta-type vocabulary (reference src/cdc/jdbc.clj:104-115):
WRITE rows → ``insert``; DELETE rows → ``delete``; UPDATE rows →
pair tagged ``update-before`` then ``update``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Event kinds (subset of the reference's 27-entry log-event-types table,
# src/cdc/mysql_binlog.clj:222-259 — the ones its dispatch loop decodes,
# :715-752).  ROTATE is represented by the log_file column.
OP_QUERY = "query"
OP_TABLE_MAP = "table_map"
OP_WRITE_ROWS = "write_rows"
OP_UPDATE_ROWS = "update_rows"
OP_DELETE_ROWS = "delete_rows"
OP_XID = "xid"
OPS = (OP_QUERY, OP_TABLE_MAP, OP_WRITE_ROWS, OP_UPDATE_ROWS, OP_DELETE_ROWS, OP_XID)
ROW_OPS = (OP_WRITE_ROWS, OP_UPDATE_ROWS, OP_DELETE_ROWS)

# Delta-type tags produced by the explode (reference jdbc.clj:108-114).
DT_INSERT = "insert"
DT_DELETE = "delete"
DT_UPDATE_BEFORE = "update-before"
DT_UPDATE = "update"
DELTA_TYPES = (DT_INSERT, DT_DELETE, DT_UPDATE_BEFORE, DT_UPDATE)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("log_file", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("server_id", T.LongType(), False),
        T.StructField("xid", T.LongType(), True),
        T.StructField("db", T.StringType(), True),
        T.StructField("tbl", T.StringType(), True),
        T.StructField("op", T.StringType(), False),
        T.StructField("before_id", T.LongType(), True),
        T.StructField("before_value", T.DoubleType(), True),
        T.StructField("after_id", T.LongType(), True),
        T.StructField("after_value", T.DoubleType(), True),
        T.StructField("sql", T.StringType(), True),
    ]
)

# Generic envelope for dynamic per-table schemas: images are
# MAP<STRING,STRING>, distinguishing SQL NULL (key present, value null)
# from column-not-in-image (key absent) — the reference's nil-vs-'_
# distinction (src/cdc/mysql_binlog.clj:604 vs :606-608).
GENERIC_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("log_file", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("server_id", T.LongType(), False),
        T.StructField("xid", T.LongType(), True),
        T.StructField("db", T.StringType(), True),
        T.StructField("tbl", T.StringType(), True),
        T.StructField("op", T.StringType(), False),
        T.StructField("before", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("after", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("sql", T.StringType(), True),
    ]
)
