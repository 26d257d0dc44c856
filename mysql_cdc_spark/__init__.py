"""mysql_cdc_spark — a PySpark-native change-data-capture analytics engine.

A from-scratch rebuild of the capabilities of hoeck/mysql-cdc (a MySQL
binlog CDC reader with a streaming-SQL JDBC driver) on top of Apache
Spark: the change-event data model is a DataFrame, the query surface is
Spark SQL, the streaming runtime is Structured Streaming, and the
binlog byte-level codec is a pure-Python module exposed through
``mapPartitions`` over ``binaryFile`` scans.

Layout:
    model.py       — change-event envelope schema + delta-type vocabulary
    session.py     — tuned SparkSession builder
    sources/       — event-stream derivation, fixture readers, binlog codec
    operators/     — query surface (filter/explode/project), transactions,
                     aggregates, dedup, similarity, text analysis
    functions/     — reusable column expressions
    streaming/     — Structured Streaming runtime (cursor, lifecycle)
"""

__version__ = "0.1.0"
