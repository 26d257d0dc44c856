from mysql_cdc_spark.sources.events_cdc import changes, rows_delta_type  # noqa: F401
