"""R10: the driver / connection / statement surface — the reference's
JDBC entry points (CDCDriver.clj + the Statement/Connection deftypes in
src/cdc/jdbc.clj) as a thin Python API over the engine.

Contract parity:
- URL scheme `jdbc:mysql-cdc:<source>` with the same accept rule
  (-acceptsURL regex, CDCDriver.clj:37-38); `<source>` here is the
  fixture directory (stands in for the binlog index file path)
- ONE global connection (singleton enforced, CDCDriver.clj:54-59,
  jdbc.clj:348-353): connecting again while open returns the same
  object
- ONE statement per connection (jdbc.clj:581-586)
- `execute_query` parses the reference grammar (R1/R2) and returns a
  forward-only cursor (R9); `execute_update` is unsupported
  (jdbc.clj:368-371); the connection is read-only (:613, :482)
- R12 catalog: `list_tables` is backed by `spark.catalog` over
  registered views — strictly richer than the reference, whose every
  DatabaseMetaData query returns an EMPTY resultset (jdbc.clj:397-570)
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from mysql_cdc_spark.operators import query as q
from mysql_cdc_spark.operators.cursor import ForwardOnlyCursor
from mysql_cdc_spark.sources.events_cdc import changes

URL_RE = re.compile(r"^jdbc:mysql-cdc:(?P<source>.+)$")


def accepts_url(url: str) -> bool:
    """CDCDriver.-acceptsURL (CDCDriver.clj:37-38)."""
    return URL_RE.match(url) is not None


class UnsupportedOperation(RuntimeError):
    """The reference throws on every write/scroll path."""


class CDCStatement:
    def __init__(self, conn: "CDCConnection") -> None:
        self._conn = conn
        self.closed = False

    def execute_query(self, sql: str) -> ForwardOnlyCursor:
        """Parse a reference-grammar statement and open a forward-only
        cursor over the change stream (jdbc.clj:348-353 → :164-185)."""
        if self.closed or self._conn.closed:
            raise RuntimeError("statement is closed")
        env = changes(self._conn.spark, self._conn.source)
        return ForwardOnlyCursor(q.execute_statement(env, sql))

    def execute_query_stream(
        self,
        sql: str,
        trigger_seconds: float = 0.5,
        log_dir: str | None = None,
    ):
        """The CONTINUOUS form — the reference's defining behavior:
        `executeQuery` opens a query that never terminates; the cursor
        blocks in `next()` until the log grows (jdbc.clj:213-218
        blocking on the queue `.take`).

        Returns (QueueStreamingCursor, StreamingQuery handle): iterate
        the cursor; call `handle.stop()` to end the continuous query.
        `log_dir` overrides the materialized event-log directory (a
        live deployment points this at the real ingest directory).

        Bounded by construction (r8): each micro-batch flows through a
        foreachBatch into a bounded queue.Queue(10) — the reference's
        LinkedBlockingQueue(10) (jdbc.clj:44) — so driver memory is
        O(queue × batch) regardless of how long the stream runs, and
        `maxFilesPerTrigger=1` bounds the batch to one log file.
        """
        import os
        import uuid

        from mysql_cdc_spark.streaming import runtime as rt

        if self.closed or self._conn.closed:
            raise RuntimeError("statement is closed")
        spark = self._conn.spark
        if log_dir is None:
            log_dir = rt.ensure_event_log(spark, self._conn.source)
        stream = rt.open_stream(spark, log_dir, max_files_per_trigger=1)
        parsed = q.parse_statement(sql)
        out = q.select_changes(
            stream, parsed["db"], parsed["table"], parsed["delta_type"]
        )
        # PID in the checkpoint name: _shared's import-time GC only
        # reaps cp_* dirs whose owner process is dead, so a concurrent
        # import can't delete this live query's source log.
        name = f"cdc{os.getpid()}_{uuid.uuid4().hex[:10]}"
        cp_dir = f"/root/repo/.stream_tmp/cp_{name}"
        cursor = rt.QueueStreamingCursor().attach(
            out, cp_dir, trigger_seconds=trigger_seconds
        )
        # Result schema for metadata consumers (the PEP 249 shim's
        # description field): the queue cursor itself only sees Rows.
        cursor.schema = out.schema
        query_handle = cursor.query
        # A queue-sink continuous query has no durable output to
        # protect: remove its per-call checkpoint when it stops so
        # repeated queries don't accumulate orphaned state (advisor
        # finding; same hygiene as the registry's _drain).
        original_stop = query_handle.stop

        def _stop_and_clean() -> None:
            import shutil

            try:
                # Release the cursor FIRST: if the consumer stopped
                # reading and the bounded queue is full, the
                # foreachBatch producer is spinning in its put loop and
                # only exits on the closed flag — stopping the query
                # before setting it would block forever on the
                # in-flight micro-batch (advisor finding).
                cursor.release()
                original_stop()
            finally:
                shutil.rmtree(cp_dir, ignore_errors=True)

        query_handle.stop = _stop_and_clean
        return cursor, query_handle

    def execute_query_push(
        self,
        sql: str,
        binlog_dir: str,
        first_log: str | None = None,
        catalog: dict[tuple[str, str], list[str]] | None = None,
        journal_path: str | None = None,
    ):
        """The reference's TRUE hot path, end to end: a continuous
        query directly over growing binlog BYTES — executeQuery →
        reader thread with inotify wake → incremental decode → bounded
        queue → blocking FILTERED ResultSet (jdbc.clj:164-185 filter
        semantics over :205-331's cursor) — with no Spark job per turn
        (ms-latency; the Spark path pays the micro-batch floor).

        Returns (FilteredPushCursor, PushDelivery): iterate the cursor,
        call `delivery.stop()` to end the query.  `journal_path` makes
        the position durable (resume without loss or duplication after
        restart — beyond the reference, mysql_binlog.clj:914-916).
        `first_log` defaults to the lexically first `*.NNNNNN` file in
        the directory (the reference's log-index discovery, S5)."""
        import os
        import re

        from mysql_cdc_spark.streaming.push import (
            FilteredPushCursor,
            PushDelivery,
        )

        if self.closed or self._conn.closed:
            raise RuntimeError("statement is closed")
        parsed = q.parse_statement(sql)
        if first_log is None:
            logs = sorted(
                p for p in os.listdir(binlog_dir) if re.search(r"\.\d+$", p)
            )
            if not logs:
                raise FileNotFoundError(f"no binlog files in {binlog_dir}")
            first_log = logs[0]
        # Construct (and thereby validate the delta type) BEFORE
        # starting the tailer thread: a rejected statement must not
        # leak a running delivery holding the inotify fd and journal.
        delivery = PushDelivery(
            binlog_dir, first_log, catalog, journal_path=journal_path
        )
        cursor = FilteredPushCursor(
            delivery, parsed["db"], parsed["table"], parsed["delta_type"]
        )
        delivery.start()
        return cursor, delivery

    def execute_update(self, sql: str) -> int:
        raise UnsupportedOperation("unsupported: executeUpdate (jdbc.clj:368-371)")

    def close(self) -> None:
        self.closed = True


class CDCConnection:
    _instance: "CDCConnection | None" = None

    def __init__(self, spark: SparkSession, source: str) -> None:
        self.spark = spark
        self.source = source
        self.closed = False
        self._statement: CDCStatement | None = None

    # -- singleton driver entry (CDCDriver.clj:54-59) -----------------

    @classmethod
    def connect(cls, url: str, spark: SparkSession) -> "CDCConnection":
        m = URL_RE.match(url)
        if m is None:
            raise ValueError(f"URL not accepted by this driver: {url!r}")
        if cls._instance is not None and not cls._instance.closed:
            # Singleton semantics (CDCDriver.clj:54-59) hold only for
            # the SAME source: silently handing back a connection bound
            # to a different directory would misdirect every query
            # (advisor finding) — make the caller close it first.
            if cls._instance.source != m.group("source"):
                raise RuntimeError(
                    f"a connection to {cls._instance.source!r} is already open; "
                    "close it before connecting to a different source"
                )
            return cls._instance
        cls._instance = cls(spark, m.group("source"))
        return cls._instance

    # -- statement (one per connection, jdbc.clj:581-586) -------------

    def create_statement(self) -> CDCStatement:
        if self.closed:
            raise RuntimeError("connection is closed")
        if self._statement is None or self._statement.closed:
            self._statement = CDCStatement(self)
            return self._statement
        raise RuntimeError("only one open statement per connection (jdbc.clj:581-586)")

    # -- metadata -----------------------------------------------------

    @property
    def read_only(self) -> bool:
        return True  # jdbc.clj:613, :482

    def list_tables(self) -> list[str]:
        """R12, richer than the reference's empty sets: the registered
        temp views visible to Spark SQL."""
        return sorted(t.name for t in self.spark.catalog.listTables())

    def register_views(self) -> None:
        """Expose the change stream to `spark.sql` as views (`changes`
        and `rows_dt`) — the catalog entries the reference never had."""
        env = changes(self.spark, self.source)
        env.createOrReplaceTempView("changes")
        from mysql_cdc_spark.sources.events_cdc import rows_delta_type

        rows_delta_type(env).createOrReplaceTempView("rows_dt")

    def close(self) -> None:
        if self._statement is not None:
            self._statement.close()
        self.closed = True


def connect(url: str, spark: SparkSession) -> CDCConnection:
    """Module-level DriverManager.getConnection analog."""
    return CDCConnection.connect(url, spark)
