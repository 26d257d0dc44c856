"""PEP 249 (DB-API 2.0) shim over the CDC connection/cursor surface
(r13 VERDICT #5).

The reference's deliverable is a `java.sql.Driver` any JVM client can
load (reference CDCDriver.clj:27-59; consumer JdbcClient.java:39-58).
`api.py` is the faithful engine-level analog (R9/R10); this module
wraps it in the PYTHON standard database interface so third-party
Python code — ORMs, notebook `%sql` magics, ETL glue — can drive the
engine without knowing anything engine-specific:

    import mysql_cdc_spark.dbapi as db
    conn = db.connect("jdbc:mysql-cdc:/root/testdata/sf0.001")
    cur = conn.cursor()
    cur.execute('select * from "foo"."auto" where _delta_type = ?',
                ("insert",))
    rows = cur.fetchmany(100)

Contract notes:

- `paramstyle` is qmark; parameters are bound by literal substitution
  (the engine is read-only, so there is no injection-into-write risk,
  and the reference grammar has no server-side binding to defer to).
- Statements in the reference grammar (R1/R2: `select <cols> from
  "db"."table" [where _delta_type = '...']`) run over the change
  stream exactly like CDCStatement.execute_query.  Anything richer
  falls through to full Spark SQL over the registered `changes` /
  `rows_dt` views — the rebuilt engine's superset surface.
- Every write verb raises NotSupportedError, mirroring the reference's
  read-only wall (jdbc.clj:368-371, :482, :613 — SURVEY §2.5).
- `Cursor.executestream()` is the non-standard continuous extension
  (PEP 249 allows extensions): the same blocking-cursor semantics the
  reference's executeQuery has (jdbc.clj:213-218), surfaced as
  fetchone(timeout=...) returning None on timeout.
"""

from __future__ import annotations

import math
import re
from typing import Any, Iterable, Iterator, Sequence

apilevel = "2.0"
threadsafety = 1            # threads may share the module, not connections
paramstyle = "qmark"


# ---------------------------------------------------------------------------
# PEP 249 exception hierarchy
# ---------------------------------------------------------------------------


class Warning(Exception):  # noqa: A001 — name mandated by PEP 249
    pass


class Error(Exception):
    pass


class InterfaceError(Error):
    pass


class DatabaseError(Error):
    pass


class DataError(DatabaseError):
    pass


class OperationalError(DatabaseError):
    pass


class IntegrityError(DatabaseError):
    pass


class InternalError(DatabaseError):
    pass


class ProgrammingError(DatabaseError):
    pass


class NotSupportedError(DatabaseError):
    pass


# ---------------------------------------------------------------------------
# type objects (PEP 249 "Type Objects and Constructors")
# ---------------------------------------------------------------------------


class _TypeObject:
    def __init__(self, name: str, *spark_types: str) -> None:
        self._name = name
        self._types = frozenset(spark_types)

    def __eq__(self, other: object) -> bool:
        return other in self._types or other is self

    def __hash__(self) -> int:
        return hash(self._name)

    def __repr__(self) -> str:
        return f"<DBAPI type {self._name}>"


STRING = _TypeObject("STRING", "string", "varchar", "char")
BINARY = _TypeObject("BINARY", "binary")
NUMBER = _TypeObject(
    "NUMBER", "tinyint", "smallint", "int", "bigint", "float", "double",
    "decimal", "boolean",
)
DATETIME = _TypeObject("DATETIME", "timestamp", "timestamp_ntz", "date")
ROWID = _TypeObject("ROWID")


def _type_code(simple: str) -> _TypeObject:
    base = simple.split("(")[0]
    for t in (STRING, BINARY, NUMBER, DATETIME):
        if base == t or t == base:
            return t
    return STRING


# ---------------------------------------------------------------------------
# parameter binding (qmark -> SQL literal)
# ---------------------------------------------------------------------------


def _literal(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # repr(inf) / repr(nan) is not valid SQL; Spark spells these
        # as cast string literals (r14 ADVICE).
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            sign = "" if v > 0 else "-"
            return f"CAST('{sign}Infinity' AS DOUBLE)"
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, bytes):
        return "X'" + v.hex() + "'"
    # Spark's default parser treats backslash as an escape inside
    # string literals (escapedStringLiterals=false), so a trailing
    # '\' would escape our closing quote — double it first (r14
    # ADVICE), then double single quotes.
    return "'" + str(v).replace("\\", "\\\\").replace("'", "''") + "'"


def _split_placeholders(operation: str) -> list[str]:
    """Split on '?' placeholders OUTSIDE quoted literals and comments.

    A '?' inside a single-/double-/backtick-quoted region (``'%?%'``)
    or inside a ``--``/``/* */`` comment is statement text, not a
    placeholder (r14 ADVICE: naive str.split miscounted and could
    substitute a parameter into the middle of a string literal).
    Handles both doubled-quote ('') and backslash escapes, matching
    Spark's default lexer.
    """
    parts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(operation)
    while i < n:
        c = operation[i]
        if c == "?":
            parts.append("".join(buf))
            buf = []
            i += 1
        elif c in "'\"`":
            q = c
            buf.append(c)
            i += 1
            while i < n:
                ch = operation[i]
                if ch == "\\" and q != "`" and i + 1 < n:
                    buf.append(ch)
                    buf.append(operation[i + 1])
                    i += 2
                    continue
                buf.append(ch)
                i += 1
                if ch == q:
                    if i < n and operation[i] == q:  # '' / "" / `` escape
                        buf.append(q)
                        i += 1
                        continue
                    break
        elif operation.startswith("--", i):
            j = operation.find("\n", i)
            j = n if j < 0 else j + 1
            buf.append(operation[i:j])
            i = j
        elif operation.startswith("/*", i):
            j = operation.find("*/", i + 2)
            j = n if j < 0 else j + 2
            buf.append(operation[i:j])
            i = j
        else:
            buf.append(c)
            i += 1
    parts.append("".join(buf))
    return parts


def _bind(operation: str, parameters: Sequence[Any] | None) -> str:
    if not parameters:
        return operation
    parts = _split_placeholders(operation)
    if len(parts) - 1 != len(parameters):
        raise ProgrammingError(
            f"statement has {len(parts) - 1} placeholders, "
            f"{len(parameters)} parameters given"
        )
    out = [parts[0]]
    for p, tail in zip(parameters, parts[1:]):
        out.append(_literal(p))
        out.append(tail)
    return "".join(out)


_WRITE_VERB_SET = frozenset(
    "insert update delete merge replace create alter drop truncate "
    "grant revoke set call".split()
)


def _strip_leading_trivia(sql: str) -> str:
    """Drop leading whitespace and ``--`` / ``/* */`` comments."""
    i, n = 0, len(sql)
    while i < n:
        if sql[i].isspace():
            i += 1
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
        elif sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            if j < 0:
                return ""  # unterminated comment: nothing executable follows
            i = j + 2
        else:
            break
    return sql[i:]


def _leading_verb(sql: str) -> str:
    """The statement's effective top-level verb, lowercased.

    Skips leading comments and, when the statement opens with a WITH
    clause, scans past the CTE definitions (quote- and paren-aware) to
    the statement body — so ``/*x*/ INSERT ...`` and ``WITH c AS (...)
    INSERT INTO ...`` are both classified as ``insert`` (r14 ADVICE:
    the prefix regex let those through the read-only wall).  A CTE
    whose NAME is itself a write verb is conservatively classified as
    that verb — over-rejecting is safe on a read-only engine.
    """
    s = _strip_leading_trivia(sql)
    m = re.match(r"(?is)with\b", s)
    if not m:
        m2 = re.match(r"[A-Za-z_]+", s)
        return m2.group(0).lower() if m2 else ""
    body_verbs = _WRITE_VERB_SET | {"select", "table", "values", "from"}
    i, depth, n = m.end(), 0, len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            q = c
            i += 1
            while i < n:
                ch = s[i]
                if ch == "\\" and q != "`" and i + 1 < n:
                    i += 2
                    continue
                i += 1
                if ch == q:
                    if i < n and s[i] == q:
                        i += 1
                        continue
                    break
        elif s.startswith("--", i):
            j = s.find("\n", i)
            i = n if j < 0 else j + 1
        elif s.startswith("/*", i):
            j = s.find("*/", i + 2)
            i = n if j < 0 else j + 2
        elif c == "(":
            depth += 1
            i += 1
        elif c == ")":
            depth -= 1
            i += 1
        elif depth == 0 and (c.isalpha() or c == "_"):
            j = i
            while j < n and (s[j].isalnum() or s[j] == "_"):
                j += 1
            word = s[i:j].lower()
            if word in body_verbs:
                return word
            i = j
        else:
            i += 1
    return ""


def _reject_writes(sql: str) -> None:
    if _leading_verb(sql) in _WRITE_VERB_SET:
        # the reference's read-only wall (jdbc.clj:368-371)
        raise NotSupportedError(
            "read-only engine: write statements are unsupported "
            "(reference jdbc.clj:368-371)"
        )


# ---------------------------------------------------------------------------
# cursor
# ---------------------------------------------------------------------------


class Cursor:
    arraysize = 1

    def __init__(self, conn: "Connection") -> None:
        self._conn = conn
        self._closed = False
        self._result = None          # ForwardOnlyCursor | None
        self._stream = None          # (QueueStreamingCursor, handle) | None
        self.description: list[tuple] | None = None
        self.rowcount = -1
        self._fetched = 0

    # -- helpers -------------------------------------------------------

    def _check(self) -> None:
        if self._closed:
            raise InterfaceError("cursor is closed")
        if self._conn._closed:
            raise InterfaceError("connection is closed")

    def _set_description(self, schema) -> None:
        self.description = [
            (f.name, _type_code(f.dataType.simpleString()), None, None,
             None, None, f.nullable)
            for f in schema.fields
        ]

    def _reset(self) -> None:
        if self._stream is not None:
            _cursor, handle = self._stream
            try:
                handle.stop()
            except Exception:  # noqa: BLE001 — already-dead stream
                pass
            self._stream = None
        self._result = None
        self.description = None
        self.rowcount = -1
        self._fetched = 0

    # -- PEP 249 core ----------------------------------------------------

    def execute(self, operation: str, parameters: Sequence[Any] | None = None) -> "Cursor":
        self._check()
        self._reset()
        sql = _bind(operation, parameters)
        _reject_writes(sql)
        from mysql_cdc_spark.operators import query as q
        from mysql_cdc_spark.operators.cursor import ForwardOnlyCursor
        from mysql_cdc_spark.sources.events_cdc import changes

        try:
            parsed = None
            try:
                parsed = q.parse_statement(sql)
            except ValueError:
                pass
            if parsed is not None:
                env = changes(self._conn._spark, self._conn._source)
                df = q.execute_statement(env, sql)
            else:
                # superset surface: full Spark SQL over registered views
                self._conn._ensure_views()
                df = self._conn._spark.sql(sql)
        except NotSupportedError:
            raise
        except Exception as exc:  # noqa: BLE001 — analysis/parse errors
            raise ProgrammingError(str(exc).split("\n")[0]) from exc
        self._result = ForwardOnlyCursor(df)
        self._set_description(df.schema)
        return self

    def executemany(self, operation: str, seq_of_parameters: Iterable[Sequence]) -> None:
        raise NotSupportedError(
            "read-only engine: executemany targets DML, which is unsupported"
        )

    def fetchone(self, timeout: float | None = None) -> tuple | None:
        self._check()
        if self._stream is not None:
            cursor, _handle = self._stream
            if not cursor.next(timeout=timeout if timeout is not None else 5.0):
                return None
            self._fetched += 1
            return tuple(cursor.current)
        if self._result is None:
            raise InterfaceError("fetchone called before execute")
        if not self._result.next():
            self.rowcount = self._fetched
            return None
        self._fetched += 1
        row = tuple(
            self._result.get(i + 1)
            for i in range(len(self._result.column_names))
        )
        return row

    def fetchmany(self, size: int | None = None) -> list[tuple]:
        n = self.arraysize if size is None else size
        out = []
        for _ in range(n):
            row = self.fetchone()
            if row is None:
                break
            out.append(row)
        return out

    def fetchall(self) -> list[tuple]:
        out = []
        while True:
            row = self.fetchone()
            if row is None:
                return out
            out.append(row)

    def __iter__(self) -> Iterator[tuple]:
        while True:
            row = self.fetchone()
            if row is None:
                return
            yield row

    def setinputsizes(self, sizes: Sequence) -> None:  # noqa: D102 — PEP no-op
        pass

    def setoutputsize(self, size: int, column: int | None = None) -> None:
        pass

    def close(self) -> None:
        self._reset()
        self._closed = True

    # -- continuous extension -------------------------------------------

    def executestream(
        self, operation: str, parameters: Sequence[Any] | None = None,
        trigger_seconds: float = 0.5,
    ) -> "Cursor":
        """Open the statement as a CONTINUOUS query (the reference's
        defining executeQuery behavior, jdbc.clj:213-218): fetchone()
        blocks up to its timeout for the log to grow and returns None
        on timeout, never "end of results".  close() (or a following
        execute) stops the stream."""
        self._check()
        self._reset()
        sql = _bind(operation, parameters)
        _reject_writes(sql)
        stmt = self._conn._statement()
        try:
            cursor, handle = stmt.execute_query_stream(
                sql, trigger_seconds=trigger_seconds
            )
        except ValueError as exc:
            raise ProgrammingError(str(exc)) from exc
        self._stream = (cursor, handle)
        schema = getattr(cursor, "schema", None)
        if schema is not None:
            self._set_description(schema)
        return self


# ---------------------------------------------------------------------------
# connection
# ---------------------------------------------------------------------------


class Connection:
    def __init__(self, spark, source: str) -> None:
        from mysql_cdc_spark import api

        self._spark = spark
        self._source = source
        url = source if source.startswith("jdbc:") else f"jdbc:mysql-cdc:{source}"
        try:
            self._inner = api.connect(url, spark)
        except (ValueError, RuntimeError) as exc:
            raise InterfaceError(str(exc)) from exc
        self._source = self._inner.source
        self._closed = False
        self._views_registered = False
        self._cursors: list[Cursor] = []

    # -- internals -------------------------------------------------------

    def _statement(self):
        stmt = self._inner._statement
        if stmt is None or stmt.closed:
            stmt = self._inner.create_statement()
        return stmt

    def _ensure_views(self) -> None:
        if not self._views_registered:
            self._inner.register_views()
            self._views_registered = True

    # -- PEP 249 ---------------------------------------------------------

    def cursor(self) -> Cursor:
        if self._closed:
            raise InterfaceError("connection is closed")
        cur = Cursor(self)
        self._cursors.append(cur)
        return cur

    def commit(self) -> None:
        # No transactional state to commit on a read-only stream; PEP
        # 249 requires the method and allows it to be a no-op.
        if self._closed:
            raise InterfaceError("connection is closed")

    def rollback(self) -> None:
        raise NotSupportedError(
            "read-only engine: no transactions to roll back (jdbc.clj:613)"
        )

    def close(self) -> None:
        for cur in self._cursors:
            if not cur._closed:
                cur.close()
        self._inner.close()
        self._closed = True

    def __enter__(self) -> "Connection":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def connect(source: str, spark=None) -> Connection:
    """DB-API module-level constructor.  `source` is a fixture/source
    directory or the full `jdbc:mysql-cdc:<dir>` URL; `spark` defaults
    to the tuned engine session."""
    if spark is None:
        from mysql_cdc_spark.session import get_spark

        spark = get_spark("mysql-cdc-dbapi")
    return Connection(spark, source)
