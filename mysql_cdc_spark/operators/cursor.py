"""R9: the forward-only cursor — the reference's JDBC ResultSet
contract (deftype ResultSet, src/cdc/jdbc.clj:205-331) over a batch
DataFrame.  (The streaming flavor, with blocking poll, is
streaming/runtime.py:QueueStreamingCursor.)

Contract parity:
- cursor starts BEFORE the first row (`(cons nil ...)`, jdbc.clj:183-184);
  `next()` advances and returns whether a row is available (:213-218)
- typed getters accept a 1-based ordinal or a column name — the
  reference names columns by printed ordinals "1", "2", ... and parses
  them back in findColumn (:82, :223-226); we accept both real names
  and ordinals (strictly richer)
- `was_null()` reports whether the last value read was SQL NULL
  (:219, wasNull macros :187-199)
- forward-only/read-only: no rewind, no update (TYPE_FORWARD_ONLY /
  CONCUR_READ_ONLY, :314-315; scrolling methods throw :294-309)
- metadata comes from the DataFrame schema — static and complete,
  unlike the reference's infer-from-first-row (:220-222)

Delivery is `toLocalIterator()`: rows stream to the driver one
partition at a time — the consumer boundary of the engine, not a
distributed operator (the query plan upstream stays fully parallel).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T


class ResultSetMetaData:
    """The reference's ResultSetMetaData surface (jdbc.clj:78-91) over
    a static DataFrame schema: column count, 1-based names, and a
    JDBC-ish type name per column.  The reference infers types from the
    first data row (getColumnType value-switch, :83-88); a schema-first
    engine knows them before any row arrives."""

    _JDBC_NAMES = {
        T.LongType: "BIGINT",
        T.IntegerType: "INTEGER",
        T.ShortType: "SMALLINT",
        T.ByteType: "TINYINT",
        T.DoubleType: "DOUBLE",
        T.FloatType: "REAL",
        T.StringType: "VARCHAR",
        T.BooleanType: "BOOLEAN",
        T.TimestampType: "TIMESTAMP",
        T.DateType: "DATE",
        T.BinaryType: "VARBINARY",
    }

    def __init__(self, schema: T.StructType) -> None:
        self._schema = schema

    @property
    def column_count(self) -> int:
        return len(self._schema.fields)

    def _field(self, i: int) -> T.StructField:
        if not 1 <= i <= len(self._schema.fields):
            raise IndexError(f"column ordinal out of range: {i}")
        return self._schema.fields[i - 1]

    def column_name(self, i: int) -> str:
        return self._field(i).name

    def column_type_name(self, i: int) -> str:
        dt = self._field(i).dataType
        if isinstance(dt, T.DecimalType):
            return f"DECIMAL({dt.precision},{dt.scale})"
        return self._JDBC_NAMES.get(type(dt), dt.simpleString().upper())

    def is_nullable(self, i: int) -> bool:
        return self._field(i).nullable


class ForwardOnlyCursor:
    def __init__(self, df: DataFrame) -> None:
        self._schema = df.schema
        self._names = [f.name for f in df.schema.fields]
        self._it = df.toLocalIterator()
        self._row = None
        self._before_first = True
        self._exhausted = False
        self._was_null = False
        self._closed = False

    # -- metadata (richer than the reference's first-row inference) --

    @property
    def column_names(self) -> list[str]:
        return list(self._names)

    @property
    def column_types(self) -> list[str]:
        return [f.dataType.simpleString() for f in self._schema.fields]

    def get_metadata(self) -> ResultSetMetaData:
        return ResultSetMetaData(self._schema)

    def find_column(self, label: str | int) -> int:
        """1-based ordinal for a name or a printed ordinal (reference
        findColumn parses "1", "2", ... back to indices, :223-226)."""
        if isinstance(label, int):
            if not 1 <= label <= len(self._names):
                raise IndexError(f"column ordinal out of range: {label}")
            return label
        if label in self._names:
            return self._names.index(label) + 1
        if label.isdigit() and 1 <= int(label) <= len(self._names):
            return int(label)
        raise KeyError(f"no such column: {label!r}")

    # -- cursor movement ---------------------------------------------

    def next(self) -> bool:
        """Advance to the next row; False once the stream is drained."""
        if self._closed:
            raise RuntimeError("cursor is closed")
        try:
            self._row = next(self._it)
            self._before_first = False
            return True
        except StopIteration:
            self._row = None
            self._exhausted = True
            return False

    # -- getters ------------------------------------------------------

    def _value(self, label: str | int) -> Any:
        if self._closed:
            raise RuntimeError("cursor is closed")
        if self._before_first or self._row is None:
            raise RuntimeError("cursor is not positioned on a row")
        v = self._row[self.find_column(label) - 1]
        self._was_null = v is None
        return v

    def get(self, label: str | int) -> Any:
        return self._value(label)

    def get_long(self, label: str | int) -> int:
        v = self._value(label)
        return 0 if v is None else int(v)          # JDBC null → 0 + wasNull

    def get_double(self, label: str | int) -> float:
        v = self._value(label)
        return 0.0 if v is None else float(v)

    def get_string(self, label: str | int) -> str | None:
        v = self._value(label)
        return None if v is None else str(v)

    def get_boolean(self, label: str | int) -> bool:
        v = self._value(label)
        return False if v is None else bool(v)     # JDBC null → false + wasNull

    def get_decimal(self, label: str | int) -> _decimal.Decimal | None:
        """Exact decimal (reference getBigDecimal converts its packed
        Decimal via BigDecimal, jdbc.clj:244-245)."""
        v = self._value(label)
        if v is None:
            return None
        if isinstance(v, _decimal.Decimal):
            return v
        # going through str keeps DOUBLE values at their printed form
        # rather than the binary expansion, matching BigDecimal.(str x)
        return _decimal.Decimal(str(v))

    def get_timestamp(self, label: str | int) -> _dt.datetime | None:
        """Timestamp getter (reference getTimestamp, jdbc.clj:228-291
        getter block).  Accepts native datetimes, epoch seconds, or
        ISO strings."""
        v = self._value(label)
        if v is None:
            return None
        if isinstance(v, _dt.datetime):
            return v
        if isinstance(v, _dt.date):
            return _dt.datetime(v.year, v.month, v.day)
        if isinstance(v, (int, float)):
            return _dt.datetime.fromtimestamp(v, tz=_dt.timezone.utc).replace(tzinfo=None)
        return _dt.datetime.fromisoformat(str(v))

    def get_bytes(self, label: str | int) -> bytes | None:
        v = self._value(label)
        if v is None:
            return None
        return bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()

    def was_null(self) -> bool:
        return self._was_null

    # -- lifecycle ----------------------------------------------------

    def close(self) -> None:
        self._closed = True
        self._it = iter(())

    def __iter__(self):
        while self.next():
            yield self._row

    def __enter__(self) -> "ForwardOnlyCursor":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
