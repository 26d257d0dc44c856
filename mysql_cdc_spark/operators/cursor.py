"""R9: the forward-only cursor — the reference's JDBC ResultSet
contract (deftype ResultSet, src/cdc/jdbc.clj:205-331) over a batch
DataFrame.  (The streaming flavor, with blocking poll, is
streaming/runtime.py:StreamingCursor.)

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

from typing import Any

from pyspark.sql import DataFrame


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
