"""Push-based low-latency CDC delivery: inotify wake → tailer thread →
bounded in-process queue → blocking cursor.

This is the true counterpart of the reference's hot path, re-expressed
without JNotify/JDBC:

- the reference wakes its reader on filesystem notification
  (mysql_binlog.clj:833-857, JNotify FILE_MODIFIED) instead of
  polling; here `INotifyWatcher` wraps the public Linux inotify
  syscall API via ctypes (inotify_init1 / inotify_add_watch / read),
  with a short-poll fallback where inotify is unavailable;
- the reference hands decoded events to consumers through a BOUNDED
  LinkedBlockingQueue(10) (jdbc.clj:44) — producer blocks when the
  consumer lags (backpressure), consumer blocks when drained
  (`queue.take`, jdbc.clj:174).  `PushDelivery` reproduces exactly
  that with `queue.Queue(maxsize=10)` of event batches;
- `PushCursor` is the forward-only blocking ResultSet over that queue
  (jdbc.clj:205-331): `next()` advances or blocks, rows arrive in log
  order, driver memory is bounded by queue_size × batch size.

Division of labor with streaming/runtime.py: the Structured-Streaming
path (parquet event-log → file-stream source → sinks) is the DURABLE,
replayable, cluster-scale path with checkpointing — but it pays the
micro-batch scheduling floor (~0.2 s/turn measured).  This module is
the LOW-LATENCY in-process path (ms/turn): same tailer, same codec,
no Spark job per turn.  Run both off one log for durability + latency.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import queue
import select
import threading
import time
from collections.abc import Iterator

from mysql_cdc_spark.sources.binlog_source import envelope_records
from mysql_cdc_spark.streaming.binlog_tailer import BinlogTailer

# Public Linux inotify constants (linux/inotify.h).
IN_MODIFY = 0x00000002
IN_CLOSE_WRITE = 0x00000008
IN_MOVED_TO = 0x00000080
IN_CREATE = 0x00000100
_IN_MASK = IN_MODIFY | IN_CLOSE_WRITE | IN_MOVED_TO | IN_CREATE
_IN_NONBLOCK = 0o4000  # O_NONBLOCK


class INotifyWatcher:
    """Minimal inotify wrapper: watch one directory, block in
    `wait(timeout)` until anything in it changes.  `available()` is
    False off-Linux or when the syscalls are missing — callers fall
    back to polling."""

    def __init__(self, path: str) -> None:
        libc_name = ctypes.util.find_library("c") or "libc.so.6"
        self._libc = ctypes.CDLL(libc_name, use_errno=True)
        self.fd = self._libc.inotify_init1(_IN_NONBLOCK)
        if self.fd < 0:
            raise OSError(ctypes.get_errno(), "inotify_init1 failed")
        wd = self._libc.inotify_add_watch(
            self.fd, os.fsencode(path), ctypes.c_uint32(_IN_MASK)
        )
        if wd < 0:
            err = ctypes.get_errno()
            os.close(self.fd)
            raise OSError(err, f"inotify_add_watch({path}) failed")

    @staticmethod
    def available() -> bool:
        if not os.path.exists("/proc/sys/fs/inotify"):
            return False
        try:
            libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6")
            return hasattr(libc, "inotify_init1")
        except OSError:
            return False

    def wait(self, timeout: float) -> bool:
        """Block until the watched dir changes or `timeout` elapses;
        returns True if an event arrived.  Drains the fd so a burst of
        appends coalesces into one wake (the reference debounces the
        same way — notification only ever means 'go look')."""
        r, _, _ = select.select([self.fd], [], [], timeout)
        if not r:
            return False
        try:
            while True:
                data = os.read(self.fd, 65536)
                if len(data) < 65536:
                    break
        except BlockingIOError:
            pass
        return True

    def close(self) -> None:
        try:
            os.close(self.fd)
        except OSError:
            pass


class PushDelivery:
    """Background tailer thread: inotify-wake → incremental decode →
    envelope batches into a bounded queue (the reference's reader
    thread + LinkedBlockingQueue(10), jdbc.clj:44).

    Durability (`journal_path`): the journal records the position of
    CONSUMED data, not merely tailed data.  Every batch is enqueued
    together with a snapshot of the tailer state (log, offset, checksum
    framing, carried table-map, per-file seq) taken right after that
    batch was decoded; the cursor journals a batch's snapshot at the
    moment it hands out the batch's LAST record.  A restart therefore
    resumes exactly after the last fully-consumed batch: batches that
    were queued (or dropped at shutdown) but never consumed are
    re-read and re-delivered — at-least-once with NO silent loss, and
    exactly-once (no duplicates) on a clean drain-then-stop.  A crash
    mid-batch replays that one batch; consumers needing exactly-once
    under crashes dedup by (log_file, offset).  Single-consumer
    contract: one cursor owns the journal advance.  The reference
    keeps its position only in agent memory and loses it on restart
    (mysql_binlog.clj:914-916); this is the push-path analog of the
    streaming path's checkpoint.
    """

    def __init__(
        self,
        log_dir: str,
        first_log: str,
        catalog: dict[tuple[str, str], list[str]] | None = None,
        queue_size: int = 10,
        poll_fallback_seconds: float = 0.05,
        on_error: str = "raise",
        journal_path: str | None = None,
        only_tables: set[tuple[str, str]] | None = None,
    ) -> None:
        self.queue: queue.Queue[list[dict]] = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self._seq: dict[str, int] = {}
        self._poll = poll_fallback_seconds
        self._log_dir = log_dir
        self.error: BaseException | None = None
        self.tailer = BinlogTailer(
            log_dir, first_log, self._deliver, catalog, on_error=on_error,
            only_tables=only_tables,
        )
        self._journal_path = journal_path
        self._restore_journal()
        self._watcher: INotifyWatcher | None = None
        self._thread = threading.Thread(
            target=self._run, name="cdc-push-tailer", daemon=True
        )

    # -- durable position ------------------------------------------------

    def _restore_journal(self) -> None:
        if self._journal_path is None or not os.path.exists(self._journal_path):
            return
        import json

        from mysql_cdc_spark.sources.binlog_codec import TableMapState

        with open(self._journal_path) as fh:
            state = json.load(fh)
        self.tailer.current_log = state["log"]
        self.tailer.offset = int(state["offset"])
        self.tailer.checksum = state.get("checksum")
        self._seq = {k: int(v) for k, v in state.get("seq", {}).items()}
        tm = state.get("table_map")
        if tm is not None:
            # col_meta entries are int | None | 2-tuple; JSON stores
            # tuples as lists, and the field decoder dispatches on
            # isinstance(meta, tuple) — restore the exact shapes.
            self.tailer.table_map = TableMapState(
                int(tm["table_id"]),
                tm["db"],
                tm["table"],
                [int(t) for t in tm["col_types"]],
                [tuple(m) if isinstance(m, list) else m for m in tm["col_meta"]],
                list(tm.get("names", [])),
                [bool(u) for u in tm.get("unsigned", [])],
                list(tm.get("charsets", [])),
            )

    def _snapshot(self) -> dict:
        """Resume state as of the tailer's CURRENT position — captured
        inside `_deliver`, i.e. right after the batch being enqueued
        was decoded, so it is exactly the state to resume from once
        that batch has been consumed."""
        tm = self.tailer.table_map
        return {
            "log": self.tailer.current_log,
            "offset": self.tailer.offset,
            "checksum": self.tailer.checksum,
            "seq": dict(self._seq),
            "table_map": None
            if tm is None
            else {
                "table_id": tm.table_id,
                "db": tm.db,
                "table": tm.table,
                "col_types": list(tm.col_types),
                "col_meta": list(tm.col_meta),
                "names": list(tm.names),
                "unsigned": list(tm.unsigned),
                "charsets": list(tm.charsets),
            },
        }

    def _journal_state(self, state: dict | None) -> None:
        """Atomically persist a consumed-position snapshot (no-op
        without a journal path or when the position hasn't moved)."""
        if self._journal_path is None or state is None:
            return
        pos = (state["log"], state["offset"])
        if pos == getattr(self, "_journaled_pos", None):
            return
        self._journaled_pos = pos
        import json

        tmp = f"{self._journal_path}.tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, self._journal_path)  # atomic: never a torn journal

    def _deliver(self, batch: list[dict]) -> None:
        log_file = batch[0]["log_file"]
        records, self._seq[log_file] = envelope_records(
            batch, log_file, self._seq.get(log_file, 0)
        )
        snap = self._snapshot() if self._journal_path is not None else None
        # Bounded put with a stop check: producer-side backpressure
        # without deadlocking shutdown.  A batch dropped here at
        # shutdown is safe: its snapshot was never journaled, so a
        # restart re-reads and re-delivers it.
        while not self._stop.is_set():
            try:
                self.queue.put((records, snap), timeout=0.1)
                return
            except queue.Full:
                continue

    def _run(self) -> None:
        try:
            if INotifyWatcher.available():
                try:
                    self._watcher = INotifyWatcher(self._log_dir)
                except OSError:
                    self._watcher = None
            self.tailer.turn()  # drain whatever already exists
            while not self._stop.is_set():
                if self._watcher is not None:
                    self._watcher.wait(timeout=self._poll * 4)
                else:
                    time.sleep(self._poll)
                self.tailer.turn()
        except BaseException as exc:  # surface on the consumer side
            self.error = exc
        finally:
            if self._watcher is not None:
                self._watcher.close()

    def start(self) -> "PushDelivery":
        self._thread.start()
        return self

    def stop(self, timeout: float = 5.0) -> None:
        self._stop.set()
        self._thread.join(timeout=timeout)

    def cursor(self) -> "PushCursor":
        return PushCursor(self)


class PushCursor:
    """Forward-only blocking cursor over the push queue — the
    reference ResultSet contract (jdbc.clj:205-331) with bounded
    driver memory: holds at most one batch plus the queue."""

    def __init__(self, delivery: PushDelivery) -> None:
        self._delivery = delivery
        self._batch: list[dict] = []
        self._snap: dict | None = None     # resume state after this batch
        self._pos = -1
        self.current: dict | None = None

    def next(self, timeout: float | None = None) -> bool:
        """Advance to the next envelope record; block until one
        arrives or `timeout` elapses (False on timeout).  Re-raises a
        tailer-thread failure instead of blocking forever.  Handing out
        a batch's LAST record journals that batch's snapshot (consumed
        position) — see PushDelivery's durability contract."""
        if self._pos + 1 >= len(self._batch):
            deadline = None if timeout is None else time.monotonic() + timeout
            while True:
                if self._delivery.error is not None:
                    raise self._delivery.error
                remaining = 0.1
                if deadline is not None:
                    remaining = min(remaining, deadline - time.monotonic())
                    if remaining <= 0:
                        return False
                try:
                    self._batch, self._snap = self._delivery.queue.get(
                        timeout=remaining
                    )
                    self._pos = -1
                    break
                except queue.Empty:
                    continue
        self._pos += 1
        self.current = self._batch[self._pos]
        if self._pos == len(self._batch) - 1:
            self._delivery._journal_state(self._snap)
        return True

    def __iter__(self) -> Iterator[dict]:
        """Iterate over the live stream until the delivery is stopped.

        An idle gap does NOT end iteration: `next()` timeouts are
        retried while the producer thread is alive, so a for-loop never
        mistakes a momentarily-idle live stream for exhaustion.
        Iteration ends only once `PushDelivery.stop()` has been called
        AND the queue is drained (or the tailer thread died, which
        re-raises).  To consume a bounded/already-written log while the
        producer stays running, use `drain(idle_timeout=...)`.
        """
        while True:
            if self.next(timeout=0.25):
                yield self.current
                continue
            if self._delivery._stop.is_set():
                # Grace pass: a producer blocked in its final bounded
                # put (≤0.1 s window) may still land a batch after the
                # stop flag is set — re-check once before ending.
                if self.next(timeout=0.3):
                    yield self.current
                    continue
                if self._delivery.queue.empty():
                    return

    def drain(self, idle_timeout: float = 0.5) -> Iterator[dict]:
        """Yield records until the stream has been idle for
        `idle_timeout` seconds — for drained or bounded logs where the
        producer keeps running and 'no data for a while' means done."""
        while self.next(timeout=idle_timeout):
            yield self.current


# parsed `_delta_type` literal → envelope op name (the push-path analog
# of operators/query.filter_delta_type).  The stream path explodes an
# update into 'update-before'/'update-after' rows; push records carry
# both images in ONE update_rows record, so all three update spellings
# select the same records here.
_DELTA_TO_OP = {
    "insert": "write_rows",
    "update": "update_rows",
    "update-before": "update_rows",
    "update-after": "update_rows",
    "delete": "delete_rows",
}


class FilteredPushCursor(PushCursor):
    """The reference's filtered blocking ResultSet over the push queue:
    only change rows of one (db, table) [and one delta type] surface;
    everything else (other tables, txn bookkeeping) is skipped inline
    (jdbc.clj:176-182 applied record-at-a-time).  `next()` keeps the
    blocking contract — it consumes non-matching records without
    returning, until a match arrives or the timeout elapses."""

    def __init__(
        self,
        delivery: PushDelivery,
        db: str,
        table: str,
        delta_type: str | None = None,
    ) -> None:
        super().__init__(delivery)
        if delta_type is not None and delta_type not in _DELTA_TO_OP:
            raise ValueError(f"unknown _delta_type {delta_type!r}")
        self._db, self._tbl = db, table
        self._ops = (
            {_DELTA_TO_OP[delta_type]} if delta_type else set(_DELTA_TO_OP.values())
        )

    def next(self, timeout: float | None = None) -> bool:
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            remaining = None
            if deadline is not None:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return False
            if not super().next(timeout=remaining):
                return False
            c = self.current
            if (
                c.get("db") == self._db
                and c.get("tbl") == self._tbl
                and c.get("op") in self._ops
            ):
                return True
