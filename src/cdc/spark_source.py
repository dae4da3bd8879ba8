"""``cdctable`` — a Spark 4 Python DataSource over the snapshot store.

Batch::

    spark.dataSource.register(CdcTableDataSource)
    df = spark.read.format("cdctable").option("root", root).load()

Streaming (the table AS a source — downstream jobs tail the table itself
instead of the binlog)::

    spark.readStream.format("cdctable").option("root", root).load()

Design (scale notes):

- Offsets ARE snapshot ids. ``latestOffset`` reads one pointer file;
  ``partitions(start, end)`` walks the parent-link chain end→start in the
  DRIVER (metadata only) and emits one ``InputPartition`` per data file
  ADDED by each commit in the range. All row reading happens on the
  EXECUTORS (pyarrow, Arrow-batch yield — never row-at-a-time Python).
- Each microbatch emits exactly the rows each commit wrote with
  ``_lsn > parent.lsn_high`` — for a CoW commit that filter projects the
  batch's winner rows (incl. tombstones) out of the rewritten partitions;
  for a MOR delta commit the added files ARE the winners. Tombstones are
  EMITTED (``_deleted = true``): this is a change feed, deletes are data.
  Compaction/repartition commits add files but no new lsns — they
  correctly emit nothing.
- Batch reads serve the CURRENT (or ``snapshot_id``) manifest one file
  per partition. A snapshot carrying MOR delta layers refuses: the
  read-side reconcile needs a key shuffle a per-file source cannot
  express — compact first, or use ``CdcTable.read``.
- Exactly-once downstream: Spark checkpoints the snapshot-id offsets;
  replaying a range re-reads immutable files (``expire_snapshots``
  bounds how far back a lagging stream may resume — resuming past the
  retained history fails loudly rather than silently skipping commits).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)

_SYS_SUFFIX = "_commit_snapshot long"


def _arrow_schema(ddl: str):
    """Arrow schema for a flat Spark DDL string — parsed WITHOUT a
    SparkContext (DataSource readers run in session-less Python workers).
    Types are the exact arrow forms Spark's batch conversion expects
    (timestamps: us, UTC). Flat schemas only — this engine's table DDLs
    never nest."""
    import pyarrow as pa

    simple = {
        "string": pa.string(), "bigint": pa.int64(), "long": pa.int64(),
        "int": pa.int32(), "integer": pa.int32(), "smallint": pa.int16(),
        "tinyint": pa.int8(), "double": pa.float64(), "float": pa.float32(),
        "real": pa.float32(), "boolean": pa.bool_(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "date": pa.date32(), "binary": pa.binary(),
    }
    fields, depth, buf = [], 0, []
    for ch in ddl + ",":
        if ch == "," and depth == 0:
            part = "".join(buf).strip()
            buf = []
            if not part:
                continue
            name, _, typ = part.partition(" ")
            typ = typ.strip().lower()
            if typ.startswith("decimal"):
                p, s = typ[typ.index("(") + 1:typ.index(")")].split(",")
                at = pa.decimal128(int(p), int(s))
            else:
                at = simple[typ]
            fields.append(pa.field(name, at, nullable=True))
        else:
            depth += ch in "(<"
            depth -= ch in ")>"
            buf.append(ch)
    return pa.schema(fields)


def _aligned_batches(path: str, target, lsn_floor: int | None,
                     include_deleted: bool, commit_id: int) -> Iterator:
    """Read one immutable data file, filter, pad/cast to the TARGET arrow
    schema (schema evolution: files written under older DDLs gain NULL
    columns), stamp the commit id, yield Arrow record batches."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    if lsn_floor is not None:
        t = t.filter(pc.greater(t["_lsn"], pa.scalar(lsn_floor,
                                                     type=pa.int64())))
    if not include_deleted and "_deleted" in t.column_names:
        t = t.filter(pc.invert(pc.coalesce(t["_deleted"],
                                           pa.scalar(False))))
    cols = []
    for field in target:
        if field.name == "_commit_snapshot":
            cols.append(pa.array([commit_id] * t.num_rows,
                                 type=pa.int64()))
        elif field.name in t.column_names:
            cols.append(t[field.name].cast(field.type))
        else:
            cols.append(pa.nulls(t.num_rows, type=field.type))
    yield from pa.table(cols, schema=target).to_batches()


class CdcTableDataSource(DataSource):
    """See module docstring. Options: ``root`` (required),
    ``snapshot_id`` (batch time travel), ``include_deleted``,
    ``start`` = 'earliest' (default) | 'latest' (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "cdctable"

    def _root(self) -> str:
        root = self.options.get("root")
        if not root:
            raise ValueError("cdctable requires .option('root', <table dir>)")
        return root

    def schema(self) -> str:
        from cdc.meta import store

        sid = self.options.get("snapshot_id")
        snap = (store.read_snapshot(self._root(), int(sid)) if sid
                else store.read_current(self._root()))
        if snap is None:
            raise ValueError(f"no snapshot at {self._root()}")
        return f"{snap['schema_ddl']}, {_SYS_SUFFIX}"

    def reader(self, schema) -> "CdcBatchReader":
        return CdcBatchReader(self._root(), self.options)

    def streamReader(self, schema) -> "CdcStreamReader":
        return CdcStreamReader(self._root(), self.options)


class CdcBatchReader(DataSourceReader):
    def __init__(self, root: str, options):
        from cdc.meta import store

        sid = options.get("snapshot_id")
        self._snap = (store.read_snapshot(root, int(sid)) if sid
                      else store.read_current(root))
        self._root = root
        self._include_deleted = str(
            options.get("include_deleted", "false")).lower() == "true"
        self._target = _arrow_schema(
            f"{self._snap['schema_ddl']}, {_SYS_SUFFIX}")

    def partitions(self):
        import os

        if any(f.get("kind") == "delta" for f in self._snap["files"]):
            raise ValueError(
                "snapshot has MOR delta layers — the per-file cdctable "
                "batch source cannot reconcile them (needs a key shuffle); "
                "compact first or read via CdcTable.read")
        sid = self._snap["snapshot_id"]
        return [InputPartition((os.path.join(self._root, f["path"]), sid))
                for f in self._snap["files"]]

    def read(self, partition):
        path, sid = partition.value
        yield from _aligned_batches(path, self._target, None,
                                    self._include_deleted, sid)


class CdcStreamReader(DataSourceStreamReader):
    """Streaming tail of the table's commits; offset = snapshot id."""

    def __init__(self, root: str, options):
        self._root = root
        self._start = str(options.get("start", "earliest")).lower()
        snap = self._current()
        if snap is None:
            raise ValueError(f"no snapshot at {root} — stream after the "
                             f"first commit")
        self._target = _arrow_schema(
            f"{snap['schema_ddl']}, {_SYS_SUFFIX}")

    def _current(self):
        from cdc.meta import store
        return store.read_current(self._root)

    def initialOffset(self) -> dict:
        if self._start == "latest":
            snap = self._current()
            return {"snapshot_id": snap["snapshot_id"] if snap else 0}
        return {"snapshot_id": 0}

    def latestOffset(self) -> dict:
        snap = self._current()
        return {"snapshot_id": snap["snapshot_id"] if snap else 0}

    def partitions(self, start: dict, end: dict):
        import os

        from cdc.meta import store

        lo, hi = int(start["snapshot_id"]), int(end["snapshot_id"])
        # walk the parent chain end→start on the DRIVER (metadata only);
        # each commit's lsn floor is its parent's high-water mark — for
        # consecutive chain members that parent is the next snapshot in
        # the walk, so only the boundary (lo itself) needs an extra read
        chain = []
        sid = hi
        while sid > lo and sid > 0:
            try:
                chain.append(store.read_snapshot(self._root, sid))
            except Exception as e:
                raise ValueError(
                    f"snapshot {sid} of {self._root} is gone (history "
                    f"expired past this stream's offset) — restart the "
                    f"stream from a fresh checkpoint") from e
            sid = chain[-1]["parent_id"]
        out = []
        for i, snap in enumerate(chain):
            parent = snap["parent_id"]
            if i + 1 < len(chain):
                floor = chain[i + 1]["lsn_high"]
            elif parent == 0:
                floor = -1
            else:
                floor = store.read_snapshot(self._root, parent)["lsn_high"]
            added = snap.get("added_paths")
            if added is None:
                added = [f["path"] for f in snap["files"]
                         if f.get("origin") == "added"]
            out.extend(
                InputPartition((os.path.join(self._root, p), floor,
                                snap["snapshot_id"]))
                for p in added)
        return out

    def read(self, partition):
        path, floor, sid = partition.value
        # include_deleted=True: tombstones ARE the delete events
        yield from _aligned_batches(path, self._target, floor, True, sid)

    def commit(self, end: dict) -> None:
        pass
