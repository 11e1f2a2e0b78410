"""Structured Streaming source over a TxTable CHANGE FEED.

`spark.readStream.format("txtable_changes").option("path", tbl)` turns
the write-time change images (`sources/txtable.py`, merge/delete with
``change_feed=True``) into a stream: each committed version is one
micro-batch increment, rows carry `_change_type` and
`_commit_version`, and the checkpoint holds a single monotone cursor —
the last version consumed. This is the streaming half of the Delta CDF
recipe: downstream incremental consumers (derived-table sync, the
incremental-dedup index append) subscribe to table commits instead of
re-diffing snapshots.

Reference parity: the reference's continuous behaviors are directory
tails (audit monitor loops); a transactional table feed has no
counterpart there — it exists because the 100 TB pipeline this engine
targets is continuously ingested.

Offsets are `{"version": N}` (JSON-serializable, monotone). The driver
resolves versions -> change-file lists from the manifests; executors
read the parquet change files via pyarrow and yield RecordBatches —
the `_change_type` / `_commit_version` columns are appended
arrow-side, so no row ever passes through per-row Python (the
`sources/arrowipc.py` standard). Partitioning is one partition per
change FILE, so a version staged as many files fans out across the
cluster instead of serializing on one task.

Admission control: ``maxversionspertrigger`` bounds how many table
versions one micro-batch may plan (the Delta `maxFilesPerTrigger`
analog) — without it, a stream started against a long-history table
plans every version into a single unbounded batch. The bound rides an
in-reader cursor seeded by `initialOffset` on a fresh start; after a
RESTART, Spark 4.x replays the offsets log's last entry through
`partitions(start, end)` AND calls `commit(end)` BEFORE the first
`latestOffset` (verified empirically for both committed and
uncommitted final batches — scripts/probe_restart_calls.py; pinned
end-to-end by tests/test_txchanges_stream.py's
test_restart_keeps_admission_bound_engaged), and both hooks seed the
cursor — so the admission bound holds across restarts.

``cursorfile`` (optional — a driver-local path, a ``file:`` URI, or a
remote-filesystem URI the sinks derive from their checkpoint location)
adds a durable third belt for the hypothetical
flow where a future Spark calls `latestOffset` first: the reader
persists every PLANNED version to the file BEFORE returning it from
`latestOffset`, so the file is always >= any offset Spark has logged
(write-ahead order) and a cursor-less `latestOffset` can load it and
stay capped at `planned + maxversionspertrigger` without ever
planning an end behind the checkpoint. Without a cursorfile the
cursor-less branch remains the unbounded fallback (capping blind
could plan an end BEHIND the checkpoint and re-deliver rows;
exactly-once wins over one oversized catch-up batch). Note
`Trigger.AvailableNow` snapshots one target offset up front (Spark
wraps sources lacking native support), so the cap binds per-batch
under processing-time triggers, not availableNow drains.

Cursor storage: a local path (or ``file:`` URI with an empty/localhost
authority) writes via plain open() + atomic os.replace. Any OTHER URI
(hdfs://, s3://, s3a://, ...) goes through ``pyarrow.fs`` — the reader
runs in a driver-side Python worker with no JVM gateway, so Hadoop's
own FileSystem API is unreachable from here; pyarrow is the filesystem
layer that exists in the reader process. Atomicity caveat: object
stores have no atomic rename (the tmp-write + move degrades to
copy+delete), so a racing reader can observe a missing or torn cursor
file — that degrades to the documented cursor-less fallback (one
unbounded catch-up batch), never to planning behind the checkpoint,
because the cursor is advisory admission capping while exactly-once
rides Spark's offsets log. A URI pyarrow cannot service (no driver,
no credentials) disables the belt the same way a missing option does.

Versions committed WITHOUT the change feed fail the stream loudly (a
silent gap would corrupt every downstream consumer) — except v1,
which is its own insert image, and layout-only compactions, which
carry no logical change.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from filesystemagent_spark.sources.txtable import TxTable


class _LocalCursorStore:
    """Cursor belt on the driver-local filesystem: plain open() reads,
    tmp-write + os.replace (atomic on POSIX) publishes."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> int | None:
        try:
            with open(self.path, encoding="utf-8") as fh:
                return int(json.load(fh)["version"])
        except (FileNotFoundError, ValueError, KeyError):
            return None

    def save(self, version: int) -> None:
        parent = os.path.dirname(self.path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        tmp = f"{self.path}.tmp-{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"version": version}, fh)
        os.replace(tmp, self.path)


class _ArrowFsCursorStore:
    """Cursor belt on a checkpoint filesystem pyarrow.fs can reach
    (hdfs://, s3://, gs://, or file:// itself) — the reader process
    has no JVM gateway, so this is the remote-FS layer available to
    it. Publishes via tmp-write + move; on stores without atomic
    rename the move is copy+delete, and the module docstring's
    caveat applies: a torn/missing read degrades to the cursor-less
    fallback, never to planning behind the checkpoint."""

    def __init__(self, uri: str):
        from pyarrow import fs as pafs

        # Hadoop spells S3 access s3a://; pyarrow's S3 driver is s3://
        if uri.startswith("s3a://"):
            uri = "s3://" + uri[len("s3a://"):]
        self.fs, self.path = pafs.FileSystem.from_uri(uri)

    def load(self) -> int | None:
        try:
            with self.fs.open_input_stream(self.path) as fh:
                return int(json.loads(fh.read().decode("utf-8"))["version"])
        except (OSError, ValueError, KeyError):
            return None

    def save(self, version: int) -> None:
        parent = self.path.rsplit("/", 1)[0] if "/" in self.path else ""
        if parent:
            self.fs.create_dir(parent, recursive=True)
        tmp = f"{self.path}.tmp-{os.getpid()}"
        with self.fs.open_output_stream(tmp) as fh:
            fh.write(json.dumps({"version": version}).encode("utf-8"))
        self.fs.move(tmp, self.path)


def _make_cursor_store(location: str | None):
    """Resolve a cursorfile option to a store, or None (belt off).
    Local paths and local-authority file: URIs take the atomic local
    store; any other URI tries pyarrow.fs, and a URI pyarrow cannot
    service (unknown scheme, missing driver/credentials) disables the
    belt — the same degraded-but-safe behavior as omitting the
    option. A file: URI with a REMOTE authority (file://otherhost/p)
    is not driver-local and must not be misread as the local path
    /p — it falls to the pyarrow branch."""
    if not location:
        return None
    from urllib.parse import urlparse

    parsed = urlparse(location)
    if parsed.scheme in ("", "file") and parsed.netloc in ("", "localhost"):
        return _LocalCursorStore(parsed.path or location)
    try:
        return _ArrowFsCursorStore(location)
    except Exception:
        return None


@dataclass
class _ChangeFilePartition(InputPartition):
    file: str = ""
    change_type: str = ""
    version: int = 0
    # pa.Schema of the FULL output (data fields + _change_type +
    # _commit_version); pyarrow schemas pickle, so it ships whole.
    arrow_schema: object = None
    out_fields: list = field(default_factory=list)


class TxTableChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "txtable_changes"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("txtable_changes requires a path option")
        t = TxTable(path)
        v = t.latest_version()
        if v == 0:
            raise ValueError(f"table {path} has no committed snapshot")
        ddl = t._read_manifest(v)["schema_ddl"]
        return f"{ddl}, _change_type string, _commit_version bigint"

    def streamReader(self, schema: StructType) -> "TxTableChangesStreamReader":
        return TxTableChangesStreamReader(self.options, schema)


class TxTableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema: StructType):
        from pyspark.sql.pandas.types import to_arrow_schema

        self.table = TxTable(options["path"])
        # start AFTER this version (0 = from the beginning incl. init)
        self.start_after = int(options.get("fromversion", 0))
        mv = options.get("maxversionspertrigger")
        self.max_versions = int(mv) if mv is not None else None
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError("maxversionspertrigger must be >= 1")
        self.out_fields = [f.name for f in schema.fields[:-2]]
        self.arrow_schema = to_arrow_schema(schema)
        # Last version this reader has PLANNED (returned from
        # latestOffset or seen as a batch end). None after a restart,
        # until Spark reveals the checkpointed position via
        # partitions(start, end) / commit(end) — or, third belt, the
        # durable cursorfile.
        self._cursor: int | None = None
        self._cursor_store = _make_cursor_store(options.get("cursorfile"))

    def _load_cursor(self) -> int | None:
        if self._cursor_store is None:
            return None
        return self._cursor_store.load()

    def _seed_cursor(self, v: int) -> None:
        self._cursor = max(self._cursor or 0, int(v))

    def _save_cursor(self) -> None:
        """Durably record the planned cursor — called BEFORE the offset
        leaves latestOffset, so the file is always >= anything Spark
        has logged (a crash between the write and the log replays
        versions, never skips them)."""
        if self._cursor_store is None or self._cursor is None:
            return
        stored = self._load_cursor()
        if stored is not None and stored >= self._cursor:
            return
        self._cursor_store.save(self._cursor)

    def initialOffset(self):
        self._cursor = self.start_after
        self._save_cursor()
        return {"version": self.start_after}

    def latestOffset(self):
        head = self.table.latest_version()
        if self._cursor is None:
            stored = self._load_cursor()
            if stored is not None:
                self._cursor = stored
        if self.max_versions is None or self._cursor is None:
            end = head
        else:
            end = min(head, self._cursor + self.max_versions)
        if self._cursor is not None:
            end = max(end, self._cursor)
        self._cursor = end
        self._save_cursor()
        return {"version": end}

    def commit(self, end):
        # Spark 4.x calls commit(checkpointed end) on restart before
        # the first latestOffset — a second cursor-seeding hook
        self._seed_cursor(end["version"])
        self._save_cursor()

    def partitions(self, start, end):
        end_v = int(end["version"])
        self._seed_cursor(end_v)
        self._save_cursor()
        parts = []
        for v in range(int(start["version"]) + 1, end_v + 1):
            # one resolution policy for batch + stream (raises on a
            # non-CDF version): TxTable.changes_for_version
            chparts = self.table.changes_for_version(v)
            if chparts is None:
                continue
            for ch in chparts:
                for f in ch["files"]:
                    parts.append(
                        _ChangeFilePartition(
                            file=f,
                            change_type=ch["type"],
                            version=v,
                            arrow_schema=self.arrow_schema,
                            out_fields=self.out_fields,
                        )
                    )
        return parts or [_ChangeFilePartition()]

    def read(self, partition: _ChangeFilePartition):
        if not partition.file:
            return
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = partition.arrow_schema
        pf = pq.ParquetFile(partition.file)
        for batch in pf.iter_batches():
            n = batch.num_rows
            arrays = []
            for name in partition.out_fields:
                target = schema.field(name).type
                if name in batch.schema.names:
                    col = batch.column(name)
                    if col.type != target:
                        col = col.cast(target)
                else:
                    # schema evolution: column added after this image
                    col = pa.nulls(n, target)
                arrays.append(col)
            arrays.append(pa.array([partition.change_type] * n, pa.string()))
            arrays.append(pa.array(np.full(n, partition.version, np.int64)))
            yield pa.RecordBatch.from_arrays(arrays, schema=schema)

def register_txtable_changes(spark) -> None:
    spark.dataSource.register(TxTableChangesDataSource)
