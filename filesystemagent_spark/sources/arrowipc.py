"""Arrow IPC (Feather v2) as a first-class registered source/sink.

The reference's ETL engine moves tables between CSV/JSON/XML/Parquet/
Excel (/root/reference/src/etl.py:121-145); training pipelines add the
Arrow IPC file format — the zero-copy interchange format every Arrow
runtime (pandas, polars, DuckDB, Ray) reads natively. pyarrow ships in
this environment, so unlike the gated codec formats this one is REAL
end to end.

Why a Python DataSource and not mapInPandas plumbing: a registered
format owns schema inference, splits, and writes —
`spark.read.format("arrowipc").load(dir)` composes with every
downstream operator, exactly like the parquet path.

Scale design:
- `partitions()` emits one split per RECORD BATCH (Arrow IPC files are
  random-access: the footer indexes batches, so a split opens the file
  memory-mapped and reads only its batch). A directory of files with B
  total batches scans with B-way parallelism — batch-granular like
  parquet's row-group-granular splits.
- `read()` yields pyarrow RecordBatches directly (the Spark 4 Python
  DataSource arrow path) — no per-row Python, no pandas detour.
- The writer stages per-task files and renames on driver commit —
  same torn-write discipline as ToolLogWriter (pydatasource.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f)) and not f.startswith("_")
        )
    return [path]


@dataclass
class _BatchPartition(InputPartition):
    path: str
    batch_index: int


class ArrowIpcDataSource(DataSource):
    """`spark.read.format("arrowipc").load(path)` /
    `df.write.format("arrowipc").save(dir)`.

    Reads Feather v2 / Arrow IPC *files* (not streams): the file
    layout's footer gives random access per record batch, which is
    what makes batch-granular splits possible."""

    @classmethod
    def name(cls) -> str:
        return "arrowipc"

    def schema(self) -> str:
        import pyarrow.ipc as ipc
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("arrowipc requires a path")
        files = _list_files(path)
        if not files:
            raise ValueError(f"no Arrow IPC files under {path!r}")
        with ipc.open_file(files[0]) as rd:
            return from_arrow_schema(rd.schema)

    def reader(self, schema: StructType) -> "ArrowIpcReader":
        return ArrowIpcReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "ArrowIpcWriter":
        return ArrowIpcWriter(self.options, overwrite)


class ArrowIpcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("arrowipc requires a path")

    def partitions(self):
        import pyarrow.ipc as ipc

        parts = []
        for f in _list_files(self.path):
            with ipc.open_file(f) as rd:
                for i in range(rd.num_record_batches):
                    parts.append(_BatchPartition(f, i))
        return parts

    def read(self, partition: _BatchPartition):
        import pyarrow as pa
        import pyarrow.ipc as ipc

        with pa.memory_map(partition.path) as mm, ipc.open_file(mm) as rd:
            yield rd.get_batch(partition.batch_index)


@dataclass
class _WroteIpc(WriterCommitMessage):
    staged: str
    final: str


class ArrowIpcWriter(DataSourceArrowWriter):
    """One Feather v2 file per task, staged then renamed on commit —
    readers never observe a torn file; abort removes only staging.
    DataSourceArrowWriter: the iterator carries RecordBatches, so the
    write path is Arrow end to end (no per-row Python either way)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("arrowipc requires a path")
        self.overwrite = overwrite
        # Generated once on the driver and serialized into every task:
        # final names are unique per job (parquet's part-<id>-<uuid>
        # discipline), so mode("append") can never os.replace() files
        # left by a previous write with the same partition ids.
        import uuid

        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.ipc as ipc
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f"_staged-{pid:05d}-{attempt}.arrow")
        final = os.path.join(self.path, f"part-{pid:05d}-{self.job_id}.arrow")
        batches = list(iterator)
        if not batches:
            return _WroteIpc(staged="", final="")
        table = pa.Table.from_batches(batches)
        with ipc.new_file(staged, table.schema) as wr:
            wr.write_table(table)
        return _WroteIpc(staged=staged, final=final)

    def commit(self, messages):
        if self.overwrite:
            for f in _list_files(self.path):
                name = os.path.basename(f)
                if name.startswith("part-") and name.endswith(".arrow"):
                    os.remove(f)
        for m in messages:
            if m is not None and m.staged:
                os.replace(m.staged, m.final)

    def abort(self, messages):
        for m in messages:
            if m is not None and m.staged and os.path.exists(m.staged):
                os.remove(m.staged)


def register_arrowipc(spark) -> None:
    """Idempotent format registration on the given session."""
    spark.dataSource.register(ArrowIpcDataSource)
