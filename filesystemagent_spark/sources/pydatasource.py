"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) for
security-tool text logs.

The reference parses tool output driver-side with ad-hoc Python
(`parse_clamscan_log`, /root/reference/src/audit/result_parser.py:47-80);
sources/normalizers.py already re-expresses that as spark.read.text +
regex. This module covers the remaining engine surface: a REGISTERED
source format (`spark.read.format("toollog")`), so tool logs behave
like any first-class format — schema, options, and per-file splits
owned by the source, composable with every downstream operator.

Scale design: `partitions()` emits one split per input file (tool logs
are line-stateless for the clamscan kind, but per-file splits also
stay correct for stateful formats like ListDLLs where a file must be
parsed start-to-finish). A directory of N logs parses with N-way
parallelism; within a file, parsing is a generator — no whole-file
buffering. The driver never touches file contents, only the listing.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_CLAM_RE = re.compile(r"^(?P<file>.*?): (?P<malware>.*) FOUND$")

# kind -> (DDL schema, line parser -> tuple | None)
_KINDS = {
    "clamscan": (
        "file string, malware string",
        lambda line: (
            (m := _CLAM_RE.match(line.rstrip("\r\n")))
            and (m.group("file"), m.group("malware"))
        ),
    ),
}

_BATCH_LINES = 8192


def _parsed_batches(lines, parse, names: list[str]):
    """Parse lines and yield pyarrow RecordBatches of _BATCH_LINES rows
    (the arrowipc.py / txchanges.py standard: the parse is inherently
    per-line regex, but rows cross the Python-JVM boundary as Arrow
    batches, not one pickled tuple each). All toollog kinds emit
    string columns; a future non-string kind extends the pa.array
    type here alongside its DDL."""
    import pyarrow as pa

    cols: list[list] = [[] for _ in names]

    def flush():
        batch = pa.RecordBatch.from_arrays(
            [pa.array(c, pa.string()) for c in cols], names=list(names)
        )
        for c in cols:
            c.clear()
        return batch

    for line in lines:
        row = parse(line)
        if row:
            for i, v in enumerate(row):
                cols[i].append(v)
            if len(cols[0]) >= _BATCH_LINES:
                yield flush()
    if cols[0]:
        yield flush()


@dataclass
class _FilePartition(InputPartition):
    path: str


class ToolLogDataSource(DataSource):
    """`spark.read.format("toollog").option("kind", "clamscan").load(path)`.

    `path` may be a file or a directory (every regular file inside is
    one split). Unparseable lines are skipped — the permissive-mode
    stance the reference takes per-row (result_parser.py:30-33).
    """

    @classmethod
    def name(cls) -> str:
        return "toollog"

    def schema(self) -> str:
        kind = self.options.get("kind", "clamscan")
        if kind not in _KINDS:
            raise ValueError(f"unknown toollog kind: {kind!r}")
        return _KINDS[kind][0]

    def reader(self, schema: StructType) -> "ToolLogReader":
        return ToolLogReader(self.options)

    def streamReader(self, schema: StructType) -> "ToolLogStreamReader":
        return ToolLogStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "ToolLogWriter":
        return ToolLogWriter(self.options, overwrite)


class ToolLogReader(DataSourceReader):
    def __init__(self, options):
        self.kind = options.get("kind", "clamscan")
        path = options.get("path")
        if not path:
            raise ValueError("toollog requires a path")
        self.path = path

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if os.path.isfile(os.path.join(self.path, f))
            )
        else:
            files = [self.path]
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        ddl, parse = _KINDS[self.kind]
        names = [f.split()[0] for f in ddl.split(",")]
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            yield from _parsed_batches(fh, parse, names)


@dataclass
class _FileRangePartition(InputPartition):
    path: str
    start_line: int
    end_line: int


class ToolLogStreamReader(DataSourceStreamReader):
    """Streaming half of the toollog format — the ST5 continuous-scan
    behavior (/root/reference/src/audit/scanners/hollows_hunter.py:79-80,
    the `/loop` flag) as a first-class Structured Streaming source:
    `spark.readStream.format("toollog")` tails a directory of growing
    tool logs.

    Offsets are `{path: lines_consumed}` maps — JSON-serializable,
    monotone per file (logs append; rotation = a new file). Each
    micro-batch turns the offset delta into per-file line-range
    partitions, so executors do the parsing (this is the partitioned
    `DataSourceStreamReader`, not the driver-side Simple variant) and
    a directory of N active logs streams with N-way parallelism.
    `latestOffset` line-counts changed files only (size heuristic),
    keeping driver work proportional to actual growth."""

    def __init__(self, options):
        self.kind = options.get("kind", "clamscan")
        if self.kind not in _KINDS:
            raise ValueError(f"unknown toollog kind: {self.kind!r}")
        path = options.get("path")
        if not path:
            raise ValueError("toollog requires a path")
        self.path = path
        self._sizes: dict[str, int] = {}
        self._lines: dict[str, int] = {}

    def _files(self):
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if os.path.isfile(os.path.join(self.path, f))
            )
        return [self.path] if os.path.isfile(self.path) else []

    def initialOffset(self):
        return {}

    def latestOffset(self):
        for p in self._files():
            size = os.path.getsize(p)
            if self._sizes.get(p) != size:
                with open(p, encoding="utf-8", errors="replace") as fh:
                    self._lines[p] = sum(1 for _ in fh)
                self._sizes[p] = size
        return dict(self._lines)

    def partitions(self, start, end):
        parts = [
            _FileRangePartition(p, int(start.get(p, 0)), int(n))
            for p, n in end.items()
            if int(n) > int(start.get(p, 0))
        ]
        # an empty micro-batch still needs one (empty) partition
        return parts or [_FileRangePartition("", 0, 0)]

    def read(self, partition: _FileRangePartition):
        if not partition.path:
            return
        ddl, parse = _KINDS[self.kind]
        names = [f.split()[0] for f in ddl.split(",")]

        def window(fh):
            for i, line in enumerate(fh):
                if i >= partition.end_line:
                    break
                if i >= partition.start_line:
                    yield line

        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            yield from _parsed_batches(window(fh), parse, names)

    def commit(self, end):
        pass


@dataclass
class _WroteFile(WriterCommitMessage):
    staged: str
    final: str


class ToolLogWriter(DataSourceWriter):
    """Write path of the toollog format: rows render back to the
    tool's native text (`<file>: <malware> FOUND` for clamscan), so a
    toollog directory round-trips through the engine losslessly.

    Commit protocol (the part a real connector must get right): each
    task writes to a staged name and reports it in its commit message;
    only the driver's `commit()` renames staged files into place and
    drops the `_SUCCESS` marker — a failed/speculative task leaves
    only `_staged-*` litter that `abort()` (or the next overwrite)
    clears, never a half-visible part file."""

    def __init__(self, options, overwrite: bool):
        self.kind = options.get("kind", "clamscan")
        if self.kind != "clamscan":
            raise ValueError(f"toollog writer supports clamscan, got {self.kind!r}")
        path = options.get("path")
        if not path:
            raise ValueError("toollog requires a path")
        self.path = path
        if overwrite and os.path.isdir(path):
            for f in os.listdir(path):
                if f.startswith(("part-", "_staged-", "_SUCCESS")):
                    os.remove(os.path.join(path, f))

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # Attempt id in the staged name: a retried or speculative
        # attempt must never write the same staged file a live sibling
        # holds open — only commit() picks ONE winner per partition.
        attempt = ctx.taskAttemptId()
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f"_staged-{pid:05d}-{attempt}.log")
        final = os.path.join(self.path, f"part-{pid:05d}.log")
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(f"{row[0]}: {row[1]} FOUND\n")
                n += 1
        return _WroteFile(staged=staged, final=final)

    def commit(self, messages):
        # Spark passes None for task slots that failed before producing
        # a commit message — only successful attempts carry one.
        for m in messages:
            if m is not None:
                os.replace(m.staged, m.final)
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8"):
            pass

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


def register_toollog(spark) -> None:
    """Idempotent format registration on the given session."""
    spark.dataSource.register(ToolLogDataSource)
