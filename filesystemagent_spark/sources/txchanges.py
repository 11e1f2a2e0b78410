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

Offsets are `{"version": N}` (JSON-serializable, monotone). The
driver resolves versions -> change-file lists from the manifests;
executors read the parquet change files via pyarrow (one partition
per version — a version's images are usually one small staged batch;
heavier feeds would split per file). Versions committed WITHOUT the
change feed fail the stream loudly (a silent gap would corrupt every
downstream consumer) — except v1, which is its own insert image, and
layout-only compactions, which carry no logical change.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from filesystemagent_spark.sources.txtable import TxTable


@dataclass
class _VersionPartition(InputPartition):
    files: list = field(default_factory=list)
    change_type: str = ""
    version: int = 0
    ddl: str = ""
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
        self.table = TxTable(options["path"])
        # start AFTER this version (0 = from the beginning incl. init)
        self.start_after = int(options.get("fromversion", 0))
        self.out_fields = [f.name for f in schema.fields[:-2]]

    def initialOffset(self):
        return {"version": self.start_after}

    def latestOffset(self):
        return {"version": self.table.latest_version()}

    def partitions(self, start, end):
        parts = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            # one resolution policy for batch + stream (raises on a
            # non-CDF version): TxTable.changes_for_version
            ch = self.table.changes_for_version(v)
            if ch is None or not ch["files"]:
                continue
            parts.append(
                _VersionPartition(
                    files=ch["files"],
                    change_type=ch["type"],
                    version=v,
                    ddl=ch["schema_ddl"],
                    out_fields=self.out_fields,
                )
            )
        return parts or [_VersionPartition()]

    def read(self, partition: _VersionPartition):
        if not partition.files:
            return
        import pyarrow.parquet as pq

        for f in partition.files:
            tbl = pq.read_table(f)
            cols = {
                name: tbl.column(name).to_pylist() if name in tbl.column_names
                else [None] * tbl.num_rows
                for name in partition.out_fields
            }
            for i in range(tbl.num_rows):
                yield tuple(cols[name][i] for name in partition.out_fields) + (
                    partition.change_type,
                    partition.version,
                )

    def commit(self, end):
        pass


def register_txtable_changes(spark) -> None:
    spark.dataSource.register(TxTableChangesDataSource)
