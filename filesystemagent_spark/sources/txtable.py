"""Transactional snapshot tables: optimistic-concurrency commits over
plain parquet — the container-scale stand-in for Delta/Iceberg MERGE.

The reference's catalog store is a SQLite INSERT OR REPLACE
(/root/reference/src/file_indexing_system.py:168-198); the engine's
parquet substitute (`listing.merge_catalog` + overwrite) is
last-writer-wins at JOB granularity, which silently drops a concurrent
writer's upserts. This module restores lost-update safety with the
same protocol the real table formats use:

- A snapshot = an immutable manifest file `_manifests/v{N}.json`
  listing the data files visible at version N (plus the schema DDL so
  empty tables still read).
- Readers resolve the highest manifest ONCE and read exactly its file
  list — snapshot isolation: a concurrent commit cannot tear a scan,
  and any historical version stays readable (time travel).
- Writers never mutate data files. A commit writes new parquet under
  `data/`, then publishes manifest N+1 via an ATOMIC
  create-if-not-exists (`os.link` of a fully-written temp file — the
  filesystem's compare-and-swap). If another writer won version N+1,
  the link fails, and `merge_into` RETRIES against the new snapshot —
  so both writers' upserts survive, in commit order.

At 100 TB the protocol is unchanged; what upgrades is the conflict
granularity (manifest lists per-partition file sets so disjoint
writers don't contend) and the CAS primitive (object stores use
put-if-absent / a log service instead of link(2)). The rewrite inside
`merge_into` is full-table here — right for catalog/baseline-sized
tables; partition-scoped rewrite is the fact-table path (see
plans/matview.py for the partition-swap half of that story).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer published this version first — retry on a fresh
    snapshot."""


def _collect_file_stats(files: list[str]) -> dict[str, dict[str, list]]:
    """Per-file min/max column stats from the parquet footers the
    files already carry (no data scan — footer metadata only), merged
    across row groups. Only JSON-representable scalar types (ints,
    floats, strs, bools) are kept; columns without usable stats are
    simply absent, which the pruner treats as 'cannot prune'.

    Driver-side over the JUST-WRITTEN files of one commit — manifest-
    scale work, the same place Iceberg/Delta collect their per-file
    stats (from the writing tasks); at fact-table scale the loop
    becomes a task-side metric the commit aggregates."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, list]] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        per: dict[str, list] = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                mn, mx = st.min, st.max
                if not all(isinstance(v, (int, float, str, bool)) for v in (mn, mx)):
                    continue
                name = col.path_in_schema
                if name in per:
                    per[name] = [min(per[name][0], mn), max(per[name][1], mx)]
                else:
                    per[name] = [mn, mx]
        out[f] = per
    return out


def _file_may_match(per: dict[str, list], pred: tuple[str, str, object]) -> bool:
    """Conservative footer-stats test: False ONLY when the file's
    [min, max] range for the predicate column PROVES no row matches.
    Missing stats (all-null files, unsupported types) keep the file —
    correctness never depends on stats existing."""
    col, op, val = pred
    if col not in per:
        return True
    mn, mx = per[col]
    try:
        if op == "=":
            return mn <= val <= mx
        if op == "<":
            return mn < val
        if op == "<=":
            return mn <= val
        if op == ">":
            return mx > val
        if op == ">=":
            return mx >= val
    except TypeError:
        return True  # incomparable literal vs stats type — keep
    return True  # unknown op — never prune on it


class TxTable:
    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.manifest_dir = os.path.join(path, "_manifests")

    # -- snapshot resolution ---------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_dir, f"v{version:010d}.json")

    def latest_version(self) -> int:
        """Highest committed version, 0 = empty/uninitialized table."""
        try:
            names = os.listdir(self.manifest_dir)
        except FileNotFoundError:
            return 0
        versions = [
            int(n[1:11]) for n in names if n.startswith("v") and n.endswith(".json")
        ]
        return max(versions, default=0)

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version), encoding="utf-8") as fh:
            return json.load(fh)

    # -- read path ---------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        where: list[tuple[str, str, object]] | None = None,
    ) -> DataFrame:
        """The table AS OF `version` (default: latest). Resolves the
        manifest once; the returned DataFrame scans exactly that file
        set no matter what commits land afterwards.

        ``where`` — optional conjunctive predicates [(col, op, value)]
        with op in {=, <, <=, >, >=} — enables STATS-BASED FILE
        SKIPPING: files whose manifest min/max stats prove no matching
        row are dropped from the scan before Spark ever plans it (the
        Iceberg/Delta data-skipping recipe; Spark's own pushdown can
        only prune row groups INSIDE files it was given). The same
        predicates are then applied as real filters, so results are
        exact whether or not any file was skipped; manifests written
        before stats existed simply skip nothing."""
        v = self.latest_version() if version is None else version
        if v == 0:
            raise ValueError(f"table {self.path} has no committed snapshot")
        m = self._read_manifest(v)
        files = m["files"]
        if where:
            stats = m.get("stats", {})
            files = [
                f
                for f in files
                if all(_file_may_match(stats.get(f, {}), p) for p in where)
            ]
        if not files:
            df = spark.createDataFrame([], m["schema_ddl"])
        else:
            df = spark.read.schema(m["schema_ddl"]).parquet(*files)
        if where:
            from pyspark.sql import functions as F

            ops = {
                "=": lambda c, v_: c == v_,
                "<": lambda c, v_: c < v_,
                "<=": lambda c, v_: c <= v_,
                ">": lambda c, v_: c > v_,
                ">=": lambda c, v_: c >= v_,
            }
            for col, op, val in where:
                df = df.filter(ops[op](F.col(col), F.lit(val)))
        return df

    # -- write path --------------------------------------------------

    def _write_data(self, df: DataFrame) -> tuple[list[str], str]:
        """Stage df as immutable parquet under data/, return (files,
        schema ddl). Data is invisible until a manifest references it,
        so failures leave only unreferenced litter (vacuumable)."""
        out = os.path.join(self.data_dir, uuid.uuid4().hex)
        df.write.parquet(out)
        files = sorted(
            os.path.join(out, f)
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        return files, ddl

    def latest_app(self) -> dict:
        """Application metadata of the latest snapshot ({} when empty) —
        e.g. the streaming sink's last-applied micro-batch id, so a
        replayed batch can detect it already committed."""
        v = self.latest_version()
        return self._read_manifest(v).get("app", {}) if v else {}

    def _try_commit(
        self, version: int, files: list[str], schema_ddl: str,
        app: dict | None = None,
    ) -> None:
        """Publish `version` atomically: write a temp manifest, then
        link(2) it into place — link fails with EEXIST if a concurrent
        writer won this version (the CAS), and readers can never
        observe a half-written manifest."""
        os.makedirs(self.manifest_dir, exist_ok=True)
        tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(
                {"version": version, "files": files, "schema_ddl": schema_ddl,
                 "committed_at": time.time(), "app": app or {},
                 "stats": _collect_file_stats(files)},
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        target = self._manifest_path(version)
        try:
            os.link(tmp, target)
        except FileExistsError as e:
            raise CommitConflict(f"version {version} already committed") from e
        finally:
            os.unlink(tmp)

    def init(self, df: DataFrame, app: dict | None = None) -> int:
        """Create version 1 from df (no-op error if already created —
        use merge_into/overwrite afterwards)."""
        os.makedirs(self.data_dir, exist_ok=True)
        files, ddl = self._write_data(df)
        self._try_commit(1, files, ddl, app)
        return 1

    def overwrite(self, df: DataFrame, max_retries: int = 10) -> int:
        """Replace the table contents (still CAS-serialized)."""
        os.makedirs(self.data_dir, exist_ok=True)
        files, ddl = self._write_data(df)
        for _ in range(max_retries):
            v = self.latest_version()
            try:
                self._try_commit(v + 1, files, ddl)
                return v + 1
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {max_retries} retries")

    def merge_into(
        self,
        updates: DataFrame,
        key_cols: list[str],
        max_retries: int = 10,
        app: dict | None = None,
    ) -> int:
        """MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT MATCHED
        INSERT, with optimistic concurrency: read the current
        snapshot, merge (updates win on the key), stage the result,
        CAS-commit the next version; on conflict, RE-READ and retry —
        a concurrent writer's rows are merged, never silently dropped
        (the lost-update case of plain last-writer-wins parquet).
        Returns the committed version."""
        spark = updates.sparkSession
        for _ in range(max_retries):
            base = self.latest_version()
            if base == 0:
                try:
                    return self.init(updates, app)
                except CommitConflict:
                    continue
            current = self.read(spark, base)
            keep = current.join(
                updates.select(*key_cols).distinct(), key_cols, "left_anti"
            )
            merged = keep.unionByName(updates)
            files, ddl = self._write_data(merged)
            try:
                self._try_commit(base + 1, files, ddl, app)
                return base + 1
            except CommitConflict:
                continue  # someone else won base+1 — merge against it
        raise CommitConflict(f"gave up after {max_retries} retries")

    def vacuum(self) -> list[str]:
        """Delete data directories not referenced by ANY manifest
        (aborted stages). Referenced-by-old-version files are kept —
        time travel stays valid; production would age them out."""
        import shutil

        referenced: set[str] = set()
        for v in range(1, self.latest_version() + 1):
            try:
                for f in self._read_manifest(v)["files"]:
                    referenced.add(os.path.dirname(f))
            except FileNotFoundError:
                continue
        removed = []
        if os.path.isdir(self.data_dir):
            for d in os.listdir(self.data_dir):
                full = os.path.join(self.data_dir, d)
                if full not in referenced:
                    shutil.rmtree(full)
                    removed.append(full)
        return sorted(removed)
