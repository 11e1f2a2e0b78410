"""File migration as a three-stage Spark plan: PLAN (declarative
conflict resolution) → EXECUTE (distributed I/O) → VERIFY (set-based
integrity audit).

The reference's migration template walks files one at a time, checking
`dest.exists()` and looping counters per conflict
(/root/reference/src/etl_template_base.py:221-298,
/root/reference/src/file_migration_template.py:117-228). That shape is
O(files) round-trips against live filesystem state — racy and
undistributable. Here conflict resolution is a JOIN against a listing
of the destination plus a window over the migration batch itself:

- the destination listing is scanned ONCE (same binaryFile/stat source
  as the catalog), not stat'ed per file;
- rename counters come from `max existing "_N" suffix per stem` +
  `row_number` within the batch — deterministic, collision-free, and
  computed wholly inside the shuffle, so the same plan at 100 TB is
  one join + one window, not a billion exists() probes;
- the plan itself is the dry run (file_migration_template.py:194-228):
  executing nothing returns exactly what WOULD happen.

EXECUTE is the one genuinely imperative stage: an Arrow-batched
mapInPandas doing copy/move/link + streamed hashing on the executors —
the reference's 4-worker thread pool generalized to the cluster.
Executors must share the filesystem (local mode, NFS, or a fuse-mounted
object store); on HDFS-style storage swap the shutil calls for the
Hadoop FS API behind the same plan schema.

VERIFY never trusts EXECUTE's self-reported hashes: it re-reads both
sides through the binaryFile source and anti-joins on hash mismatch —
the independent "verification query" SURVEY §4 calls for.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONFLICT_MODES = ("skip", "overwrite", "rename", "backup", "fail")
OPERATIONS = ("copy", "move", "link", "symlink")

PLAN_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType()),
        T.StructField("dest", T.StringType()),
        T.StructField("action", T.StringType()),  # copy|move|link|symlink|skip
        T.StructField("backup_path", T.StringType()),  # non-null for backup mode
        T.StructField("reason", T.StringType()),  # new|conflict-<mode>
    ]
)

STATUS_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType()),
        T.StructField("dest", T.StringType()),
        T.StructField("status", T.StringType()),  # done|skipped|failed
        T.StructField("n_bytes", T.LongType()),
        T.StructField("src_hash", T.StringType()),
        T.StructField("dest_hash", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def _strip_scheme(col):
    # binaryFile paths arrive as file:/... URIs; plans work on plain paths.
    return F.regexp_replace(col, "^file:", "")


def _split_ext(name):
    """(stem, ext-with-dot) matching pathlib semantics: the suffix is
    the last dot UNLESS the name starts with it (.bashrc has none)."""
    has_ext = name.rlike(r"^.+\.[^.]+$") & ~name.rlike(r"^\.[^.]*$")
    stem = F.when(has_ext, F.regexp_replace(name, r"\.[^.]+$", "")).otherwise(name)
    ext = F.when(has_ext, F.regexp_extract(name, r"(\.[^.]+)$", 1)).otherwise(F.lit(""))
    return stem, ext


def plan_migration(
    listing: DataFrame,
    dest_root: str,
    *,
    source_root: str | None = None,
    preserve_structure: bool = True,
    operation: str = "copy",
    conflict: str = "skip",
    existing: DataFrame | None = None,
    path_col: str = "path",
) -> DataFrame:
    """Build the migration plan. `listing` is the (already filtered)
    source listing; `existing` is a listing of the destination tree
    (None = empty destination). Returns PLAN_SCHEMA rows; nothing
    touches the filesystem — this IS the dry run.

    Conflict semantics mirror the reference
    (etl_template_base.py:221-257): skip keeps the destination and
    drops the source; overwrite replaces; rename appends `_N` choosing
    the smallest free counter; backup moves the existing file to
    `<name><ext>.backup[.N]` then writes; fail raises on the first
    conflict. Sources colliding with each other inside one batch (two
    files flattening to one name) resolve by src order — first wins
    the plain name, later ones count as conflicts of the same mode.
    """
    if conflict not in CONFLICT_MODES:
        raise ValueError(f"conflict must be one of {CONFLICT_MODES}, got {conflict!r}")
    if operation not in OPERATIONS:
        raise ValueError(f"operation must be one of {OPERATIONS}, got {operation!r}")

    src = _strip_scheme(F.col(path_col))
    if preserve_structure:
        if source_root is None:
            raise ValueError("preserve_structure requires source_root")
        root = source_root.rstrip("/")
        rel = F.regexp_replace(src, "^" + re_escape(root) + "/", "")
    else:
        rel = F.element_at(F.split(src, "/"), -1)
    plan = listing.select(
        src.alias("src"),
        F.concat(F.lit(dest_root.rstrip("/") + "/"), rel).alias("dest0"),
    )

    # Destination-side state, scanned once: which planned dests exist,
    # and the max already-used rename counter per (stem, ext).
    if existing is not None:
        ex = existing.select(_strip_scheme(F.col(path_col)).alias("ex_path"))
    else:
        spark = listing.sparkSession
        ex = spark.createDataFrame([], "ex_path string")
    taken = ex.select(F.col("ex_path").alias("dest0"), F.lit(True).alias("dest_exists"))

    ex_name = F.element_at(F.split(F.col("ex_path"), "/"), -1)
    ex_dir = F.expr("substring(ex_path, 1, length(ex_path) - length(split(ex_path, '/')[size(split(ex_path, '/')) - 1]))")
    ex_stem, ex_ext = _split_ext(ex_name)
    # a file named  <base>_<N><ext>  consumes rename counter N for base
    counters = (
        ex.select(
            F.concat(ex_dir, ex_stem, ex_ext).alias("slot"),
            F.regexp_extract(ex_stem, r"_(\d+)$", 1).alias("n_str"),
            ex_stem.alias("stem"),
            ex_dir.alias("dir"),
            ex_ext.alias("ext"),
        )
        .filter(F.col("n_str") != "")
        .select(
            F.concat(
                F.col("dir"), F.regexp_replace(F.col("stem"), r"_\d+$", ""), F.col("ext")
            ).alias("dest0"),
            F.col("n_str").cast("long").alias("n"),
        )
        .groupBy("dest0")
        .agg(F.max("n").alias("max_taken_counter"))
    )

    w = Window.partitionBy("dest0").orderBy("src")
    plan = (
        plan.join(taken, "dest0", "left")
        .join(counters, "dest0", "left")
        .withColumn("dup_rank", F.row_number().over(w) - 1)  # 0 = first claimant
        .withColumn(
            "is_conflict",
            F.coalesce(F.col("dest_exists"), F.lit(False)) | (F.col("dup_rank") > 0),
        )
    )

    d_name = F.element_at(F.split(F.col("dest0"), "/"), -1)
    d_dir = F.expr("substring(dest0, 1, length(dest0) - length(split(dest0, '/')[size(split(dest0, '/')) - 1]))")
    d_stem, d_ext = _split_ext(d_name)
    # counter: continue past any existing _N, then rank within the batch.
    base_counter = F.coalesce(F.col("max_taken_counter"), F.lit(0))
    offset = F.when(F.coalesce(F.col("dest_exists"), F.lit(False)), 1).otherwise(0)
    counter = base_counter + F.col("dup_rank") + offset
    renamed = F.concat(d_dir, d_stem, F.lit("_"), counter.cast("string"), d_ext)

    if conflict == "fail":
        n_conflicts = plan.filter(F.col("is_conflict")).count()
        if n_conflicts:
            raise FileExistsError(f"{n_conflicts} destination conflicts (conflict='fail')")

    no_conflict = ~F.col("is_conflict")
    if conflict == "skip":
        action = F.when(no_conflict, operation).otherwise(F.lit("skip"))
        dest, backup = F.col("dest0"), F.lit(None).cast("string")
    elif conflict == "overwrite":
        action, dest, backup = F.lit(operation), F.col("dest0"), F.lit(None).cast("string")
    elif conflict == "rename":
        action = F.lit(operation)
        dest = F.when(no_conflict, F.col("dest0")).otherwise(renamed)
        backup = F.lit(None).cast("string")
    elif conflict == "backup":
        action, dest = F.lit(operation), F.col("dest0")
        backup = F.when(
            F.coalesce(F.col("dest_exists"), F.lit(False)),
            F.concat(F.col("dest0"), F.lit(".backup")),
        )
    else:  # fail — no conflicts survive the check above
        action, dest, backup = F.lit(operation), F.col("dest0"), F.lit(None).cast("string")

    return plan.select(
        F.col("src"),
        dest.alias("dest"),
        action.alias("action"),
        backup.alias("backup_path"),
        F.when(no_conflict, F.lit("new")).otherwise(F.lit(f"conflict-{conflict}")).alias(
            "reason"
        ),
    )


def re_escape(s: str) -> str:
    import re

    return re.escape(s)


def execute_migration(
    plan: DataFrame,
    *,
    verify_integrity: bool = True,
    algorithm: str = "sha256",
    preserve_timestamps: bool = True,
) -> DataFrame:
    """Run the plan on the executors (Arrow-batched mapInPandas) and
    return STATUS_SCHEMA rows. Hashing streams in 1 MiB chunks (the
    reference's 8 KiB loop, file_indexing_system.py:100-118, sized for
    modern I/O); integrity failure of a single file marks that row
    failed without poisoning the batch — the reference's per-file
    try/except, kept per-row."""
    import hashlib
    import shutil

    import pandas as pd

    def _hash(path: str) -> str:
        h = hashlib.new(algorithm)
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.action == "skip":
                    out.append((row.src, row.dest, "skipped", 0, None, None, None))
                    continue
                try:
                    os.makedirs(os.path.dirname(row.dest), exist_ok=True)
                    if row.backup_path and os.path.exists(row.dest):
                        bak = row.backup_path
                        k = 0
                        while os.path.exists(bak):  # .backup.N if taken
                            k += 1
                            bak = f"{row.backup_path}.{k}"
                        shutil.move(row.dest, bak)
                    src_hash = (
                        _hash(row.src)
                        if verify_integrity and row.action in ("copy", "move")
                        else None
                    )
                    n = os.path.getsize(row.src)
                    if row.action == "copy":
                        shutil.copy2(row.src, row.dest) if preserve_timestamps else shutil.copyfile(row.src, row.dest)
                    elif row.action == "move":
                        shutil.move(row.src, row.dest)
                    elif row.action == "link":
                        os.link(row.src, row.dest)
                    else:
                        os.symlink(row.src, row.dest)
                    dest_hash = _hash(row.dest) if src_hash is not None else None
                    if src_hash is not None and src_hash != dest_hash:
                        out.append(
                            (row.src, row.dest, "failed", n, src_hash, dest_hash,
                             "integrity mismatch")
                        )
                        continue
                    out.append((row.src, row.dest, "done", n, src_hash, dest_hash, None))
                except OSError as e:
                    out.append((row.src, row.dest, "failed", 0, None, None, str(e)))
            yield pd.DataFrame(
                out, columns=[f.name for f in STATUS_SCHEMA.fields]
            )

    return plan.mapInPandas(run, STATUS_SCHEMA)


def migration_report(status: DataFrame) -> DataFrame:
    """A10 progress counters as one aggregate over the status table
    (file_migration_template.py:230-258): processed/succeeded/failed/
    skipped counts, bytes moved, success rate over attempted files."""
    attempted = F.count(F.when(F.col("status") != "skipped", 1))
    return status.agg(
        F.count("*").alias("processed_files"),
        F.count(F.when(F.col("status") == "done", 1)).alias("successful_files"),
        F.count(F.when(F.col("status") == "failed", 1)).alias("failed_files"),
        F.count(F.when(F.col("status") == "skipped", 1)).alias("skipped_files"),
        F.sum(F.when(F.col("status") == "done", F.col("n_bytes")).otherwise(0)).alias(
            "bytes_transferred"
        ),
        (F.count(F.when(F.col("status") == "done", 1)) / F.greatest(attempted, F.lit(1)))
        .alias("success_rate"),
    )


def verify_migration(
    spark: SparkSession, plan: DataFrame, source_root: str, dest_root: str
) -> DataFrame:
    """Independent integrity audit for copies: re-read BOTH trees
    through the distributed binaryFile scan, hash JVM-side
    (`sha2(content)`), and return plan rows whose destination is
    missing or whose hashes differ. Trusts nothing EXECUTE reported,
    and never collects paths to the driver — two scans and two joins,
    the pure 'verification query' of SURVEY §4. (Moves have no source
    left to re-read; audit those against the catalog snapshot taken
    before the run.)"""
    copies = plan.filter(F.col("action") == "copy").select("src", "dest")

    def tree(root: str, col: str) -> DataFrame:
        df = spark.read.format("binaryFile").option("recursiveFileLookup", True).load(root)
        return df.select(
            _strip_scheme(F.col("path")).alias(col),
            F.sha2(F.col("content"), 256).alias(f"{col}_hash"),
        )

    joined = (
        copies.join(tree(source_root, "src"), "src", "left")
        .join(tree(dest_root, "dest"), "dest", "left")
    )
    return joined.filter(
        F.col("dest_hash").isNull() | (F.col("src_hash") != F.col("dest_hash"))
    ).select("src", "dest", "src_hash", "dest_hash")
