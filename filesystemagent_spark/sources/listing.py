"""File listing + catalog build (SURVEY.md §2.1 S8-S12, §2.7 F1, F6).

The reference walks directories with rglob + per-file stat + chunked
SHA-256 in a 4-worker thread pool (file_indexing_system.py:200-244);
here the listing IS a Spark scan: the binaryFile source enumerates
files in parallel, gives (path, modificationTime, length, content),
and the hash is a JVM-side `sha2(content)` column. Stat metadata the
source doesn't carry (owner/perms/mime) comes from one Arrow-batched
mapInPandas pass — the documented slow path, used only when those
columns are selected (Catalyst prunes the pass away otherwise is NOT
true for mapInPandas, so it's a separate opt-in function).

At 100 TB the catalog is a partitioned Parquet/Delta table keyed by
file_hash for dedup joins; `merge_catalog` and `cleanup_stale_entries`
express the reference's INSERT OR REPLACE + stale-row DELETE as
idempotent DataFrame ops.

KNOWN DIVERGENCE from the reference's rglob walk: Spark's file index
treats `.`- and `_`-prefixed names as hidden/metadata and skips them,
so dotfiles never enter a listing (the reference's `ignore_hidden`
filter OFF cannot be expressed through this source). Use a
mapInPandas os.walk source if dotfile indexing is ever required.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: hash expressions per algorithm enum (reference template_models.py:7-11)
HASH_EXPRS = {
    "md5": lambda c: F.md5(c),
    "sha1": lambda c: F.sha1(c),
    "sha256": lambda c: F.sha2(c, 256),
    "sha512": lambda c: F.sha2(c, 512),
}


def list_files(
    spark: SparkSession,
    directory: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """S8/S9: parallel file enumeration via the binaryFile source.
    `glob` maps to pathGlobFilter (reference fnmatch patterns,
    etl_template_base.py:203-219). Content is NOT loaded here — this
    is listing-only (column pruning drops `content` when unused)."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(directory).select("path", "modificationTime", "length")


def files_catalog(
    spark: SparkSession,
    directory: str,
    glob: str | None = None,
    hash_algorithm: str = "sha256",
    include_hash: bool = True,
) -> DataFrame:
    """S10/S11/F1: build the `files` catalog table from a directory
    scan (reference index_directory file_indexing_system.py:200-244).

    The hash is computed from file content inside the JVM scan —
    include_hash=False skips reading content entirely (the reference's
    lazy-hash micro-optimization :137-140 falls out of column pruning).
    """
    if include_hash:
        if hash_algorithm not in HASH_EXPRS:
            raise ValueError(f"Unknown hash algorithm: {hash_algorithm}")
        scan = (
            spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", glob or "*")
            .load(directory)
        )
        hashed = scan.withColumn(
            "file_hash", HASH_EXPRS[hash_algorithm](F.col("content"))
        ).drop("content")
    else:
        hashed = list_files(spark, directory, glob).withColumn(
            "file_hash", F.lit(None).cast("string")
        )

    name = F.element_at(F.split(F.col("path"), "/"), -1)
    return hashed.select(
        F.regexp_replace(F.col("path"), "^file:", "").alias("file_path"),
        name.alias("file_name"),
        F.col("length").alias("file_size"),
        F.col("modificationTime").alias("created_time"),  # binaryFile carries mtime only
        F.col("modificationTime").alias("modified_time"),
        F.lit(None).cast("timestamp").alias("accessed_time"),
        F.col("file_hash"),
        F.lit(hash_algorithm if include_hash else None).alias("hash_algorithm"),
        mime_from_name(name).alias("mime_type"),
        F.lit(None).cast("string").alias("permissions"),
        F.lit(None).cast("string").alias("owner_name"),
        F.lit(None).cast("string").alias("group_name"),
        F.lit(False).alias("is_directory"),  # binaryFile lists files only
        F.lit(False).alias("is_symlink"),
        F.lit(None).cast("string").alias("target_path"),
        F.current_timestamp().alias("indexed_at"),
        F.lit(None).cast(T.MapType(T.StringType(), T.StringType())).alias("custom_metadata"),
    )


# F6: extension → mime, as a small CASE chain instead of a UDF. The
# reference calls mimetypes.guess_type (file_indexing_system.py:143-145);
# this covers the common table and defaults like the stdlib does.
_MIME = {
    "txt": "text/plain", "log": "text/plain", "md": "text/markdown",
    "csv": "text/csv", "html": "text/html", "xml": "text/xml",
    "json": "application/json", "pdf": "application/pdf",
    "zip": "application/zip", "gz": "application/gzip",
    "exe": "application/x-msdownload", "dll": "application/x-msdownload",
    "jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
    "gif": "image/gif", "bmp": "image/bmp", "webp": "image/webp",
    "mp3": "audio/mpeg", "wav": "audio/x-wav", "flac": "audio/flac",
    "mp4": "video/mp4", "avi": "video/x-msvideo", "mkv": "video/x-matroska",
    "mov": "video/quicktime", "py": "text/x-python",
}


def mime_from_name(name_col):
    ext = F.lower(F.element_at(F.split(name_col, r"\."), -1))
    expr = F.lit(None).cast("string")
    for k, v in reversed(_MIME.items()):
        expr = F.when(ext == k, v).otherwise(expr)
    return expr


_STAT_FIELDS = T.StructType(
    [
        T.StructField("file_path", T.StringType()),
        T.StructField("permissions", T.StringType()),
        T.StructField("owner_name", T.StringType()),
        T.StructField("group_name", T.StringType()),
        T.StructField("accessed_time", T.TimestampType()),
        T.StructField("is_symlink", T.BooleanType()),
        T.StructField("target_path", T.StringType()),
    ]
)


def stat_metadata(paths: DataFrame, path_col: str = "file_path") -> DataFrame:
    """S10's POSIX-only columns (perms/owner/group/atime/symlink) via
    one Arrow-batched mapInPandas pass over paths — the one place the
    listing source genuinely needs Python (SURVEY §4 'custom work').
    Join the result back on file_path. Executors stat their partition's
    paths locally; on a cluster this requires a shared filesystem,
    exactly like the reference's agent."""
    import pandas as pd

    def stat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import grp
        import pwd

        for pdf in batches:
            out = []
            for p in pdf[path_col]:
                local = p.removeprefix("file:")
                try:
                    st = os.stat(local, follow_symlinks=False)
                    link = os.path.islink(local)
                    out.append(
                        {
                            "file_path": p,
                            "permissions": oct(st.st_mode & 0o777)[2:],
                            "owner_name": pwd.getpwuid(st.st_uid).pw_name,
                            "group_name": grp.getgrgid(st.st_gid).gr_name,
                            # floor to µs — Arrow timestamps are µs precision
                            "accessed_time": pd.Timestamp(st.st_atime, unit="s").floor("us"),
                            "is_symlink": link,
                            "target_path": os.readlink(local) if link else None,
                        }
                    )
                except OSError:
                    out.append({"file_path": p, "permissions": None, "owner_name": None,
                                "group_name": None, "accessed_time": None,
                                "is_symlink": None, "target_path": None})
            yield pd.DataFrame(out, columns=[f.name for f in _STAT_FIELDS.fields])

    return paths.select(path_col).mapInPandas(stat_batch, _STAT_FIELDS)


def merge_catalog(existing: DataFrame, fresh: DataFrame) -> DataFrame:
    """INSERT OR REPLACE semantics (reference
    file_indexing_system.py:168-198): fresh rows win on file_path.
    Expressed as anti-join + union — the batch-table form of
    `MERGE INTO`. This computes the merged RESULT only; for
    concurrent-writer safety (lost-update prevention, snapshot
    isolation) commit it through `sources/txtable.TxTable.merge_into`,
    or Delta MERGE when a Delta catalog is attached."""
    keep = existing.join(fresh.select("file_path"), "file_path", "left_anti")
    return keep.unionByName(fresh)


def cleanup_stale_entries(catalog: DataFrame, live_listing: DataFrame) -> DataFrame:
    """P19: drop catalog rows whose file no longer exists — anti-join
    against a fresh listing (reference cleanup_stale_entries
    file_indexing_system.py:491-507, the per-row exists() loop)."""
    live = live_listing.select(
        F.regexp_replace(F.col("path"), "^file:", "").alias("file_path")
    )
    return catalog.join(live, "file_path", "left_semi")


def export_index(catalog: DataFrame, path: str, fmt: str = "json") -> None:
    """S12: dump the catalog (reference export_index
    file_indexing_system.py:436-489)."""
    from filesystemagent_spark.sources.etl_io import write_any

    write_any(catalog.withColumn("custom_metadata", F.to_json("custom_metadata")), path, fmt)
