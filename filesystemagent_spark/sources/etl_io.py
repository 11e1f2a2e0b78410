"""Format-dispatch readers/writers — the ETL engine's I/O surface
(SURVEY.md §2.1 S1-S7, S12; reference src/etl.py:121-176).

The reference dispatches on file extension through a
`supported_formats` registry (etl.py:21-27) into pandas readers; here
the same registry dispatches into `spark.read`/`df.write`, so reads
are partitioned scans with pushdown instead of single-process pandas.
Excel has no JVM datasource — it bridges through pandas on the driver
(small-file source by nature; reference uses pd.read_excel the same
way) and is gated behind an import-try since openpyxl may be absent.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# extension → format name (reference etl.py:21-27)
SUPPORTED_FORMATS = {
    ".csv": "csv",
    ".json": "json",
    ".xml": "xml",
    ".parquet": "parquet",
    ".xlsx": "excel",
    ".xls": "excel",
    # beyond the reference's list: the other JVM-native formats a
    # complete engine is expected to speak
    ".orc": "orc",
    ".arrow": "arrowipc",
    ".feather": "arrowipc",
    ".txt": "text",
    ".log": "text",
}


def detect_format(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext not in SUPPORTED_FORMATS:
        raise ValueError(f"Unsupported format: {ext!r} (path {path})")
    return SUPPORTED_FORMATS[ext]


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: T.StructType | None = None,
    **options: Any,
) -> DataFrame:
    """Extension-dispatched read (reference `_load_data` etl.py:147-155).

    Defaults per format mirror the reference's semantics:
    - csv: header row + type inference when no schema given (pandas
      inference analog; pass `schema=` for declared schemas)
    - json: multiLine (whole-document json.load analog, etl.py:129-132)
    - xml: rowTag option required-or-defaulted to 'row'
    """
    fmt = fmt or detect_format(path)
    if fmt == "csv":
        reader = spark.read.options(header=True, **options)
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", True)
        return reader.csv(path)
    if fmt == "json":
        reader = spark.read.option("multiLine", True).options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path)
    if fmt == "xml":
        reader = spark.read.format("xml").option("rowTag", options.pop("rowTag", "row"))
        if schema is not None:
            reader = reader.schema(schema)
        return reader.options(**options).load(path)
    if fmt == "parquet":
        reader = spark.read.options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(path)
    if fmt == "orc":
        reader = spark.read.options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.orc(path)
    if fmt == "arrowipc":
        from filesystemagent_spark.sources.arrowipc import register_arrowipc

        register_arrowipc(spark)
        reader = spark.read.format("arrowipc").options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(path)
    if fmt == "text":
        # one string column `value` per line (clamscan/listdlls-style
        # tool logs enter the engine through this door)
        return spark.read.options(**options).text(path)
    if fmt == "excel":
        return _read_excel(spark, path, schema, **options)
    raise ValueError(f"Unsupported format: {fmt}")


def write_any(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    **options: Any,
) -> None:
    """Extension-dispatched write (reference `_save_data` etl.py:157-176).
    Parent-dir creation (etl.py:159) is implicit in Hadoop FS output."""
    fmt = fmt or detect_format(path)
    if fmt == "csv":
        df.write.mode(mode).options(header=True, **options).csv(path)
    elif fmt == "json":
        df.write.mode(mode).options(**options).json(path)
    elif fmt == "xml":
        df.write.format("xml").mode(mode).option(
            "rowTag", options.pop("rowTag", "row")
        ).options(**options).save(path)
    elif fmt == "parquet":
        df.write.mode(mode).options(**options).parquet(path)
    elif fmt == "orc":
        df.write.mode(mode).options(**options).orc(path)
    elif fmt == "arrowipc":
        from filesystemagent_spark.sources.arrowipc import register_arrowipc

        register_arrowipc(df.sparkSession)
        df.write.format("arrowipc").mode(mode).options(**options).save(path)
    elif fmt == "text":
        # text sink requires a single string column, like spark.write.text
        df.write.mode(mode).options(**options).text(path)
    elif fmt == "excel":
        _write_excel(df, path, **options)
    else:
        raise ValueError(f"Unsupported format: {fmt}")


def _read_excel(
    spark: SparkSession, path: str, schema: T.StructType | None, **options: Any
) -> DataFrame:
    """Driver-side bridge (reference etl.py:143-145). Excel files are
    inherently small single files; distributing the parse buys nothing
    — the DataFrame is distributed after createDataFrame. Ladder:
    pandas+openpyxl when importable, else the pure-stdlib codec
    (functions/xlsx.py — zipfile + xml.etree), which reads any
    conforming single-sheet values workbook."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path, **options)
        return spark.createDataFrame(pdf, schema=schema)
    except ImportError:  # openpyxl/xlrd not installed in this env
        from filesystemagent_spark.functions.xlsx import read_xlsx

        columns, rows = read_xlsx(path)
        if schema is not None:
            return spark.createDataFrame(rows, schema)
        return spark.createDataFrame(rows, columns)


def _write_excel(df: DataFrame, path: str, **options: Any) -> None:
    """pandas+openpyxl when importable, else the pure-stdlib writer
    (inline-string cells, one sheet) — small-file bridge either way."""
    try:
        import openpyxl  # noqa: F401

        df.toPandas().to_excel(path, index=False, **options)
    except ImportError:
        from filesystemagent_spark.functions.xlsx import write_xlsx

        pdf = df.toPandas()
        rows = [
            tuple(None if pd_isna(v) else v for v in row)
            for row in pdf.itertuples(index=False, name=None)
        ]
        write_xlsx(rows, list(pdf.columns), path)


def pd_isna(v: Any) -> bool:
    import pandas as pd

    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def convert(
    spark: SparkSession,
    source: str,
    destination: str,
    source_fmt: str | None = None,
    dest_fmt: str | None = None,
    read_options: dict[str, Any] | None = None,
    write_options: dict[str, Any] | None = None,
) -> DataFrame:
    """FULL_ETL without a transform: read → write (reference
    execute_job EXTRACT+LOAD path, etl.py:29-55). Returns the
    DataFrame so callers can chain transforms before the write."""
    df = read_any(spark, source, source_fmt, **(read_options or {}))
    write_any(df, destination, dest_fmt, **(write_options or {}))
    return df
