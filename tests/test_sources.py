"""ETL I/O round-trips (FIXTURES.md §11) and file-listing/catalog
tests (S8-S12) over a generated temp directory tree."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from filesystemagent_spark.sources import etl_io, listing

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("active", T.BooleanType()),
    ]
)

ROWS = [
    (1, "alpha", 1.5, True),
    (2, "beta", -0.25, False),
    (3, None, 2.0, True),
    (4, "delta", None, None),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


@pytest.mark.parametrize(
    "fmt,ext",
    [("csv", "csv"), ("json", "json"), ("parquet", "parquet"), ("xml", "xml"), ("orc", "orc")],
)
def test_roundtrip(spark, df, tmp_path, fmt, ext):
    dest = str(tmp_path / f"out.{ext}")
    etl_io.write_any(df, dest)
    back = etl_io.read_any(spark, dest, schema=SCHEMA if fmt != "parquet" else None)
    got = sorted(
        (tuple(r) for r in back.select("id", "name", "score", "active").collect())
    )
    assert got == sorted(ROWS)


def test_detect_format_rejects_unknown():
    with pytest.raises(ValueError):
        etl_io.detect_format("/data/file.avro7z")


def test_text_roundtrip(spark, tmp_path):
    """Tool logs (.txt/.log) enter as one `value` column per line."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "scan.log")
    lines = spark.createDataFrame([("a FOUND",), ("b OK",)], "value string")
    etl_io.write_any(lines, src)
    back = etl_io.read_any(spark, src)
    assert back.columns == ["value"]
    assert {r.value for r in back.collect()} == {"a FOUND", "b OK"}
    assert back.filter(F.col("value").endswith("FOUND")).count() == 1


def test_convert_csv_to_parquet(spark, df, tmp_path):
    src, dst = str(tmp_path / "in.csv"), str(tmp_path / "out.parquet")
    etl_io.write_any(df, src)
    etl_io.convert(spark, src, dst, read_options={"schema": SCHEMA})
    assert etl_io.read_any(spark, dst).count() == 4


def test_excel_roundtrip_pure_codec(spark, df, tmp_path):
    """Excel now round-trips WITHOUT openpyxl: the pure-stdlib xlsx
    codec (functions/xlsx.py) carries the write and read."""
    path = str(tmp_path / "x.xlsx")
    etl_io.write_any(df, path)
    back = etl_io._read_excel(spark, path, None)
    want = {tuple(r) for r in df.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want
    assert back.columns == df.columns


def test_xlsx_codec_handles_shared_strings_and_types(tmp_path):
    """Reader must handle the sharedStrings form other producers emit,
    plus booleans, blanks, floats and escaping."""
    import zipfile

    from filesystemagent_spark.functions import xlsx as X

    # write via our codec first: escaping + None + bool + float
    p1 = str(tmp_path / "a.xlsx")
    X.write_xlsx(
        [("a<b&c", 1, 2.5, None, True), ("plain", -3, 0.0, None, False)],
        ["s", "i", "f", "n", "b"],
        p1,
    )
    cols, rows = X.read_xlsx(p1)
    assert cols == ["s", "i", "f", "n", "b"]
    # numbers come back as IEEE doubles — Excel's only numeric type
    assert rows == [("a<b&c", 1.0, 2.5, None, True), ("plain", -3.0, 0.0, None, False)]

    # hand-build a workbook in the sharedStrings style
    p2 = str(tmp_path / "b.xlsx")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    sst = (
        f'<sst xmlns="{ns}" count="3" uniqueCount="3">'
        "<si><t>name</t></si><si><t>value</t></si><si><t>widget</t></si></sst>"
    )
    with zipfile.ZipFile(p2, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)
    cols, rows = X.read_xlsx(p2)
    assert cols == ["name", "value"]
    assert rows == [("widget", 42.0)]


# ---------------------------------------------------------------------------
# Listing + catalog


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """A small directory tree with duplicate contents and mixed types."""
    root = tmp_path_factory.mktemp("tree")
    (root / "sub").mkdir()
    files = {
        "a.txt": b"identical payload",
        "b.log": b"identical payload",          # dup of a.txt
        "sub/c.txt": b"identical payload",      # dup of a.txt
        "sub/d.csv": b"unique,row\n1,2\n",
        "e.bin": b"\x00\x01\x02unique",
    }
    for rel, content in files.items():
        (root / rel).write_bytes(content)
    return str(root), files


def test_list_files(spark, tree):
    root, files = tree
    got = listing.list_files(spark, root).collect()
    assert len(got) == len(files)
    txt_only = listing.list_files(spark, root, glob="*.txt").collect()
    assert len(txt_only) == 2


def test_files_catalog_hash_and_dedup(spark, tree):
    root, files = tree
    cat = listing.files_catalog(spark, root)
    rows = {r["file_name"]: r.asDict() for r in cat.collect()}
    assert len(rows) == 5
    expected = hashlib.sha256(b"identical payload").hexdigest()
    assert rows["a.txt"]["file_hash"] == expected
    assert rows["a.txt"]["file_size"] == len(b"identical payload")
    assert rows["a.txt"]["mime_type"] == "text/plain"
    assert rows["d.csv"]["mime_type"] == "text/csv"

    # the A1 dedup query over a real scan: one group of 3
    from filesystemagent_spark.operators.dedup import duplicate_groups

    groups = duplicate_groups(cat, ["file_hash"], "file_path").collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 3


def test_files_catalog_no_hash(spark, tree):
    root, _ = tree
    cat = listing.files_catalog(spark, root, include_hash=False)
    assert cat.filter(F.col("file_hash").isNotNull()).count() == 0


def test_stat_metadata(spark, tree):
    root, _ = tree
    cat = listing.files_catalog(spark, root, include_hash=False)
    meta = listing.stat_metadata(cat)
    rows = {r["file_path"]: r.asDict() for r in meta.collect()}
    assert len(rows) == 5
    some = next(iter(rows.values()))
    assert some["permissions"] and len(some["permissions"]) == 3
    assert some["owner_name"]
    enriched = cat.drop(
        "permissions", "owner_name", "group_name", "accessed_time", "is_symlink", "target_path"
    ).join(meta, "file_path")
    assert enriched.count() == 5


def test_merge_and_cleanup(spark, tree, tmp_path):
    root, _ = tree
    cat = listing.files_catalog(spark, root)
    # re-index after adding + removing a file
    extra = os.path.join(root, "new.txt")
    with open(extra, "wb") as f:
        f.write(b"late arrival")
    try:
        fresh = listing.files_catalog(spark, root)
        merged = listing.merge_catalog(cat, fresh)
        # persist like a real catalog table — later queries must not
        # re-scan source files (they may be gone; that's the point of
        # cleanup_stale_entries)
        store = str(tmp_path / "catalog.parquet")
        merged.write.mode("overwrite").parquet(store)
        merged = spark.read.parquet(store)
        assert merged.count() == 6
        assert merged.select("file_path").distinct().count() == 6
    finally:
        os.remove(extra)
    live = listing.list_files(spark, root)
    cleaned = listing.cleanup_stale_entries(merged, live)
    assert cleaned.count() == 5  # new.txt dropped again


def test_export_index(spark, tree, tmp_path):
    root, _ = tree
    cat = listing.files_catalog(spark, root, include_hash=False)
    dest = str(tmp_path / "index.json")
    listing.export_index(cat, dest)
    back = spark.read.json(dest)
    assert back.count() == 5


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema-on-read evolution: files written before a column existed
    merge with later files — the added column is null-filled for old
    rows, and the unified schema is the union. This is the parquet
    answer to the reference's ad-hoc `.get()`-with-default parsing
    (SURVEY §1.3)."""
    old = spark.createDataFrame([(1, "a")], "id bigint, name string")
    new = spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    )
    old.write.parquet(str(tmp_path / "t" / "v1"))
    new.write.parquet(str(tmp_path / "t" / "v2"))
    df = (
        spark.read.option("mergeSchema", True)
        .option("recursiveFileLookup", True)
        .parquet(str(tmp_path / "t"))
    )
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None and rows[2].score == 9.5
