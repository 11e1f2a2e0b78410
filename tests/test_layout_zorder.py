"""Z-order clustered layout (sources/layout.py zorder_key /
write_zordered): every output file must carry tight min/max footer
statistics on EVERY z-ordered column — the property that makes
multi-dimensional data skipping work — where a linear sort bounds
only its leading column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from filesystemagent_spark.sources.layout import write_zordered


def _file_ranges(path: str, col_index: dict[str, int]) -> list[dict[str, float]]:
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        spans = {c: [float("inf"), float("-inf")] for c in col_index}
        for rg in range(md.num_row_groups):
            for c, i in col_index.items():
                st = md.row_group(rg).column(i).statistics
                spans[c][0] = min(spans[c][0], st.min)
                spans[c][1] = max(spans[c][1], st.max)
        out.append({c: spans[c][1] - spans[c][0] for c in col_index})
    return out


def test_zorder_bounds_every_dimension(spark, tmp_path):
    n = 1 << 14
    df = spark.range(n).select(
        (F.xxhash64("id") % 10000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 10000).alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, ["x", "y"], n_files=16)
    lpath = str(tmp_path / "linear")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(lpath)
    )
    # resolve column order in the written files
    sample = glob.glob(f"{zpath}/part-*.parquet")[0]
    names = pq.read_schema(sample).names
    idx = {"x": names.index("x"), "y": names.index("y")}

    z = _file_ranges(zpath, idx)
    lin = _file_ranges(lpath, idx)
    full = 20000.0  # x/y span ~[-10000, 10000)
    # Curve segments that cross quadrant boundaries can span wider, so
    # the z-order guarantee is statistical: on AVERAGE a file covers a
    # quadrant-scale range in BOTH dims...
    avg = lambda rs, c: sum(r[c] for r in rs) / len(rs)  # noqa: E731
    assert avg(z, "x") <= 0.5 * full, z
    assert avg(z, "y") <= 0.5 * full, z
    # ...while a linear sort leaves the non-leading dim unbounded in
    # every file (no skipping possible on y at all)
    assert all(r["y"] >= 0.9 * full for r in lin), lin
    assert avg(z, "y") < 0.5 * avg(lin, "y")


def test_zorder_write_roundtrips_rows(spark, tmp_path):
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") * 7 % 997).alias("x"), (F.col("id") * 13 % 991).alias("y")
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, ["x", "y"], n_files=4)
    got = spark.read.parquet(path)
    assert got.count() == 5000
    assert set(got.columns) == {"id", "x", "y"}
    assert got.select(F.sum("id")).collect()[0][0] == 5000 * 4999 // 2
