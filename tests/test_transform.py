"""U1 transform surface: the idiomatic mapInPandas path and the
env-var script-contract compatibility shim, replicating the
reference's example transform (scripts/example_etl.py:27-40 —
dropna → equality filter → add processed_at; FIXTURES.md §11)."""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from filesystemagent_spark.operators import transform as X

SCHEMA = "id long, category string, score double"
ROWS = [
    (1, "a", 1.0),
    (2, "b", 2.0),
    (3, None, 3.0),   # dropped by dropna
    (4, "a", None),   # dropped by dropna
    (5, "a", 5.0),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_transform_pandas(df):
    def fn(pdf, params):
        out = pdf.dropna()
        return out[out["category"] == params["filter_value"]]

    got = X.transform_pandas(df, fn, SCHEMA, {"filter_value": "a"})
    assert sorted(r["id"] for r in got.collect()) == [1, 5]


def test_transform_pandas_single_arg(df):
    got = X.transform_pandas(df, lambda pdf: pdf[pdf["score"] > 1.5], SCHEMA)
    assert sorted(r["id"] for r in got.collect()) == [2, 3, 5]


REFERENCE_STYLE_SCRIPT = textwrap.dedent(
    """
    import os, json
    import pandas as pd

    data_path = os.environ["TRANSFORM_DATA_PATH"]
    result_path = os.environ["TRANSFORM_RESULT_PATH"]
    params = json.loads(os.environ.get("TRANSFORM_PARAMS", "{}"))

    with open(data_path) as f:
        raw = json.load(f)
    data = pd.DataFrame(raw)

    result = data.dropna()
    if "filter_column" in params and "filter_value" in params:
        result = result[result[params["filter_column"]] == params["filter_value"]]
    result["processed"] = True

    with open(result_path, "w") as f:
        json.dump(result.to_dict(orient="records"), f)
    """
)


def test_transform_script_contract(df, tmp_path):
    script = tmp_path / "ref_transform.py"
    script.write_text(REFERENCE_STYLE_SCRIPT)
    out_schema = SCHEMA + ", processed boolean"
    got = X.transform_script(
        df.repartition(2),
        str(script),
        out_schema,
        {"filter_column": "category", "filter_value": "a"},
    )
    rows = sorted((r["id"], r["processed"]) for r in got.collect())
    # dropna removes 3,4; filter keeps category 'a' → ids 1,5
    assert rows == [(1, True), (5, True)]


def test_transform_script_identity_when_no_result(df, tmp_path):
    script = tmp_path / "noop.py"
    script.write_text("pass\n")
    got = X.transform_script(df, str(script), SCHEMA)
    assert got.count() == len(ROWS)  # identity per the contract


def test_transform_script_failure_surfaces(df, tmp_path):
    script = tmp_path / "boom.py"
    script.write_text("import sys; sys.exit(3)\n")
    with pytest.raises(Exception, match="Transform script failed"):
        X.transform_script(df, str(script), SCHEMA).collect()


def test_transform_script_missing(df):
    with pytest.raises(FileNotFoundError):
        X.transform_script(df, "/nope/missing.py", SCHEMA)


def test_json_records_schema(df):
    s = X.json_records_schema(df, [T.StructField("processed_at", T.StringType())])
    assert s.fieldNames() == ["id", "category", "score", "processed_at"]
