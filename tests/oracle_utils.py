"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
row count + column names + order-insensitive value equality."""

from __future__ import annotations

import io
import math
from contextlib import redirect_stdout

# Physical plans recorded by the parity/rows-only runs (test_oracle_
# parity.py populates, test_plans.py's whole-registry scan consumes):
# building a lifecycle query's DataFrame EXECUTES its whole DML/sink
# pipeline inside fn(), so a second whole-registry "analysis-only"
# sweep re-ran every pipeline — measured 209 s at sf0.001. Session-
# local test bookkeeping only; consumers fall back to running fn()
# when a plan wasn't recorded (e.g. under -k selections).
SHARED_PLANS: dict[str, str] = {}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly; 0.0 == -0.0 normalized.
        if v == 0.0:
            v = 0.0
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canon_rows(columns, rows) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, duck_rel) -> tuple[bool, str, int]:
    """(ok, message, spark row count) — the count rides along so a
    caller that also needs non-vacuity doesn't re-execute the query."""
    sdf = spark_df.toPandas()
    n_spark = len(sdf)
    ddf = duck_rel.fetchdf()
    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    if s_cols != d_cols:
        return False, f"columns differ: spark={s_cols} duck={d_cols}", n_spark
    s_rows = canon_rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    d_rows = canon_rows(list(ddf.columns), ddf.itertuples(index=False, name=None))
    if len(s_rows) != len(d_rows):
        return (
            False,
            f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}",
            n_spark,
        )
    if s_rows != d_rows:
        diffs = [
            f"  spark={a}\n  duck ={b}"
            for a, b in zip(s_rows, d_rows)
            if a != b
        ][:5]
        return False, "value mismatch (first 5):\n" + "\n".join(diffs), n_spark
    return True, "ok", n_spark
