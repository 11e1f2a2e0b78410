"""U1 — the transform surface (SURVEY.md §2.9).

The reference's entire UDF system is 'run an arbitrary Python script
in a subprocess over the whole dataset serialized to JSON'
(/root/reference/src/etl.py:178-224, contract README.md:59-70). Here:

- `transform_pandas`: the idiomatic path — a user callable
  `fn(pdf, params) -> pdf` distributed via Arrow-batched mapInPandas.
  This is what new code should use; the pandas-facing semantics are
  exactly what the reference's script contract promised its scripts.
- `transform_script`: the compatibility shim — runs an UNMODIFIED
  reference transform script (env-var contract: TRANSFORM_DATA_PATH /
  TRANSFORM_RESULT_PATH / TRANSFORM_PARAMS, 300s timeout, identity
  when no result file) once per PARTITION instead of once per job.
  Scripts that are per-row/per-batch pure (the contract never promised
  cross-row state) distribute unchanged; the subprocess cost amortizes
  over a whole Arrow partition, not a row.

Output schemas must be declared (Spark needs them before execution);
`json_records_schema` helps derive one from a sample run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

TRANSFORM_TIMEOUT_SECONDS = 300  # reference etl.py:209


def transform_pandas(
    df: DataFrame,
    fn: Callable[..., Any],
    schema: T.StructType | str,
    params: dict[str, Any] | None = None,
) -> DataFrame:
    """Distribute `fn(pandas_df, params) -> pandas_df` over Arrow
    batches. Params pass by closure — no env-var round trip."""
    import pandas as pd  # noqa: F401

    p = params or {}

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        for pdf in batches:
            out = fn(pdf, p) if fn.__code__.co_argcount >= 2 else fn(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(run, schema)


def transform_script(
    df: DataFrame,
    script_path: str,
    schema: T.StructType | str,
    params: dict[str, Any] | None = None,
    timeout: int = TRANSFORM_TIMEOUT_SECONDS,
) -> DataFrame:
    """Compatibility shim for reference transform scripts, unmodified.

    Per partition: pandas batch → JSON records temp file →
    `python script` with the TRANSFORM_* env contract → JSON result
    (identity if the script writes none) → rows coerced to `schema`.

    The reference runs ONE subprocess over the whole dataset on one
    machine; this runs one per partition in parallel across executors —
    same contract, distributed. Scripts must be row-local (the contract
    offers no cross-partition channel, so any script valid under the
    reference's chunked mode already is).
    """
    import pandas as pd

    if not os.path.exists(script_path):
        raise FileNotFoundError(f"Transform script not found: {script_path}")
    with open(script_path, "rb") as f:
        script_source = f.read()
    params_json = json.dumps(params or {})
    names = [f.name for f in T._parse_datatype_string(schema).fields] if isinstance(
        schema, str
    ) else [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        with tempfile.TemporaryDirectory() as tmp:
            script_file = os.path.join(tmp, "transform.py")
            with open(script_file, "wb") as f:
                f.write(script_source)
            for i, pdf in enumerate(batches):
                data_path = os.path.join(tmp, f"in_{i}.json")
                result_path = data_path + ".result"
                pdf.to_json(data_path, orient="records")
                env = {
                    **os.environ,
                    "TRANSFORM_DATA_PATH": data_path,
                    "TRANSFORM_RESULT_PATH": result_path,
                    "TRANSFORM_PARAMS": params_json,
                }
                proc = subprocess.run(
                    [sys.executable, script_file],
                    env=env,
                    capture_output=True,
                    text=True,
                    timeout=timeout,
                )
                if proc.returncode != 0:
                    raise RuntimeError(f"Transform script failed: {proc.stderr}")
                if os.path.exists(result_path):
                    with open(result_path) as f:
                        records = json.load(f)
                    out = pd.DataFrame.from_records(records)
                else:  # identity per the reference contract (etl.py:219-221)
                    out = pdf
                for p in (data_path, result_path):
                    if os.path.exists(p):
                        os.unlink(p)
                if len(out):
                    # schema-align: add missing columns, order, drop extras
                    for c in names:
                        if c not in out.columns:
                            out[c] = None
                    yield out[names]

    return df.mapInPandas(run, schema)


def json_records_schema(df: DataFrame, extra_fields: list[T.StructField]) -> T.StructType:
    """Input schema + declared extra columns — the common case where a
    script adds fields (e.g. processed_at) to each record."""
    return T.StructType(list(df.schema.fields) + extra_fields)
