"""Python UDTFs — the table-generating UDF surface.

The reference has no UDTFs (SURVEY.md §2.9); Spark 4 makes them a
first-class lateral-join citizen. One production-shaped example: a
sentence splitter whose regex contract is deliberately RE2-safe so
the DuckDB oracle (`regexp_split_to_array`) computes the identical
split — a UDTF whose output is still exactly SQL-checkable.

UDTFs run row-at-a-time in Python: keep them for genuinely
one-to-many generation with per-row logic; for pure splits at 100 TB
prefer the JVM explode form (queries/curation.py doc_chunks). This
module exists to cover the API surface and its gate query proves the
wiring, not to replace explode.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

SENT_SPLIT = r"\.\s+"  # RE2-compatible: identical in python re and DuckDB


@udtf(returnType="sent_id int, sentence string, sent_chars int")
class SplitSentences:
    """text → one row per '.'-terminated sentence with its index."""

    def eval(self, text: str):
        if text is None:
            return
        for i, s in enumerate(re.split(SENT_SPLIT, text)):
            yield i, s, len(s)


def register_udtfs(spark) -> None:
    spark.udtf.register("split_sentences", SplitSentences)
    spark.udtf.register("parse_props", udtf(ParseProps))


class ParseProps:
    """Polymorphic UDTF (Spark 4 `analyze()`): output schema computed
    at ANALYSIS time from the constant key-list argument — one INT
    value column and one BOOLEAN presence column per requested key.
    The engine-side contract (schema fixed before execution, derived
    from arguments) is what makes a dynamic parser plannable: Catalyst
    sees real columns, so downstream pruning/filtering still works.

    Kept row-at-a-time Python deliberately (the API surface under
    test); the JVM path for this job is `from_json`/`variant_get`
    (queries/round2.py events_props_variant)."""

    @staticmethod
    def analyze(props, keys):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import BooleanType, IntegerType, StructType

        if not isinstance(keys.value, str):
            raise Exception("keys must be a constant string")  # noqa: TRY002
        schema = StructType()
        for k in keys.value.split(","):
            schema = schema.add(k, IntegerType()).add(f"{k}_present", BooleanType())
        return AnalyzeResult(schema=schema)

    def eval(self, props: str, keys: str):
        import json

        try:
            d = json.loads(props) if props else {}
        except ValueError:
            d = {}
        row = []
        for k in keys.split(","):
            v = d.get(k)
            row += [int(v) if isinstance(v, (int, float)) else None, k in d]
        yield tuple(row)
