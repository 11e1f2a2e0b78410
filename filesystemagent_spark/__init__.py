"""filesystemagent_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference agent (WolffM/fileSystemAgent, surveyed
in SURVEY.md) as an idiomatic Spark DataFrame/SQL engine, extended
with the operators a large-scale training-data pipeline needs
(dedup, similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7.1):
- batch-first on DataFrames; declarative plans so Catalyst optimizes
  (pushdown, pruning, join selection, AQE) instead of hand-scheduling;
- explicit StructType schemas for every entity;
- built-in `pyspark.sql.functions` in the hot path; Pandas UDFs only
  where JVM expressions genuinely cannot express the semantics;
- every operator designed for a 1000-executor / 100 TB deployment even
  though tests run on local[32].
"""

__version__ = "0.1.0"

from filesystemagent_spark.session import get_spark  # noqa: F401
from filesystemagent_spark.catalog import Catalog  # noqa: F401
