"""Grouped-aggregate pandas UDFs (Arrow-vectorized UDAFs).

NOTE: deliberately NO `from __future__ import annotations` here —
pandas_udf infers the UDAF eval type from live type hints, and
postponed (stringified) annotations break that inference.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def mad(v: pd.Series) -> float:
    """Median absolute deviation — robust dispersion with no Spark
    builtin. Arrow hands each group's column as one numpy vector;
    interpolated medians match DuckDB's native MAD."""
    arr = v.to_numpy(dtype="float64")
    return float(np.median(np.abs(arr - np.median(arr))))
