"""Z-order (Morton) keys — multi-dimension clustering for layout.

Single-column sort clusters one dimension; a Morton key interleaves
the bits of two columns so that sorting by it co-locates rows close
in BOTH dimensions — parquet min/max stats then skip effectively for
predicates on either column. This is the data-skipping layout Delta's
Z-ORDER provides, expressed as a plain column you can
`sortWithinPartitions` by (sources/layout.py) on vanilla parquet.

Pure bit arithmetic on JVM expressions — no UDF; and the expression
is mirrored verbatim in SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton2(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` of two non-negative ints: result bit
    2i is x's bit i, bit 2i+1 is y's bit i. Callers range-reduce
    (e.g. `% 1024`) to the bit budget first."""
    xl, yl = x.cast("long"), y.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def morton2_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as engine-portable SQL (DuckDB oracle)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({x} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({y} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)
