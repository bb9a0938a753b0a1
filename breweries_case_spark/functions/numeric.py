"""Numeric aggregate helpers with oracle-stable semantics.

Summing IEEE doubles is order-dependent; Spark's shuffle order and DuckDB's
scan order differ, so ``SUM(double)`` can diverge in the last ulp and break
value-hash comparison. The fix: round each addend to a fixed decimal scale
(deterministic per value), sum exactly in decimal, and cast the final result
back to double. Both engines then produce bit-identical results regardless
of addition order. Oracle twin:
``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.

This is an oracle-determinism device, not a scale compromise — decimal sums
are still partial-aggregated map-side and codegen'd by Spark.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decimal_sum(col: Column, scale: int = 2) -> Column:
    """Order-insensitive sum of a double column (see module docstring)."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def decimal_avg(col: Column, scale: int = 6) -> Column:
    """Order-insensitive average: exact decimal sum / count, rounded to
    ``scale`` digits then cast to double.

    Oracle twin: ``CAST(ROUND(SUM(CAST(x AS DECIMAL(18,6))) / COUNT(x), s)
    AS DOUBLE)``.
    """
    total = F.sum(col.cast("decimal(18,6)"))
    return F.round(total / F.count(col), scale).cast("double")
