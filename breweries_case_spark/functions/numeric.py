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
    """Order-insensitive average: exact decimal sum, then ONE double
    division, rounded to ``scale`` digits by the identical IEEE
    expression ``FLOOR(q·10^s + 0.5)/10^s`` on both engines.

    Why not engine ROUND: DuckDB types ``SUM(DECIMAL)/COUNT`` as double,
    and the two engines' ROUND(double) disagree exactly when the
    quotient's SHORTEST decimal repr terminates in a half one digit past
    the rounding scale — Spark rounds the shortest repr (BigDecimal
    .valueOf: "0.0315315" → tie → HALF_UP → 0.031532) while DuckDB
    rounds the true binary value (0.03153149999… → 0.031531). Averages
    of 6-decimal-quantized sums over small counts hit this (seen on
    q_ngram_lm_score: S=0.378378/n=12; q_sim_centroid's −0.0008235 is
    the decimal-division variant of the same bug). floor/multiply/add
    are single correctly-rounded IEEE ops, so the expression is
    bit-identical cross-engine; its tie rule is half-toward-+inf at the
    representable-double level — a documented contract, applied to both
    twins.

    Oracle twin:
    ``CAST(FLOOR(SUM(CAST(x AS DECIMAL(18,6))) / COUNT(x) * 1e0S + 0.5)
    / 1e0S AS DOUBLE)`` with ``1e0S`` = 10^scale written as a double
    literal (DuckDB's decimal/count division is already double).
    """
    total = F.sum(col.cast("decimal(18,6)")).cast("double")
    p = F.lit(float(10**scale))
    return (F.floor(total / F.count(col) * p + F.lit(0.5)) / p).cast("double")
