"""Incremental materialized-view maintenance for the all-time gold rollup
(scale extension of the reference's daily gold recompute,
``src/processors/breweries_gold_processors.py:28-45``).

The medallion gold table is per-day (date in the group key), so each day
is an independent partition. An ALL-TIME rollup (no date key) is the view
that gets expensive at 100 TB: recomputing it daily rescans every
partition. This module maintains it incrementally — each day contributes
a small PARTIAL state, and states merge algebraically:

- ``row_count``: sums (trivially algebraic);
- distinct ids: NOT algebraic from per-day distinct counts (days overlap)
  — kept as a mergeable HyperLogLog sketch (Spark's built-in Apache
  DataSketches ``hll_sketch_agg`` / ``hll_union_agg``), the standard
  production representation for incrementally-maintained COUNT DISTINCT.

Daily cost becomes O(new partition) + a merge over ~|keys| state rows,
instead of O(all history). The trade is exactness of the distinct count
(~1% at lgConfigK=14); where exactness is required, keep the per-day
EXACT gold (this engine's ``silver_to_gold``) and treat this rollup as
the monitoring/serving view — or swap the sketch column for the id set
at O(ids) state size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_KEYS = ["brewery_type", "country"]
HLL_LG_K = 14  # 2^14 registers ≈ 0.8% relative error


def daily_partial(silver_day: DataFrame) -> DataFrame:
    """One day's silver rows → partial rollup state: exact row count +
    HLL sketch of ids per key. One aggregate over the NEW partition only."""
    return silver_day.groupBy(*ROLLUP_KEYS).agg(
        F.count("*").alias("row_count"),
        F.hll_sketch_agg("id", F.lit(HLL_LG_K)).alias("id_sketch"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Merge any number of partial states into one (associative +
    commutative — replays and out-of-order days converge to the same
    state). Input and output share one schema, so yesterday's persisted
    state merges with today's partial by union."""
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    return unioned.groupBy(*ROLLUP_KEYS).agg(
        F.sum("row_count").alias("row_count"),
        F.hll_union_agg("id_sketch", F.lit(False)).alias("id_sketch"),
    )


def finalize(state: DataFrame) -> DataFrame:
    """State → serving view: estimate the sketch, drop the binary column."""
    return state.select(
        *ROLLUP_KEYS,
        "row_count",
        F.hll_sketch_estimate("id_sketch").alias("approx_unique_ids"),
    )
