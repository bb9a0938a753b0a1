"""SURVEY §6 measurement: month-grid interval-overlap join vs the
join-free sweep line, at sf0.1 and with 8x-stretched intervals.

The grid join's cost is Σ_cell df² (join candidates per (suppkey,
month) cell) plus the explode fanout (cells per interval); the sweep is
2n event rows + one sort per supplier regardless of interval length.
Stretching every transit interval 8x (24-184 days, spanning 2-7 month
cells) is the "hot cell" regime the grid is vulnerable to — per-cell
density multiplies while the sweep's event count is unchanged. This
probe times both forms on both regimes (interleaved rounds, per-variant
minima) and sanity-checks that sweep >= grid per supplier (the sweep
counts duplicate-(orderkey,linenumber)-key pairs the grid's strict pk
order skips — see q_join_interval_sweep's docstring).

Usage: PYTHONPATH=. python scripts/measure_interval_sweep.py
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from breweries_case_spark.io.reader import load_table
from breweries_case_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"
ROUNDS = 3


def _intervals(spark, stretch: int):
    return load_table(spark, SF_DIR, "lineitem").select(
        (F.col("l_orderkey") * F.lit(8) + F.col("l_linenumber")).alias("pk"),
        "l_suppkey",
        "l_shipdate",
        F.date_add(
            F.col("l_shipdate"),
            ((F.col("l_partkey") % 21 + 3) * stretch).cast("int"),
        ).alias("l_receiptdate"),
    )


def grid(spark, stretch: int):
    mi = lambda c: (F.year(c) * 12 + F.month(c) - 1).cast("int")  # noqa: E731
    li = _intervals(spark, stretch)
    binned = li.withColumn(
        "m",
        F.explode(
            F.sequence(mi(F.col("l_shipdate")), mi(F.col("l_receiptdate")))
        ),
    )
    a, b = binned.alias("a"), binned.alias("b")
    first_shared_cell = F.col("a.m") == mi(
        F.greatest(F.col("a.l_shipdate"), F.col("b.l_shipdate"))
    )
    pairs = a.join(
        b,
        (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
        & (F.col("a.m") == F.col("b.m"))
        & (F.col("a.pk") < F.col("b.pk"))
        & (F.col("a.l_shipdate") <= F.col("b.l_receiptdate"))
        & (F.col("b.l_shipdate") <= F.col("a.l_receiptdate"))
        & first_shared_cell,
    )
    return pairs.groupBy(F.col("a.l_suppkey").alias("l_suppkey")).agg(
        F.count("*").alias("overlapping_pairs")
    )


def sweep(spark, stretch: int):
    li = _intervals(spark, stretch)
    starts = li.select(
        "l_suppkey",
        F.col("l_shipdate").alias("t"),
        F.lit(0).alias("typ"),
        "pk",
        F.lit(1).alias("delta"),
    )
    ends = li.select(
        "l_suppkey",
        F.col("l_receiptdate").alias("t"),
        F.lit(1).alias("typ"),
        "pk",
        F.lit(-1).alias("delta"),
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("t", "typ", "pk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        starts.unionAll(ends)
        .withColumn("o", F.sum("delta").over(w))
        .filter(F.col("typ") == 0)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("o") - F.lit(1)).alias("overlapping_pairs"))
        .filter(F.col("overlapping_pairs") > 0)
    )


def main():
    spark = get_session(
        app_name="interval_sweep_probe",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    variants = {
        "grid_1x": lambda: grid(spark, 1),
        "sweep_1x": lambda: sweep(spark, 1),
        "grid_8x": lambda: grid(spark, 8),
        "sweep_8x": lambda: sweep(spark, 8),
    }
    # correctness sanity on both regimes before timing
    for s in (1, 8):
        g = {r.l_suppkey: r.overlapping_pairs for r in grid(spark, s).collect()}
        sw = {
            r.l_suppkey: r.overlapping_pairs for r in sweep(spark, s).collect()
        }
        assert set(g) <= set(sw), s
        assert all(sw[k] >= g[k] for k in g), s
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(ROUNDS):
        for name, build in variants.items():
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    out = {name: round(min(ts), 3) for name, ts in times.items()}
    out["speedup_1x"] = round(out["grid_1x"] / out["sweep_1x"], 2)
    out["speedup_8x"] = round(out["grid_8x"] / out["sweep_8x"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
