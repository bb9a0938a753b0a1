"""SURVEY §6 measurement: AQE skew-join WHEN IT ACTUALLY FIRES vs the
hot-only split (q_join_skew_split's shape) vs unsalted SMJ.

Round 4 measured AQE's skew-join never triggering at local scale — the
hot partition sat far under the 256 MB skewedPartitionThresholdInBytes
default — leaving open the question a 100 TB operator actually has:
when AQE *can* act, does its runtime split beat the explicit hot-only
split? This probe lowers the thresholds until the hot partition
qualifies (the local analog of a 100 TB hot key overflowing a real
256 MB partition), verifies `isSkew=true` in the final adaptive plan,
and times the three forms interleaved round-robin (per-variant minimum)
so host stalls cannot bias one variant.

Usage: python scripts/measure_skew_aqe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from breweries_case_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"
ROUNDS = 3
DIM_ROWS = 1000
HOT_PCT = 9  # 9 of 10 rows land on key 0


def build_fact(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    fact = (
        li.select("l_orderkey", "l_extendedprice")
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(16))))
        .withColumn(
            "k",
            F.when(
                (F.col("l_orderkey") + F.col("rep")) % 10 < HOT_PCT, F.lit(0)
            ).otherwise(
                F.pmod(F.hash("l_orderkey", "rep"), F.lit(DIM_ROWS - 1)) + 1
            ),
        )
        .select("k", "l_extendedprice")
        # 32 map tasks: AQE splits a skewed reduce partition at MAP-OUTPUT
        # granularity, so with the scan's natural 3 partitions the hot
        # partition has at most 3 candidate chunks and OptimizeSkewedJoin
        # refuses to mark it (measured: skew never fires at 3 mappers,
        # fires at 32) — the local analog of "few giant input files
        # starve AQE's skew mitigation"
        .repartition(32)
    )
    # materialize once so every variant times the JOIN, not the explode
    return fact.localCheckpoint()


def run_variant(spark, fact, dim, variant: str) -> tuple[float, bool]:
    base = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    }
    if variant == "aqe_fires":
        base.update(
            {
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.adaptive.skewJoin.enabled": "true",
                # lower the gates so the ~hundreds-of-MB-equivalent hot
                # partition qualifies at local scale: partition is skewed
                # if size > max(threshold, factor * median)
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
                # keep AQE from broadcasting the dim (we are measuring
                # the skew-split on a shuffle join)
                "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            }
        )
    saved = {}
    for k, v in base.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        if variant == "hot_split":
            hot = F.lit(0)  # the known hot key (found by q_skew_profile
            # in production; pinned here so all variants share the split)
            f_hot = fact.filter(F.col("k") == hot)
            f_cold = fact.filter(F.col("k") != hot)
            d_hot = dim.filter(F.col("k") == hot)
            joined = f_hot.join(F.broadcast(d_hot), "k").unionByName(
                f_cold.join(dim, "k")
            )
        else:
            joined = fact.join(dim, "k")
        agg = joined.agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice") * F.col("payload")).alias("s"),
        )
        t0 = time.perf_counter()
        agg.collect()
        wall = time.perf_counter() - t0
        plan = agg._jdf.queryExecution().executedPlan().toString()
        skew_fired = "skew=true" in plan or "AQEShuffleRead skewed" in plan
        return wall, skew_fired
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def main():
    spark = get_session(
        app_name="skew_aqe_probe",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    fact = build_fact(spark)
    n = fact.count()
    dim = spark.range(DIM_ROWS).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("payload")
    )
    variants = ["unsalted_smj", "aqe_fires", "hot_split"]
    best = {v: float("inf") for v in variants}
    fired = {}
    for _ in range(ROUNDS):
        for v in variants:
            wall, skew = run_variant(spark, fact, dim, v)
            best[v] = min(best[v], wall)
            fired[v] = skew
    print(
        json.dumps(
            {
                "fact_rows": n,
                "hot_share_pct": HOT_PCT * 10,
                "rounds": ROUNDS,
                "best_sec": {k: round(t, 2) for k, t in best.items()},
                "aqe_skew_fired": fired["aqe_fires"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
