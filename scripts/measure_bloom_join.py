"""SURVEY §6 measurement: Spark's runtime bloom-filter join pruning
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) — the semi-join
reduction that matters most at 100 TB, where a selective dim filter
should prune the FACT side's shuffle before it happens.

Shape: lineitem ⋈ a filtered orders slice (selective predicate on the
dim side), forced sort-merge so both sides shuffle. With the bloom
filter on, Spark injects `might_contain(bloom_agg(o_orderkey))` into the
lineitem scan/shuffle, so non-matching fact rows are dropped BEFORE the
exchange — the runtime analog of a broadcast semi-join, usable when the
dim slice is too big to broadcast. Variants interleaved round-robin,
per-variant minimum; the injected filter is verified in the final plan.

Usage: PYTHONPATH=. python scripts/measure_bloom_join.py
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from breweries_case_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"
ROUNDS = 3
# selective dim predicate: ~2% of orders
DIM_PRED = "o_orderpriority = '1-URGENT' AND o_totalprice > 250000"
#: fact row multiplier — at plain sf0.1 (600k rows) the pruning saves
#: less than the filter costs; the ×16 replica (9.6M rows) is where the
#: fact shuffle becomes the bottleneck the bloom filter exists to cut
FACT_REPLICAS = 16


def build_fact(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    return (
        li.select("l_orderkey", "l_extendedprice")
        .withColumn(
            "rep", F.explode(F.sequence(F.lit(1), F.lit(FACT_REPLICAS)))
        )
        .drop("rep")
        .repartition(32)
        .localCheckpoint()
    )


def run_variant(spark, fact, variant: str) -> tuple[float, bool]:
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": str(
            variant == "bloom_on"
        ).lower(),
        # creationSideThreshold is a CEILING (the bloom filter is built
        # only when the creation side's estimated size is UNDER it) —
        # raise it from the 10MB default so the filtered dim still
        # qualifies if stats overestimate it
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(DIM_PRED)
        agg = (
            fact.join(o, fact.l_orderkey == o.o_orderkey)
            .agg(
                F.count("*").alias("n"),
                F.sum("l_extendedprice").alias("s"),
            )
        )
        t0 = time.perf_counter()
        agg.collect()
        wall = time.perf_counter() - t0
        plan = agg._jdf.queryExecution().executedPlan().toString()
        injected = "might_contain" in plan or "bloom_filter_agg" in plan
        return wall, injected
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def main():
    spark = get_session(
        app_name="bloom_probe",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    fact = build_fact(spark)
    n = fact.count()
    variants = ["bloom_off", "bloom_on"]
    best = {v: float("inf") for v in variants}
    injected = {}
    for _ in range(ROUNDS):
        for v in variants:
            wall, inj = run_variant(spark, fact, v)
            best[v] = min(best[v], wall)
            injected[v] = inj
    print(
        json.dumps(
            {
                "fact_rows": n,
                "rounds": ROUNDS,
                "best_sec": {k: round(t, 2) for k, t in best.items()},
                "bloom_injected": injected,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
