"""Adaptive Query Execution engagement proofs. The engine's 100 TB stance
leans on AQE for runtime re-planning (SURVEY §4, §6: skew study, prod
session config) — these tests pin that the lean is real, not aspirational:
on this Spark build AQE actually (a) converts a sort-merge join to a
broadcast join when runtime stats reveal a small side the static planner
could not see, and (b) coalesces an over-partitioned exchange down to the
data's actual size. The test session runs with AQE OFF (reference pytest
convention), so each test flips it on and restores every touched conf."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **settings):
    saved = {}
    for k, v in settings.items():
        key = k.replace("__", ".")
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in saved.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _final_plan(df) -> str:
    # collect() executes THIS DataFrame's queryExecution (a noop write
    # would execute a copied plan, leaving this one isFinalPlan=false)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_converts_smj_to_broadcast_at_runtime(spark, sf_dir):
    """Static planning cannot broadcast (threshold -1 disables it); the
    filtered dim side is only revealed small by runtime shuffle stats.
    AQE's join re-optimization must pick BroadcastHashJoin in the FINAL
    adaptive plan."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    with _confs(
        spark,
        spark__sql__adaptive__enabled="true",
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__autoBroadcastJoinThreshold="10485760",
    ):
        small = customer.filter(F.col("c_custkey") % 50 == 0)
        j = orders.join(small, orders.o_custkey == small.c_custkey).select(
            "o_orderkey", "c_custkey"
        )
        plan = _final_plan(j)
    assert "AdaptiveSparkPlan" in plan and "isFinalPlan=true" in plan
    # the adaptive string prints final plan first, then "== Initial
    # Plan ==" — the SMJ may only appear in the initial section
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final, final
    assert "SortMergeJoin" not in final, final


def test_aqe_coalesces_overpartitioned_shuffle(spark, sf_dir):
    """A 200-partition shuffle over kilobytes of data must come back
    coalesced: the final plan's AQEShuffleRead collapses it toward the
    data's real size instead of scheduling 200 near-empty tasks."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with _confs(
        spark,
        spark__sql__adaptive__enabled="true",
        spark__sql__adaptive__coalescePartitions__enabled="true",
        spark__sql__shuffle__partitions="200",
    ):
        agg = orders.groupBy("o_orderpriority").agg(
            F.count("*").alias("n")
        )
        plan = _final_plan(agg)
        n_parts = agg.rdd.getNumPartitions()
    assert "AdaptiveSparkPlan" in plan
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan
    assert n_parts < 200, n_parts
