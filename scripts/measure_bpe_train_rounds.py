"""SURVEY §6 measurement: q_bpe_train_k's per-ROUND shuffle claim.

measure_bpe_scaling.py proves the count step's exchange is bounded by
per-mapper vocabulary for the RAW stream (round 1). The training loop's
additional claim is that this holds at EVERY round — the merged stream
feeding round k has one more vocabulary symbol ("L R") and fewer
tokens, so its pair-partial exchange must stay vocabulary-bounded too.
Measured here for round 2: apply round 1's winning merge (the same
bpe_merge_fold the operator runs), then count the distinct
(mapper partition, left, right) partial rows its count step ships, at
1× vs 4× corpus replicas (same vocabulary, 4× tokens).

Usage: PYTHONPATH=. python scripts/measure_bpe_train_rounds.py
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from breweries_case_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"
ROUNDS = 3
REPLICAS = 4


def build_tokens(spark, replicas: int):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    if replicas > 1:
        d = d.withColumn(
            "rep", F.explode(F.sequence(F.lit(1), F.lit(replicas)))
        ).select("text")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    return d.select(toks.alias("t")).repartition(32).localCheckpoint()


def merged_stream(base):
    """Apply round 1's winning merge — one full loop iteration."""
    from breweries_case_spark.operators.text import bpe_merge_fold

    ln = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(F.col("t"), 1, ln).alias("l"),
        F.slice(F.col("t"), 2, ln).alias("r"),
    )
    top1 = (
        base.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left_tok"), F.col("p.r").alias("right_tok"))
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "left_tok", "right_tok")
        .limit(1)
        .select("left_tok", "right_tok")
    )
    return (
        base.crossJoin(F.broadcast(top1))
        .select(
            bpe_merge_fold(
                F.col("t"), F.col("left_tok"), F.col("right_tok")
            ).alias("t")
        )
        .localCheckpoint()
    )


def count_step(d):
    ln = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(F.col("t"), 1, ln).alias("l"),
        F.slice(F.col("t"), 2, ln).alias("r"),
    )
    return (
        d.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "l", "r")
        .limit(20)
    )


def partial_rows(d) -> int:
    ln = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(F.col("t"), 1, ln).alias("l"),
        F.slice(F.col("t"), 2, ln).alias("r"),
    )
    return (
        d.select(
            F.spark_partition_id().alias("pid"), F.explode(pairs).alias("p")
        )
        .select("pid", "p.l", "p.r")
        .distinct()
        .count()
    )


def main() -> None:
    spark = get_session(
        app_name="bpe_train_rounds_probe",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    out = {}
    streams = {}
    for rep in (1, REPLICAS):
        streams[rep] = merged_stream(build_tokens(spark, rep))
    walls = {rep: [] for rep in streams}
    for _ in range(ROUNDS):
        for rep, d in streams.items():
            t0 = time.perf_counter()
            count_step(d).collect()
            walls[rep].append(time.perf_counter() - t0)
    for rep, d in streams.items():
        q = count_step(d)
        q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "partial_count" in plan, plan[:2000]
        out[f"{rep}x"] = {
            "round2_tokens": int(
                d.select(F.sum(F.size("t")).alias("n")).collect()[0]["n"]
            ),
            "round2_partial_rows_into_exchange": partial_rows(d),
            "best_wall_sec": round(min(walls[rep]), 3),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
