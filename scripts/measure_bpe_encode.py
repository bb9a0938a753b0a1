"""SURVEY §6 measurement: q_bpe_encode per-merge cost stays scan-bound.

The encode runs the q_bpe_train_k loop and publishes the final stream.
Claim: wall grows (sub-)linearly with the merge count k — each round
adds ONE scan of a SHRINKING checkpointed stream plus one
vocabulary-bounded pair-count exchange (measured bounded per round in
measure_bpe_train_rounds.py), and the final posexplode rides the last
checkpoint's scan stage. If any round re-derived earlier folds
(lineage blow-up) the wall would grow super-linearly in k.

Usage: PYTHONPATH=. python scripts/measure_bpe_encode.py
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from breweries_case_spark.operators.text import bpe_merge_fold
from breweries_case_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"
REPEATS = 3


def encode_wall(spark, k: int) -> tuple[float, int]:
    walls = []
    n_final = 0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        toks = F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda x: x != F.lit(""),
        )
        cur = d.select("doc_id", toks.alias("t"))
        for _r in range(k):
            ln = F.greatest(F.size("t") - 1, F.lit(0))
            pairs = F.arrays_zip(
                F.slice(F.col("t"), 1, ln).alias("l"),
                F.slice(F.col("t"), 2, ln).alias("r"),
            )
            top1 = (
                cur.select(F.explode(pairs).alias("p"))
                .groupBy(
                    F.col("p.l").alias("left_tok"),
                    F.col("p.r").alias("right_tok"),
                )
                .agg(F.count("*").alias("pair_count"))
                .orderBy(
                    F.col("pair_count").desc(), "left_tok", "right_tok"
                )
                .limit(1)
                .select("left_tok", "right_tok")
            )
            cur = (
                cur.crossJoin(F.broadcast(top1))
                .select(
                    "doc_id",
                    bpe_merge_fold(
                        F.col("t"), F.col("left_tok"), F.col("right_tok")
                    ).alias("t"),
                )
                .localCheckpoint()
            )
        n_final = (
            cur.select(F.posexplode(F.col("t")).alias("pos0", "tok"))
            .count()
        )
        walls.append(time.perf_counter() - t0)
    return round(min(walls), 3), n_final


def main():
    spark = get_session(
        app_name="bpe_encode_probe",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    out = {}
    for k in (1, 2, 4):
        wall, n_final = encode_wall(spark, k)
        out[f"k{k}_wall_s"] = wall
        out[f"k{k}_final_tokens"] = n_final
    out["wall_growth_k1_to_k4"] = round(
        out["k4_wall_s"] / out["k1_wall_s"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
