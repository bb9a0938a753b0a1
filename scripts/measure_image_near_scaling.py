"""SURVEY §6 measurement: banded perceptual-hash blocker scaling.

q_dedup_image_near blocks on 4×16-bit aHash bands (pigeonhole-lossless
at hamming ≤ 3). Claim: candidate volume tracks the TRUE near-dup
density, not |images|² — per band value the bucket holds only the
images sharing that exact 16-bit slice. Measured half vs full sf0.1
image population: distinct candidate pairs into the verify join, true
pairs out, and wall. On this deliberately dense synthetic population
(linear pixel ramps → clustered hashes) candidates grow with the true
pair count; candidates/true ratio ≈ constant is the banded-blocker
signature (an all-pairs blocker's ratio would grow ∝ docs²/true).

Usage: PYTHONPATH=. python scripts/measure_image_near_scaling.py
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from breweries_case_spark.operators.multimodal import (
    image_hashes,
)
from breweries_case_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"
ROUNDS = 2


def _hashes(spark, half: bool):
    h = image_hashes(spark, SF_DIR).select(
        "media_id",
        F.col("ahash_hi").alias("hash_hi"),
        F.col("ahash_lo").alias("hash_lo"),
    )
    if half:
        n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        h = h.filter(F.col("media_id") < n // 2)
    return h.localCheckpoint()


def _bands(h):
    return h.select(
        "media_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("bi"), F.shiftright("hash_hi", 16).alias("bv")),
                F.struct(F.lit(1).alias("bi"), (F.col("hash_hi").bitwiseAND(F.lit(65535))).alias("bv")),
                F.struct(F.lit(2).alias("bi"), F.shiftright("hash_lo", 16).alias("bv")),
                F.struct(F.lit(3).alias("bi"), (F.col("hash_lo").bitwiseAND(F.lit(65535))).alias("bv")),
            )
        ).alias("b"),
    ).select("media_id", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))


def main():
    spark = get_session(
        app_name="image_near_scaling_probe",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    from breweries_case_spark.operators.multimodal import (
        hamming_near_pairs,
    )

    out = {}
    for half, tag in ((True, "half"), (False, "full")):
        h = _hashes(spark, half)
        out[f"{tag}_images"] = h.count()
        b = _bands(h)
        a2, b2 = b.alias("a"), b.alias("b")
        cand = (
            a2.join(
                b2,
                (F.col("a.bi") == F.col("b.bi"))
                & (F.col("a.bv") == F.col("b.bv"))
                & (F.col("a.media_id") < F.col("b.media_id")),
            )
            .select("a.media_id", "b.media_id")
            .distinct()
        )
        out[f"{tag}_candidate_pairs"] = cand.count()
        walls = []
        true_n = None
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            res = hamming_near_pairs(h)
            true_n = res.count()
            walls.append(time.perf_counter() - t0)
        out[f"{tag}_true_pairs"] = true_n
        out[f"{tag}_wall_s"] = round(min(walls), 3)
        out[f"{tag}_cand_per_true"] = round(
            out[f"{tag}_candidate_pairs"] / max(true_n, 1), 2
        )
    out["docs_growth"] = round(out["full_images"] / out["half_images"], 2)
    out["cand_growth"] = round(
        out["full_candidate_pairs"] / max(out["half_candidate_pairs"], 1), 2
    )
    out["true_growth"] = round(
        out["full_true_pairs"] / max(out["half_true_pairs"], 1), 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
