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

r10 extends the probe to the TWO-TIER CAPPED core (the r9 verdict's
last named scale-killer): `r9_candidate_pairs` is the per-MEDIA banded
join the r9 plan ran; `tier2_candidate_pairs` is what the r10 plan
feeds its verify — banding over DISTINCT hashes only, band df capped
at BAND_DF_CAP. The `const_*` block crafts the verdict's named
pathology (a constant-hash population — black frames/silence — K then
2K media with ONE shared hash value beside a fixed diverse tail): the
r9 blocker's candidate stage grows ≈ 4× at 2× media (`const_r9_cand_
growth`, the C(df,2) bucket), while the r10 tier-2 candidate stage is
FLAT (`const_tier2_cand_growth` = 1.0 — the population collapses to a
single distinct hash before banding, and its pairs route through the
hamming-0 equi-join whose volume IS the true output).

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

    from breweries_case_spark.operators.multimodal import (
        BAND_DF_CAP,
        _band_structs,
        _HASH_BANDS,
    )

    def _tier2_cands(h, cap=BAND_DF_CAP):
        """The r10 plan's tier-2 candidate stage: distinct hashes →
        df≤cap bands → self-join (distinct hash-value pairs)."""
        dist = h.select("hash_hi", "hash_lo").distinct().localCheckpoint()
        bands = dist.select(
            "hash_hi",
            "hash_lo",
            F.explode(F.array(*_band_structs(_HASH_BANDS))).alias("b"),
        ).select(
            "hash_hi",
            "hash_lo",
            F.col("b.band_idx").alias("bi"),
            F.col("b.band_val").alias("bv"),
        )
        rare = (
            bands.groupBy("bi", "bv")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= cap)
            .select("bi", "bv")
        )
        rb = bands.join(rare, ["bi", "bv"], "left_semi")
        lt = F.struct(F.col("a.hash_hi"), F.col("a.hash_lo")) < F.struct(
            F.col("b.hash_hi"), F.col("b.hash_lo")
        )
        return (
            rb.alias("a")
            .join(
                rb.alias("b"),
                (F.col("a.bi") == F.col("b.bi"))
                & (F.col("a.bv") == F.col("b.bv"))
                & lt,
            )
            .select("a.hash_hi", "a.hash_lo", "b.hash_hi", "b.hash_lo")
            .distinct()
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
        out[f"{tag}_r9_candidate_pairs"] = cand.count()
        out[f"{tag}_tier2_candidate_pairs"] = _tier2_cands(h).count()
        out[f"{tag}_candidate_pairs"] = out[f"{tag}_r9_candidate_pairs"]
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
    out["tier2_cand_growth"] = round(
        out["full_tier2_candidate_pairs"]
        / max(out["half_tier2_candidate_pairs"], 1),
        2,
    )

    # the r9 verdict's named pathology: a constant-hash population (K,
    # then 2K media sharing ONE hash) beside a fixed 64-hash diverse
    # tail. r9 candidate stage: the shared hash's 4 identical bands
    # make a C(K,2) bucket (quadratic). r10 tier-2: the population is
    # ONE distinct hash — its bands carry df 1 and its pairs live in
    # the hamming-0 equi-join (output-bound by definition).
    K = 2000
    for mult, tag in ((1, "const_half"), (2, "const_full")):
        n = K * mult
        const = spark.range(n).select(
            F.col("id").alias("media_id"),
            F.lit(0xDEAD).cast("long").alias("hash_hi"),
            F.lit(0xBEEF).cast("long").alias("hash_lo"),
        )
        tail = spark.range(64).select(
            (F.col("id") + 1_000_000).alias("media_id"),
            (F.col("id") * 1315423911 % 4294967296).alias("hash_hi"),
            (F.col("id") * 2654435761 % 4294967296).alias("hash_lo"),
        )
        h = const.unionByName(tail).localCheckpoint()
        b = _bands(h)
        r9_cand = (
            b.alias("a")
            .join(
                b.alias("b"),
                (F.col("a.bi") == F.col("b.bi"))
                & (F.col("a.bv") == F.col("b.bv"))
                & (F.col("a.media_id") < F.col("b.media_id")),
            )
            .select("a.media_id", "b.media_id")
            .distinct()
        )
        out[f"{tag}_media"] = n + 64
        out[f"{tag}_r9_candidate_pairs"] = r9_cand.count()
        out[f"{tag}_tier2_candidate_pairs"] = _tier2_cands(h).count()
    out["const_r9_cand_growth"] = round(
        out["const_full_r9_candidate_pairs"]
        / max(out["const_half_r9_candidate_pairs"], 1),
        2,
    )
    out["const_tier2_cand_growth"] = round(
        out["const_full_tier2_candidate_pairs"]
        / max(out["const_half_tier2_candidate_pairs"], 1),
        2,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
