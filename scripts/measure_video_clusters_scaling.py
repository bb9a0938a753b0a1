"""SURVEY §6 measurement: video set-collapse scaling (r11).

q_dedup_video_clusters collapses videos by their FULL distinct
fingerprint set before any pairing. Claim: a re-upload population (K
copies of the same clip) is ONE representative node, so the pair join
and component fixpoint are sized by fingerprint-set DIVERSITY, not by
media count — where the pairs contract (q_dedup_video_frames) owes
C(K, 2) rows per clique.

Probe: the sf0.1 video fingerprint inventory, then the same inventory
with every video DUPLICATED as a new media_id carrying an identical
fingerprint set (2× media, same set diversity — the re-upload shape).
Measured per scale: media, distinct-set representatives, pair rows the
PAIRS contract owes, edges the rep-level join feeds the fixpoint, and
cluster-output rows. rep_growth ≈ 1.0 and rep_edges flat while
pairs-contract rows jump ~4× is the collapse signature.

Usage: PYTHONPATH=. python scripts/measure_video_clusters_scaling.py
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from breweries_case_spark.operators.multimodal import (
    VIDEO_SHARED_MIN,
    video_fingerprints,
    video_shared_pairs,
)
from breweries_case_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"


def _measure(fp):
    fp = fp.localCheckpoint()
    media = fp.select("media_id").distinct().count()
    sets = fp.groupBy("media_id").agg(
        F.sort_array(F.collect_list(F.struct("hash_hi", "hash_lo"))).alias(
            "fps"
        )
    )
    big = sets.filter(F.size("fps") >= VIDEO_SHARED_MIN)
    reps = big.groupBy("fps").agg(F.min("media_id").alias("rep"))
    n_reps = reps.count() + sets.filter(
        F.size("fps") < VIDEO_SHARED_MIN
    ).count()
    # what the PAIRS contract owes at this scale
    pair_rows = video_shared_pairs(fp).count()
    # what the rep-level fixpoint consumes
    rep_fp = fp.join(
        reps.select(F.col("rep").alias("media_id")), "media_id", "left_semi"
    ).localCheckpoint()
    rep_edges = video_shared_pairs(rep_fp).count()
    return {
        "media": media,
        "reps": n_reps,
        "pairs_contract_rows": pair_rows,
        "rep_edges": rep_edges,
    }


def main() -> None:
    spark = get_session("measure_video_clusters")
    spark.sparkContext.setLogLevel("ERROR")
    base_fp = video_fingerprints(spark, SF_DIR).localCheckpoint()
    one = _measure(base_fp)
    # duplicate every video as a new media id with the SAME set
    offset = 10_000_000
    dup = base_fp.select(
        (F.col("media_id") + F.lit(offset)).alias("media_id"),
        "hash_hi",
        "hash_lo",
    )
    two = _measure(base_fp.unionByName(dup))
    out = {
        "one": one,
        "two": two,
        "media_growth": round(two["media"] / one["media"], 2),
        "rep_growth": round(two["reps"] / one["reps"], 2),
        "pairs_contract_growth": round(
            two["pairs_contract_rows"] / max(one["pairs_contract_rows"], 1), 2
        ),
        "rep_edge_growth": round(
            two["rep_edges"] / max(one["rep_edges"], 1), 2
        ),
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
