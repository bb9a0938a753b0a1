"""Seeded brute-force cross-check for the two-tier capped hamming core
(the excision family's randomized-reference discipline, applied to the
r10 perceptual blocker): on random clustered 64-bit hash populations,
``hamming_near_pairs`` at the production cap must equal the pure-Python
all-pairs reference exactly — pairs AND distances."""

from __future__ import annotations

import random

from pyspark.sql import functions as F  # noqa: F401 (parity of imports)


def _gen_population(seed: int, n_clusters: int = 6, spread: int = 5):
    """Clustered hash population: a few base hashes, members at 0-4
    random bit flips (straddling the hamming-3 threshold), plus exact
    copies — the constant-hash + near-miss structure the two tiers
    split."""
    rng = random.Random(seed)
    rows = []
    mid = 0
    for _ in range(n_clusters):
        base = rng.getrandbits(64)
        for _ in range(spread):
            flips = rng.randint(0, 4)
            h = base
            for _ in range(flips):
                h ^= 1 << rng.randrange(64)
            rows.append((mid, (h >> 32) & 0xFFFFFFFF, h & 0xFFFFFFFF))
            mid += 1
        # exact duplicates of the base (tier-1 fodder)
        for _ in range(rng.randint(0, 2)):
            rows.append(
                (mid, (base >> 32) & 0xFFFFFFFF, base & 0xFFFFFFFF)
            )
            mid += 1
    return rows


def _brute(rows, hmax):
    out = {}
    for i, (ma, hia, loa) in enumerate(rows):
        for mb, hib, lob in rows[i + 1 :]:
            d = bin(hia ^ hib).count("1") + bin(loa ^ lob).count("1")
            if d <= hmax:
                out[(min(ma, mb), max(ma, mb))] = d
    return out


def test_hamming_near_pairs_matches_bruteforce(spark):
    from breweries_case_spark.operators.multimodal import (
        IMG_HAMMING_MAX,
        hamming_near_pairs,
    )

    for seed in (7, 41, 1337):
        rows = _gen_population(seed)
        expect = _brute(rows, IMG_HAMMING_MAX)
        df = spark.createDataFrame(
            rows, "media_id long, hash_hi long, hash_lo long"
        )
        got = {
            (r.media_id_a, r.media_id_b): r.hamming
            for r in hamming_near_pairs(df).collect()
        }
        assert got == expect, f"seed {seed}: {len(got)} vs {len(expect)}"
