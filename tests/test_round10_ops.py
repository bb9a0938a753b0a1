"""Round-10 wave: perceptual near-dup caps (two-tier hamming core, video
fingerprint cap), the BPE empty-round guard, PII scrub composability,
the source-priority keeper, BPE vocab persistence, and the
gate→curriculum→pack composite's shared-helper contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- hamming


def _hash_df(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, hash_hi long, hash_lo long"
    )


def test_hamming_two_tier_pigeonhole(spark):
    """Crafted bit patterns: identical hashes pair at hamming 0 (tier
    1); 1-, 2-, 3-bit flips pair through the banded tier; a 4-bit flip
    spread over all four bands is (correctly) beyond threshold."""
    from breweries_case_spark.operators.multimodal import (
        hamming_near_pairs,
    )

    base_hi, base_lo = 0x12345678, 0x0BCDEF01
    rows = [
        (1, base_hi, base_lo),
        (2, base_hi, base_lo),  # identical -> hamming 0 via tier 1
        (3, base_hi ^ 1, base_lo),  # 1 bit
        (4, base_hi, base_lo ^ 3),  # 2 bits, same band
        (5, base_hi ^ (1 << 20), base_lo ^ 0x10001),  # 3 bits, 3 bands
        # 4 bits touching all 4 bands -> no intact band AND hamming 4
        (6, base_hi ^ (1 << 20) ^ 1, base_lo ^ 0x10001),
    ]
    got = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in hamming_near_pairs(_hash_df(spark, rows)).collect()
    }
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1 and got[(2, 3)] == 1
    assert got[(1, 4)] == 2
    assert got[(1, 5)] == 3
    assert (1, 6) not in got and (2, 6) not in got
    # 5 vs 6 differ by 1 bit -> found
    assert got[(5, 6)] == 1


def test_hamming_band_cap_mechanism(spark):
    """band_df_cap=1: two distinct hashes sharing only a HOT band (a
    third distinct value also carries it) post no tier-2 candidate,
    while identical-hash pairs are cap-exempt (tier 1) — the documented
    trade pinned at mechanism scale, exactly like the containment
    df_cap=2 fixture."""
    from breweries_case_spark.operators.multimodal import (
        hamming_near_pairs,
    )

    # hashes A and B differ in 1 bit of band 3; bands 0-2 are shared by
    # a third hash C (far from both), so with cap=1 every shared band
    # of (A, B) has df >= 2 -> no candidate. C is crafted by flipping
    # many band-3 bits only, so its bands 0-2 equal A's.
    a = (0x11112222, 0x33334444)
    b = (0x11112222, 0x33334445)  # 1 bit off in band 3
    c = (0x11112222, 0x3333FFFF)  # bands 0,1,2 same as A; band 3 far
    rows = [(1, *a), (2, *b), (3, *c), (4, *a)]
    uncapped = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in hamming_near_pairs(
            _hash_df(spark, rows), band_df_cap=10
        ).collect()
    }
    assert uncapped[(1, 2)] == 1 and uncapped[(2, 4)] == 1
    assert uncapped[(1, 4)] == 0
    capped = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in hamming_near_pairs(
            _hash_df(spark, rows), band_df_cap=1
        ).collect()
    }
    # tier-1 identical pair survives any cap; the near pair is lost at
    # cap=1 (this is what q_dedup_perceptual_capped pins at 0 on the
    # real fixtures with the production cap)
    assert capped[(1, 4)] == 0
    assert (1, 2) not in capped
    assert set(capped) <= set(uncapped)


def test_band_geometry_parameter(spark):
    """n_bands is a real parameter: 2×32-bit bands still find a 1-bit
    pair (pigeonhole needs n_bands >= hamming+1 only for losslessness
    at the FULL threshold; at 2 bands a 1-bit diff keeps one intact
    band), and invalid geometries raise."""
    import pytest

    from breweries_case_spark.operators.multimodal import (
        _band_structs,
        hamming_near_pairs,
    )

    rows = [(1, 7, 9), (2, 7, 8)]
    got = hamming_near_pairs(_hash_df(spark, rows), n_bands=2).collect()
    assert {(r.media_id_a, r.media_id_b, r.hamming) for r in got} == {
        (1, 2, 1)
    }
    with pytest.raises(ValueError):
        _band_structs(3)
    with pytest.raises(ValueError):
        _band_structs(6)


def test_video_cap_full_inventory_verify(spark, monkeypatch):
    """With the cap sized above the fixture's max fingerprint df the
    capped plan equals the ground-truth uncapped join EXACTLY
    (including shared_frames values — the full-inventory verify); with
    a cap of 1 every posting is pruned (sf0.001's every shared
    fingerprint has df >= 2) and the output is empty — the trade the
    certificate pins at 0 under the production cap."""
    import breweries_case_spark.operators.multimodal as mm

    fp = mm.video_fingerprints(spark, SF_DIR).localCheckpoint()
    truth = {
        (r.media_id_a, r.media_id_b): r.shared_frames
        for r in (
            fp.alias("a")
            .join(
                fp.alias("b"),
                (F.col("a.hash_hi") == F.col("b.hash_hi"))
                & (F.col("a.hash_lo") == F.col("b.hash_lo"))
                & (F.col("a.media_id") < F.col("b.media_id")),
            )
            .groupBy(
                F.col("a.media_id").alias("media_id_a"),
                F.col("b.media_id").alias("media_id_b"),
            )
            .agg(F.count("*").alias("shared_frames"))
            .filter(F.col("shared_frames") >= mm.VIDEO_SHARED_MIN)
        ).collect()
    }
    got = {
        (r.media_id_a, r.media_id_b): r.shared_frames
        for r in mm.q_dedup_video_frames(spark, SF_DIR).collect()
    }
    assert got == truth and len(truth) > 0

    monkeypatch.setattr(mm, "FP_DF_CAP", 1)
    assert mm.q_dedup_video_frames(spark, SF_DIR).count() == 0


# ------------------------------------------------------------------- BPE


def test_bpe_empty_round_guard(spark, tmp_path):
    """A corpus where every doc is a single token has NO adjacent pairs
    in any round: the guarded encode returns the unmerged stream (the
    old crossJoin emptied the corpus); the trajectory id returns zero
    rows (nothing was merged)."""
    from breweries_case_spark.operators.text import (
        q_bpe_encode,
        q_bpe_train_k,
    )

    rows = [
        (1, "alpha", "en", "s", 5),
        (2, "beta", "en", "s", 4),
        (3, "gamma", "en", "s", 5),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    enc = {
        (r.doc_id, r.pos): r.tok
        for r in q_bpe_encode(spark, str(tmp_path)).collect()
    }
    assert enc == {(1, 1): "alpha", (2, 1): "beta", (3, 1): "gamma"}
    assert q_bpe_train_k(spark, str(tmp_path)).count() == 0


def test_bpe_vocab_persist_roundtrip(spark, sf_dir):
    """save → catalog register → load → re-encode reproduces the
    trained encode EXACTLY, and (r12 ADVICE) the appId-namespaced
    catalog entry is DROPPED once the rules are collected — a
    persistent metastore accumulates no stale tables with dangling
    LOCATIONs."""
    from breweries_case_spark.operators.text import (
        q_bpe_encode,
        q_bpe_vocab_persist,
    )

    import re

    a = q_bpe_vocab_persist(spark, sf_dir)
    b = q_bpe_encode(spark, sf_dir)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    run_ns = re.sub(r"[^A-Za-z0-9_]", "_", spark.sparkContext.applicationId)
    leftover = [
        t.name
        for t in spark.catalog.listTables("tokenizer")
        if t.name == f"bpe_merges_{run_ns}"
    ]
    assert leftover == [], leftover


# ------------------------------------------------------------------- PII


def test_pii_scrub_expr_composability(spark, sf_dir):
    """The redaction expression is a plain column fn: crafted strings
    redact category by category, and the (digit-free) documents corpus
    passes through byte-identical — composing it before the gate → mix
    chain is a no-op on clean text."""
    from breweries_case_spark.io.reader import load_table
    from breweries_case_spark.io.rest_source import pii_scrub_expr

    crafted = spark.createDataFrame(
        [
            ("mail me at jo.doe+x@sub.example.org now",),
            ("ssn 123-45-6789 and tel 555-1234",),
            ("no pii here",),
        ],
        "text string",
    )
    got = [
        r.s for r in crafted.select(pii_scrub_expr(F.col("text")).alias("s")).collect()
    ]
    assert got == [
        "mail me at [EMAIL] now",
        "ssn [SSN] and tel [PHONE]",
        "no pii here",
    ]
    d = load_table(spark, sf_dir, "documents")
    changed = d.filter(
        pii_scrub_expr(F.col("text")) != F.col("text")
    ).count()
    assert changed == 0


# ---------------------------------------------------------------- keeper


def test_keeper_priority_prefers_curated(spark, tmp_path):
    """Two near-identical docs (one long web copy, one short curated
    copy) cluster together: the priority keeper elects the CURATED doc
    where q_dedup_clusters' quality rule would keep the longer web one;
    singletons keep themselves at their own tier."""
    from breweries_case_spark.operators.dedup import (
        q_dedup_clusters,
        q_dedup_keeper_priority,
    )

    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, shared + " plus extra trailing words here", "en", "src9", 100),
        (2, shared, "en", "src1", 60),
        (3, "totally unrelated text about brewing equipment", "en", "src7", 46),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    qual = {
        r.cluster_id: r.keeper_doc_id
        for r in q_dedup_clusters(spark, str(tmp_path)).collect()
    }
    prio = {
        r.cluster_id: (r.keeper_doc_id, r.keeper_source, r.keeper_priority)
        for r in q_dedup_keeper_priority(spark, str(tmp_path)).collect()
    }
    # docs 1+2 cluster (Jaccard over shared prefix >= 0.5)
    assert qual[1] == 1  # quality rule: longest doc
    assert prio[1] == (2, "src1", 0)  # priority rule: curated first
    assert prio[3] == (3, "src7", 1)  # singleton, web tier


# -------------------------------------------------------------- pipeline


def test_curation_pipeline_shared_helpers(spark, sf_dir):
    """The composite's population is exactly the gate survivors; its
    stage assignment equals recomputing with the shared helper over
    survivors; per-stage offsets are an exclusive prefix sum in
    (order_key, doc_id) order (contiguous, gap-free)."""
    from breweries_case_spark.operators.text import (
        curriculum_stage_table,
        q_quality_gate,
    )
    from breweries_case_spark.operators.training_mix import (
        q_curation_pipeline,
    )

    out = q_curation_pipeline(spark, sf_dir).collect()
    gated = q_quality_gate(spark, sf_dir).select("doc_id", "quality_bin")
    assert {r.doc_id for r in out} == {
        r.doc_id for r in gated.collect()
    }
    stages = {
        r.quality_bin: r.stage
        for r in curriculum_stage_table(gated).collect()
    }
    bins = {r.doc_id: r.quality_bin for r in gated.collect()}
    for r in out:
        assert r.stage == stages[bins[r.doc_id]], r.doc_id
    # exclusive prefix sum per stage: sort and re-walk
    by_stage: dict[int, list] = {}
    for r in out:
        by_stage.setdefault(r.stage, []).append(r)
    for stage, rows_ in by_stage.items():
        rows_.sort(key=lambda r: (r.order_key, r.doc_id))
        run = 0
        for r in rows_:
            assert r.start_offset == run, (stage, r.doc_id)
            run += r.n_tokens


def test_media_incremental_probe_bounded(spark, sf_dir):
    """The incremental tier's corpus-side probe is O(shard): corpus
    band postings surviving the shard-key semi-join are bounded by
    |shard band keys| × BAND_DF_CAP, and the verdicts agree with a
    brute-force classification of the same split."""
    import breweries_case_spark.operators.multimodal as mm

    h = (
        mm.image_hashes(spark, sf_dir)
        .select(
            "media_id",
            F.col("ahash_hi").alias("hash_hi"),
            F.col("ahash_lo").alias("hash_lo"),
        )
        .localCheckpoint()
    )
    is_shard = F.col("media_id") % mm._MEDIA_SHARD_MOD == 0
    shard = h.filter(is_shard).collect()
    corpus = h.filter(~is_shard).collect()

    def _bands64(hi, lo):
        return [
            (0, (hi >> 16) & 0xFFFF),
            (1, hi & 0xFFFF),
            (2, (lo >> 16) & 0xFFFF),
            (3, lo & 0xFFFF),
        ]

    shard_keys = {b for r in shard for b in _bands64(r.hash_hi, r.hash_lo)}
    corpus_hits = [
        b
        for r in {(r.hash_hi, r.hash_lo) for r in corpus}
        for b in _bands64(*r)
        if b in shard_keys
    ]
    assert len(corpus_hits) <= len(shard_keys) * mm.BAND_DF_CAP

    # brute-force verdicts over the same split
    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    expect = {}
    for s in shard:
        sh = (s.hash_hi, s.hash_lo)
        ex = [c.media_id for c in corpus if (c.hash_hi, c.hash_lo) == sh]
        nr = [
            c.media_id
            for c in corpus
            if 1 <= ham(sh, (c.hash_hi, c.hash_lo)) <= mm.IMG_HAMMING_MAX
        ]
        if ex:
            expect[s.media_id] = ("exact_dup", min(ex))
        elif nr:
            expect[s.media_id] = ("near_dup", min(nr))
        else:
            expect[s.media_id] = ("new", None)
    got = {
        r.media_id: (r.verdict, r.dup_of)
        for r in mm.q_dedup_media_incremental(spark, sf_dir).collect()
    }
    assert got == expect


@pytest.mark.slow
def test_round10_layout_invariance(spark, sf_dir):
    """The r10 wave's outputs are identical under a different shuffle
    partitioning — the layout-free determinism the 100 TB design
    claims (min-label components, md5 order keys, closed-form hashes,
    integer fold math, no rand(), no partition-dependent tie-breaks;
    the two-phase pack scan is partition-boundary-invariant by
    construction)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    ids = [
        "q_pii_scrub",
        "q_dedup_keeper_priority",
        "q_curation_pipeline",
        "q_dedup_image_clusters",
        "q_dedup_media_incremental",
        "q_dedup_media_rate",
        "q_bpe_compression",
        "q_dedup_perceptual_capped",
    ]
    base = {
        qid: sorted(tuple(r) for r in qs[qid](spark, sf_dir).collect())
        for qid in ids
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        for qid in ids:
            alt = sorted(tuple(r) for r in qs[qid](spark, sf_dir).collect())
            assert alt == base[qid], qid
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
