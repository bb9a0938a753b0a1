"""Round-12 wave: the capped two-tier text LSH blocker (tested in
test_llm_ops), the incremental perceptual-cluster maintainer, the
quality-weighted epoch mix, and the contamination-drift report."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

# ------------------------------------------- incremental cluster maintainer


def test_cluster_incremental_matches_full_recompute(spark, sf_dir):
    """The maintainer's (media_id → cluster_id) for shard members must
    EQUAL the from-scratch fixpoint over corpus+shard restricted to the
    shard — the contraction (stored clusters enter as one node) loses
    nothing. Also pins the verdict audit: 'new' components contain no
    corpus media; 'attached'/'merged' contain ≥ 1."""
    from breweries_case_spark.operators.multimodal import (
        _MEDIA_SHARD_MOD,
        hash_cluster_assignment,
        image_hashes,
        q_dedup_cluster_incremental,
    )

    h = (
        image_hashes(spark, sf_dir)
        .select(
            "media_id",
            F.col("ahash_hi").alias("hash_hi"),
            F.col("ahash_lo").alias("hash_lo"),
        )
        .localCheckpoint()
    )
    full = {
        r.media_id: r.label
        for r in hash_cluster_assignment(h).collect()
    }
    out = q_dedup_cluster_incremental(spark, sf_dir).collect()
    assert out, "shard is empty — fixture assumption broken"
    corpus_by_label: dict[int, int] = {}
    for m, lbl in full.items():
        if m % _MEDIA_SHARD_MOD != 0:
            corpus_by_label[lbl] = corpus_by_label.get(lbl, 0) + 1
    for r in out:
        assert full[r.media_id] == r.cluster_id, r
        n_corpus_media = corpus_by_label.get(r.cluster_id, 0)
        if r.verdict == "new":
            assert n_corpus_media == 0, r
        else:
            assert n_corpus_media >= 1, r


def test_cluster_incremental_corpus_work_is_shard_bounded(spark, sf_dir):
    """The probe discipline at cluster granularity: the update graph's
    node set is shard media plus TOUCHED corpus labels only — a small
    fraction of the corpus cluster count, never O(corpus)."""
    from breweries_case_spark.operators.multimodal import (
        _MEDIA_SHARD_MOD,
        hash_cluster_assignment,
        image_hashes,
        q_dedup_cluster_incremental,
    )

    h = image_hashes(spark, sf_dir).select(
        "media_id",
        F.col("ahash_hi").alias("hash_hi"),
        F.col("ahash_lo").alias("hash_lo"),
    )
    corpus = h.filter(F.col("media_id") % _MEDIA_SHARD_MOD != 0)
    n_corpus_media = corpus.count()
    assert hash_cluster_assignment is not None  # imported for parity w/ op
    out = q_dedup_cluster_incremental(spark, sf_dir).collect()
    shard_n = len(out)
    # clusters the update actually touched = distinct non-'new' labels;
    # the update graph is shard media + touched labels, so its size is
    # bounded by the shard (each touched label needs a probe hit from a
    # shard doc), never by the corpus
    touched = len({r.cluster_id for r in out if r.verdict != "new"})
    assert touched <= shard_n
    assert shard_n + touched <= 0.2 * n_corpus_media, (
        f"update graph {shard_n}+{touched} vs corpus {n_corpus_media}"
    )


@pytest.mark.slow
def test_text_cluster_incremental_matches_full_recompute(spark, sf_dir):
    """Same contract as the image maintainer, on the flagship text
    surface: shard labels must equal the from-scratch bounded-pipeline
    assignment over corpus+shard; verdict 'new' components contain no
    corpus docs, others at least one. Also pins the O(shard) claim:
    touched corpus clusters ≤ shard size."""
    from breweries_case_spark.io.reader import load_table, spread
    from breweries_case_spark.operators.dedup import (
        _SHARD_MOD,
        bounded_component_assignment,
        q_dedup_text_cluster_incremental,
    )

    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "text"
    )
    full = {r.node: r.label for r in bounded_component_assignment(d).collect()}
    out = q_dedup_text_cluster_incremental(spark, sf_dir).collect()
    assert out, "shard is empty — fixture assumption broken"
    corpus_by_label: dict[int, int] = {}
    for doc, lbl in full.items():
        if doc % _SHARD_MOD != 0:
            corpus_by_label[lbl] = corpus_by_label.get(lbl, 0) + 1
    for r in out:
        assert full[r.doc_id] == r.cluster_id, r
        n = corpus_by_label.get(r.cluster_id, 0)
        assert (n == 0) == (r.verdict == "new"), r
    touched = len({r.cluster_id for r in out if r.verdict != "new"})
    assert touched <= len(out)


@pytest.mark.slow
def test_cluster_chain_final_labels_match_full_recompute(spark, sf_dir):
    """The two-day chain's FINAL labels (after day 2's remap of day 1's
    rows) must equal the from-scratch assignment over ALL media, for
    every shard doc of both days — the state-evolution property."""
    from breweries_case_spark.operators.multimodal import (
        _MEDIA_SHARD_MOD,
        hash_cluster_assignment,
        image_hashes,
        q_dedup_cluster_chain,
    )

    h = image_hashes(spark, sf_dir).select(
        "media_id",
        F.col("ahash_hi").alias("hash_hi"),
        F.col("ahash_lo").alias("hash_lo"),
    )
    full = {r.media_id: r.label for r in hash_cluster_assignment(h).collect()}
    out = q_dedup_cluster_chain(spark, sf_dir).collect()
    shard_ids = {m for m in full if m % _MEDIA_SHARD_MOD == 0}
    assert {r.media_id for r in out} == shard_ids
    for r in out:
        assert full[r.media_id] == r.cluster_id, r
        assert r.day == (1 if r.media_id % 40 == 0 else 2), r


@pytest.mark.slow
def test_video_cluster_incremental_matches_full_recompute(spark, sf_dir):
    """Same contract on the shared-frame relation: shard labels equal
    the from-scratch video_cluster_assignment over corpus+shard; 'new'
    components contain no corpus videos, others at least one."""
    from breweries_case_spark.operators.multimodal import (
        _MEDIA_SHARD_MOD,
        q_dedup_video_cluster_incremental,
        video_cluster_assignment,
    )

    full = {
        r.media_id: r.label
        for r in video_cluster_assignment(spark, sf_dir).collect()
    }
    out = q_dedup_video_cluster_incremental(spark, sf_dir).collect()
    assert out, "video shard is empty — fixture assumption broken"
    corpus_by_label: dict[int, int] = {}
    for m, lbl in full.items():
        if m % _MEDIA_SHARD_MOD != 0:
            corpus_by_label[lbl] = corpus_by_label.get(lbl, 0) + 1
    for r in out:
        assert full[r.media_id] == r.cluster_id, r
        n = corpus_by_label.get(r.cluster_id, 0)
        assert (n == 0) == (r.verdict == "new"), r


# ------------------------------------------------ quality-weighted epochs


def test_mix_epochs_quality_modulates_by_stage(spark, sf_dir):
    """e_doc must equal e_source · (S−stage)/S for every survivor, and
    n_copies must follow the shared md5 fractional selector on e_doc —
    i.e. the cleanest quartile of a source repeats at the full source
    epoch and each lower tier at 75/50/25%."""
    from breweries_case_spark.operators.text import (
        CURRICULUM_STAGES,
        curriculum_stage_table,
        q_quality_gate,
    )
    from breweries_case_spark.operators.training_mix import (
        epoch_table,
        q_mix_epochs_quality,
    )
    from breweries_case_spark.io.reader import load_table

    gated = q_quality_gate(spark, sf_dir).select("doc_id", "quality_bin")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    surv = d.join(gated, "doc_id")
    e_src = {r.source: r.e for r in epoch_table(surv).collect()}
    stage_of_bin = {
        r.quality_bin: r.stage
        for r in curriculum_stage_table(gated).collect()
    }
    bin_of_doc = {r.doc_id: r.quality_bin for r in gated.collect()}
    out = q_mix_epochs_quality(spark, sf_dir).collect()
    assert len(out) == len(bin_of_doc)  # one row per survivor
    for r in out:
        stage = stage_of_bin[bin_of_doc[r.doc_id]]
        assert r.stage == stage
        e_doc = e_src[r.source] * (CURRICULUM_STAGES - stage) / CURRICULUM_STAGES
        import math

        assert abs(r.eq6 - math.floor(e_doc * 1e6 + 0.5) / 1e6) == 0
        assert math.floor(e_doc) <= r.n_copies <= math.floor(e_doc) + 1
    # the modulation must actually bite on real data: at least one
    # survivor sits below its source epoch
    assert any(
        r.eq6 < math.floor(e_src[r.source] * 1e6 + 0.5) / 1e6
        for r in out
        if e_src[r.source] > 0
    )


# ------------------------------------------------ contamination drift


def test_decontaminate_drift_reconciles_with_decontaminate(spark, sf_dir):
    """Per-half hit counts must reconcile with q_decontaminate's drop
    set: hits_even + hits_odd per lang == contaminated docs per lang
    (survivors = non-bench − hits), and rates are hits/docs at 6 dp."""
    from breweries_case_spark.io.reader import load_table
    from breweries_case_spark.operators.text import (
        BENCHMARK_MOD,
        q_decontaminate,
        q_decontaminate_drift,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    non_bench = {
        (r.doc_id, r.lang)
        for r in d.filter(F.col("doc_id") % BENCHMARK_MOD != 0).collect()
    }
    kept = {r.doc_id for r in q_decontaminate(spark, sf_dir).collect()}
    dropped_per_lang: dict[str, int] = {}
    docs_per_lang: dict[str, int] = {}
    for doc_id, lang in non_bench:
        docs_per_lang[lang] = docs_per_lang.get(lang, 0) + 1
        if doc_id not in kept:
            dropped_per_lang[lang] = dropped_per_lang.get(lang, 0) + 1
    out = q_decontaminate_drift(spark, sf_dir).collect()
    assert {r.lang for r in out} == set(docs_per_lang)
    for r in out:
        assert r.docs_even + r.docs_odd == docs_per_lang[r.lang]
        assert r.hits_even + r.hits_odd == dropped_per_lang.get(r.lang, 0)
        import math

        for hits, docs, rate in (
            (r.hits_even, r.docs_even, r.rate_even),
            (r.hits_odd, r.docs_odd, r.rate_odd),
        ):
            want = (
                math.floor(hits / docs * 1e6 + 0.5) / 1e6 if docs else 0.0
            )
            assert rate == want


# ------------------------------------------------------ layout invariance


@pytest.mark.slow
def test_round12_layout_invariance(spark, sf_dir):
    """The r12 wave's outputs are identical under a different shuffle
    partitioning (min-label components, md5 selectors, integer window
    math — no partition-dependent ties)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    ids = [
        "q_dedup_lsh_mechanism_cap",
        "q_dedup_cluster_incremental",
        "q_dedup_cluster_chain",
        "q_dedup_text_cluster_incremental",
        "q_dedup_video_cluster_incremental",
        "q_mix_epochs_quality",
        "q_decontaminate_drift",
        "q_sample_token_budget_quality",
        "q_contamination_by_source",
        "q_dedup_clusters_bounded",
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
