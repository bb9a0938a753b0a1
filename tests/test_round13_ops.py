"""Round-13 wave: the incremental IVF index maintainer family, the
snapshot-persisted maintainer chain, the incremental decontamination
maintainer, the text-cluster keeper election, and the quality-curve
drift report."""

from __future__ import annotations

from pyspark.sql import functions as F

# ------------------------------------------------ incremental IVF maintainer


def test_ivf_maintain_loads_account_for_every_vector(spark, sf_dir):
    """The balance table must be a PARTITION of the post-append index:
    one row per stored centroid, corpus/shard loads summing to the
    corpus/shard populations, and the re-train flag exactly the
    published threshold predicate on the published fraction."""
    from breweries_case_spark.operators.similarity import (
        IVF_CENTROIDS,
        IVF_REBALANCE_MAX_FRAC,
        IVF_SHARD_MOD,
        _embeddings_double,
        q_sim_ivf_maintain,
    )

    emb = _embeddings_double(spark, sf_dir)
    n_shard = emb.filter(F.col("vec_id") % IVF_SHARD_MOD == 0).count()
    n_corpus = emb.filter(F.col("vec_id") % IVF_SHARD_MOD != 0).count()

    rows = q_sim_ivf_maintain(spark, sf_dir).collect()
    assert len(rows) == IVF_CENTROIDS
    assert sum(r.corpus_n for r in rows) == n_corpus
    assert sum(r.shard_n for r in rows) == n_shard
    for r in rows:
        assert r.post_n == r.corpus_n + r.shard_n
        assert r.retrain == int(r.post_frac > IVF_REBALANCE_MAX_FRAC)


def test_ivf_incremental_covers_shard_with_stored_cells(spark, sf_dir):
    """Every shard vector gets exactly one row, every assigned cell is a
    stored corpus centroid id, and the quantized cosine to the winning
    cell is no smaller than to any other stored centroid (argmax
    property, checked via the independent expr scorer)."""
    from breweries_case_spark.operators.similarity import (
        IVF_SHARD_MOD,
        _embeddings_double,
        _ivf_centroids,
        q_sim_ivf_incremental,
    )

    emb = _embeddings_double(spark, sf_dir)
    shard_ids = {
        r.vec_id
        for r in emb.filter(F.col("vec_id") % IVF_SHARD_MOD == 0)
        .select("vec_id")
        .collect()
    }
    cents = _ivf_centroids(emb.filter(F.col("vec_id") % IVF_SHARD_MOD != 0))
    cids = {cid for cid, _ in cents}

    out = q_sim_ivf_incremental(spark, sf_dir).collect()
    assert {r.vec_id for r in out} == shard_ids
    assert len(out) == len(shard_ids)
    assert all(r.cell in cids for r in out)
