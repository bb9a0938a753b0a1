"""The nightly corpus-update program: the composition a training-data
pipeline actually runs per delivered shard, wired onto the engine's own
primitives — quality gate and decontamination (operators/training_mix.py
stages 1-2), exact dedup within the shard AND against the accumulated
corpus (operators/dedup.py's incremental tier 1), and an ACID
partition-overwrite commit of both the accepted documents and their
fingerprint state (io/snapshots.py).

Design contract — the three properties a production corpus store needs:

- **Corpus-side work is O(shard)**: the corpus is never re-paired; the
  only corpus-scale touch is an equi-join of shard fingerprints against
  the stored fingerprint table (one shuffle of O(shard) probe rows
  against a bucketable state table). The near-dup tier composes the
  same way via `operators/dedup.py::q_dedup_incremental`'s LSH probe
  and is deliberately not repeated here.
- **Idempotent re-runs**: both the documents AND the fingerprint state
  are partitioned by ``shard_date`` and committed with
  partition-overwrite, and the dedup join reads fingerprints from every
  partition EXCEPT the one being written — so a crash-retry (or a
  backfill re-delivery) replaces the day's output wholesale and
  converges to the same corpus state instead of self-excluding or
  double-accumulating.
- **Snapshot isolation**: readers of the corpus see complete versions;
  a failed update leaves the previous snapshot intact (the snapshot
  log's O_EXCL commit contract).

Reference analog: the medallion daily-rerun contract
(`src/processors/breweries_bronze_processors.py:133,149-153`) applied
to corpus curation instead of brewery ingest."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from breweries_case_spark.io.snapshots import (
    commit_overwrite_partitions,
    latest_version,
    read_snapshot,
)
from breweries_case_spark.operators.training_mix import (
    MEAN_TOKEN_LEN_RANGE,
    MIN_TOKENS,
)

#: snapshot tables inside a corpus directory
DOCS_TABLE = "docs"
FP_TABLE = "fingerprints"


def _fingerprint():
    return F.md5(F.lower(F.trim(F.col("text"))))


def _quality_gate(shard: DataFrame) -> DataFrame:
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    mean_len = F.length(F.col("text")).cast("double") / n_tok
    lo, hi = MEAN_TOKEN_LEN_RANGE
    return shard.filter((n_tok >= MIN_TOKENS) & mean_len.between(lo, hi))


def _decontaminate(shard: DataFrame, bench_grams: DataFrame) -> DataFrame:
    """Drop shard docs sharing any 3-gram with the benchmark set (the
    q_decontaminate contract; bench side is eval-suite-sized →
    broadcast)."""
    from breweries_case_spark.operators.text import _ngram_rows

    contaminated = (
        _ngram_rows(shard, 3)
        .join(F.broadcast(bench_grams.select("g").distinct()), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return shard.join(contaminated, "doc_id", "left_anti")


def update_corpus(
    spark: SparkSession,
    shard: DataFrame,
    corpus_dir: str,
    shard_date: str,
    bench_grams: DataFrame | None = None,
) -> dict:
    """Run one shard through gate → decontaminate → dedup (within-shard
    and vs corpus) → ACID commit. Returns per-stage counts (driver-side
    scalars — the run's audit record).

    ``shard`` must carry (doc_id, text, lang, source); ``shard_date`` is
    the idempotency key — re-running the same date replaces that
    partition in BOTH tables and converges to the same corpus state."""
    docs_dir = os.path.join(corpus_dir, DOCS_TABLE)
    fp_dir = os.path.join(corpus_dir, FP_TABLE)

    n_in = shard.count()
    gated = _quality_gate(shard)
    if bench_grams is not None:
        gated = _decontaminate(gated, bench_grams)
    n_gated = gated.count()

    # within-shard exact dedup: keep-min doc_id per fingerprint
    with_fp = gated.withColumn("fp", _fingerprint())
    w = Window.partitionBy("fp").orderBy("doc_id")
    shard_unique = (
        with_fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # corpus-side dedup: anti-join the stored fingerprint state from
    # every OTHER shard_date partition (self-exclusion-free reruns)
    if latest_version(fp_dir) is not None:
        prior = read_snapshot(spark, fp_dir).filter(
            F.col("shard_date") != shard_date
        )
        fresh = shard_unique.join(
            prior.select("fp"), "fp", "left_anti"
        )
    else:
        fresh = shard_unique
    accepted = fresh.withColumn("shard_date", F.lit(shard_date))
    n_accepted = accepted.count()

    commit_overwrite_partitions(
        accepted.select(
            "doc_id", "text", "lang", "source", "shard_date"
        ),
        docs_dir,
        "shard_date",
    )
    v = commit_overwrite_partitions(
        accepted.select("fp", "doc_id", "shard_date"), fp_dir, "shard_date"
    )
    return {
        "shard_date": shard_date,
        "n_in": n_in,
        "n_after_gate": n_gated,
        "n_accepted": n_accepted,
        "fingerprint_version": v,
    }


def read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """Latest committed corpus snapshot (all shard dates)."""
    return read_snapshot(spark, os.path.join(corpus_dir, DOCS_TABLE))
