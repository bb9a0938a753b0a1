"""The nightly corpus-update contract (pipelines/corpus.py): shard flow
through gate → decontaminate → within-shard and vs-corpus dedup → ACID
commit, with idempotent re-runs and O(shard) corpus-side work."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from breweries_case_spark.pipelines.corpus import (
    read_corpus,
    update_corpus,
)


def _shard(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


GOOD = "the quick brown fox jumps over the lazy dog again and again"
GOOD2 = "pack my box with five dozen liquor jugs before the dawn breaks"
SHORT = "too short"  # fails MIN_TOKENS
BENCH = "benchmark eval question about prime numbers and their gaps here"


def _ids(spark, corpus_dir):
    return {
        (r.shard_date, r.doc_id)
        for r in read_corpus(spark, corpus_dir).collect()
    }


def test_two_day_flow_dedups_against_corpus(spark, tmp_path):
    c = str(tmp_path / "corpus")
    day1 = _shard(
        spark,
        [(1, GOOD, "en", "web"), (2, GOOD2, "en", "web"), (3, SHORT, "en", "web")],
    )
    stats1 = update_corpus(spark, day1, c, "2026-08-01")
    # the short doc fails the gate; both good docs accepted
    assert (stats1["n_in"], stats1["n_after_gate"], stats1["n_accepted"]) == (3, 2, 2)
    assert _ids(spark, c) == {("2026-08-01", 1), ("2026-08-01", 2)}

    # day 2 redelivers GOOD (exact dup of doc 1, different id), a
    # within-shard dup pair, and one genuinely new doc
    new_text = "a completely new document with plenty of fresh tokens inside it"
    day2 = _shard(
        spark,
        [
            (10, GOOD, "en", "web"),       # corpus dup -> dropped
            (11, new_text, "en", "web"),   # new -> kept
            (12, new_text, "en", "web"),   # within-shard dup -> dropped
        ],
    )
    stats2 = update_corpus(spark, day2, c, "2026-08-02")
    assert stats2["n_accepted"] == 1
    assert _ids(spark, c) == {
        ("2026-08-01", 1),
        ("2026-08-01", 2),
        ("2026-08-02", 11),
    }


def test_rerun_is_idempotent_not_self_excluding(spark, tmp_path):
    """Re-running a shard date must converge to the SAME corpus state:
    the day's fingerprints must not exclude the day's own docs, and the
    partition is replaced, not appended."""
    c = str(tmp_path / "corpus")
    day = _shard(spark, [(1, GOOD, "en", "web"), (2, GOOD2, "en", "web")])
    update_corpus(spark, day, c, "2026-08-01")
    before = _ids(spark, c)
    stats = update_corpus(spark, day, c, "2026-08-01")  # crash-retry
    assert stats["n_accepted"] == 2  # NOT zero — no self-exclusion
    assert _ids(spark, c) == before
    # corpus row count did not double
    assert read_corpus(spark, c).count() == 2


NEAR1 = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
)
# one token edited at the end — shares nearly all 3-gram shingles (J >= 0.5)
NEAR1_EDIT = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu xi"
)
OTHER = (
    "completely different words about rivers mountains valleys oceans and storms"
)


def test_near_dedup_probes_stored_lsh_state(spark, tmp_path):
    """Day 2's near-duplicate of a day-1 doc is dropped by the LSH probe
    + Jaccard verify; a genuinely different doc passes; within-shard
    near-dup pairs resolve keep-min; re-running day 2 is idempotent."""
    c = str(tmp_path / "corpus")
    day1 = _shard(spark, [(1, NEAR1, "en", "web")])
    s1 = update_corpus(spark, day1, c, "2026-08-01", near_dedup=True)
    assert (s1["n_accepted"], s1["n_near_dropped"]) == (1, 0)

    day2 = _shard(
        spark,
        [
            (10, NEAR1_EDIT, "en", "web"),  # near-dup of corpus doc 1
            (11, OTHER, "en", "web"),       # new
            (12, OTHER + " extra", "en", "web"),  # near-dup of 11 (higher id)
        ],
    )
    s2 = update_corpus(spark, day2, c, "2026-08-02", near_dedup=True)
    assert s2["n_near_dropped"] == 2
    assert s2["n_accepted"] == 1
    assert _ids(spark, c) == {("2026-08-01", 1), ("2026-08-02", 11)}

    # crash-retry of day 2 converges to the same state
    s2b = update_corpus(spark, day2, c, "2026-08-02", near_dedup=True)
    assert s2b["n_accepted"] == 1
    assert _ids(spark, c) == {("2026-08-01", 1), ("2026-08-02", 11)}


def test_zero_accepted_rerun_deletes_stale_partition(spark, tmp_path):
    """Redelivering a shard whose docs now all fail must REPLACE the
    day's output with nothing — an empty overwrite would silently carry
    the stale partition (and its suppressing fingerprints) forward."""
    c = str(tmp_path / "corpus")
    update_corpus(
        spark, _shard(spark, [(1, GOOD, "en", "web")]), c, "2026-08-01"
    )
    update_corpus(
        spark, _shard(spark, [(2, GOOD2, "en", "web")]), c, "2026-08-02"
    )
    assert _ids(spark, c) == {("2026-08-01", 1), ("2026-08-02", 2)}

    # corrected redelivery of day 2: everything fails the gate
    stats = update_corpus(
        spark, _shard(spark, [(2, SHORT, "en", "web")]), c, "2026-08-02"
    )
    assert stats["n_accepted"] == 0
    assert _ids(spark, c) == {("2026-08-01", 1)}
    # the stale fingerprint no longer suppresses a future delivery
    s3 = update_corpus(
        spark, _shard(spark, [(9, GOOD2, "en", "web")]), c, "2026-08-03"
    )
    assert s3["n_accepted"] == 1
    assert _ids(spark, c) == {("2026-08-01", 1), ("2026-08-03", 9)}


def test_backfill_seeds_lsh_state_without_probing(spark, tmp_path):
    """persist_lsh_state=True with near_dedup=False is the backfill
    mode: no probe/intra work, but bucket state lands so the NEXT daily
    shard's near-dup probe works against the seed."""
    c = str(tmp_path / "corpus")
    seed = _shard(spark, [(1, NEAR1, "en", "web")])
    s0 = update_corpus(
        spark, seed, c, "2026-08-01", near_dedup=False, persist_lsh_state=True
    )
    assert (s0["n_accepted"], s0["n_near_dropped"]) == (1, 0)
    day = _shard(spark, [(10, NEAR1_EDIT, "en", "web")])
    s1 = update_corpus(spark, day, c, "2026-08-02", near_dedup=True)
    assert (s1["n_near_dropped"], s1["n_accepted"]) == (1, 0)
    assert _ids(spark, c) == {("2026-08-01", 1)}


def test_concurrent_shard_dates_both_land(spark, tmp_path):
    """Two updates for DIFFERENT shard dates racing on the same corpus:
    the snapshot log's optimistic retry must serialize them so both
    partitions land in both tables, whichever order the version races
    resolve."""
    import threading

    c = str(tmp_path / "corpus")
    update_corpus(
        spark, _shard(spark, [(1, GOOD, "en", "web")]), c, "2026-08-01"
    )
    errs = []

    def run(day, rows):
        try:
            update_corpus(spark, _shard(spark, rows), c, day)
        except Exception as e:  # surface in the main thread
            errs.append(e)

    t1 = threading.Thread(
        target=run, args=("2026-08-02", [(2, GOOD2, "en", "web")])
    )
    new_text = "entirely different prose with plenty of tokens to pass the gate"
    t2 = threading.Thread(
        target=run, args=("2026-08-03", [(3, new_text, "en", "web")])
    )
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    assert _ids(spark, c) == {
        ("2026-08-01", 1),
        ("2026-08-02", 2),
        ("2026-08-03", 3),
    }


def test_decontamination_drops_bench_overlap(spark, tmp_path):
    c = str(tmp_path / "corpus")
    bench_grams = (
        _shard(spark, [(99, BENCH, "en", "bench")])
        .select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.size(F.split(F.lower(F.trim("text")), r"\s+")) - 2,
                    ),
                    lambda i: F.concat_ws(
                        " ",
                        F.split(F.lower(F.trim("text")), r"\s+")[i - 1],
                        F.split(F.lower(F.trim("text")), r"\s+")[i],
                        F.split(F.lower(F.trim("text")), r"\s+")[i + 1],
                    ),
                )
            ).alias("g")
        )
    )
    contaminated = (
        "this text quotes the benchmark eval question about prime numbers today"
    )
    day = _shard(
        spark,
        [(1, GOOD, "en", "web"), (2, contaminated, "en", "web")],
    )
    stats = update_corpus(spark, day, c, "2026-08-01", bench_grams=bench_grams)
    assert stats["n_accepted"] == 1
    assert _ids(spark, c) == {("2026-08-01", 1)}
