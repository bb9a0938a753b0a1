"""Round-14 optimization wave: randomized equivalence pins for the
incremental BPE pair-count state (`_bpe_counts_update`) — the only r14
change whose correctness argument is subtle enough to need its own
randomized harness (VERDICT r13 item 7: "demand the same randomized
equivalence-test rigor as 89518ea")."""
from __future__ import annotations

import random

from pyspark.sql import functions as F


def _full_counts(frame):
    """Reference: the pre-r14 full recount over a (doc_id, t) frame."""
    from breweries_case_spark.operators.text import _bpe_adjacent_pairs

    return (
        frame.select(F.explode(_bpe_adjacent_pairs("t")).alias("p"))
        .groupBy(
            F.col("p.l").alias("left_tok"), F.col("p.r").alias("right_tok")
        )
        .agg(F.count("*").alias("pair_count"))
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _random_corpus(rng, n_docs):
    """Small-vocab corpora so winners collide, self-pairs ('a a a' runs)
    occur, docs shrink to 0/1 tokens, and ties exercise the
    (count DESC, left, right) ordering."""
    vocab = ["a", "b", "c", "ab", "b b"]
    docs = []
    for i in range(n_docs):
        n = rng.randint(0, 12)
        docs.append((i, [rng.choice(vocab) for _ in range(n)]))
    return docs


def test_bpe_incremental_counts_match_full_recount_randomized(spark):
    """Drive BPE_TRAIN_ROUNDS merge rounds over randomized corpora; after
    every round the incrementally-maintained counts table must equal the
    full recount of the merged stream EXACTLY (same rows, same counts) —
    the multiset identity `counts' = counts − old(changed) + new(changed)`
    that q_bpe_train_k / bpe_train_rounds now rely on."""
    from breweries_case_spark.operators.text import (
        BPE_TRAIN_ROUNDS,
        _bpe_counts_update,
        bpe_merge_greedy,
    )

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        cur = spark.createDataFrame(
            _random_corpus(rng, 40), "doc_id long, t array<string>"
        ).localCheckpoint()
        counts = _full_counts(cur).localCheckpoint(eager=False)
        for _ in range(BPE_TRAIN_ROUNDS):
            top1 = counts.orderBy(
                F.col("pair_count").desc(), "left_tok", "right_tok"
            ).limit(1)
            merged = (
                cur.withColumn("_k", F.lit(1))
                .join(
                    F.broadcast(top1.withColumn("_k", F.lit(1))),
                    "_k",
                    "left",
                )
                .select(
                    "doc_id",
                    F.col("t").alias("t_old"),
                    F.when(F.col("left_tok").isNull(), F.col("t"))
                    .otherwise(
                        bpe_merge_greedy(
                            F.col("t"),
                            F.col("left_tok"),
                            F.col("right_tok"),
                        )
                    )
                    .alias("t"),
                )
                .select(
                    "doc_id",
                    "t",
                    F.when(
                        F.size("t") != F.size("t_old"), F.col("t_old")
                    ).alias("t_old"),
                )
                .localCheckpoint()
            )
            counts = _bpe_counts_update(counts, merged)
            assert _rows(
                counts.select("left_tok", "right_tok", "pair_count")
            ) == _rows(
                _full_counts(merged.select("doc_id", "t"))
            ), f"seed {seed}: incremental counts diverged from recount"
            cur = merged.select("doc_id", "t")


def test_bpe_train_rounds_winners_match_full_recount_loop(spark):
    """End-to-end: the shared incremental loop (`bpe_train_rounds`) must
    produce the same winner sequence and the same final token streams as
    an independent full-recount reference loop on randomized corpora —
    including corpora that go winner-less mid-loop (every doc at ≤ 1
    token), exercising the empty-round identity-fold guard."""
    from breweries_case_spark.operators.text import (
        BPE_TRAIN_ROUNDS,
        bpe_merge_greedy,
        bpe_train_rounds,
    )

    for seed, n_docs in ((5, 30), (11, 6)):
        rng = random.Random(seed)
        base = spark.createDataFrame(
            _random_corpus(rng, n_docs), "doc_id long, t array<string>"
        ).localCheckpoint()

        folded, winners = bpe_train_rounds(base)
        got_winners = [
            tuple(r)
            for w in winners
            for r in w.select("round", "left_tok", "right_tok").collect()
        ]

        # reference: the verbatim pre-r14 loop (full recount per round)
        cur = base
        want_winners = []
        for rnd in range(1, BPE_TRAIN_ROUNDS + 1):
            top1 = (
                _full_counts(cur)
                .orderBy(F.col("pair_count").desc(), "left_tok", "right_tok")
                .limit(1)
                .select(
                    F.lit(rnd).cast("int").alias("round"),
                    "left_tok",
                    "right_tok",
                )
            )
            want_winners.extend(tuple(r) for r in top1.collect())
            cur = (
                cur.withColumn("_k", F.lit(1))
                .join(
                    F.broadcast(
                        top1.select("left_tok", "right_tok").withColumn(
                            "_k", F.lit(1)
                        )
                    ),
                    "_k",
                    "left",
                )
                .select(
                    "doc_id",
                    F.when(F.col("left_tok").isNull(), F.col("t"))
                    .otherwise(
                        bpe_merge_greedy(
                            F.col("t"), F.col("left_tok"), F.col("right_tok")
                        )
                    )
                    .alias("t"),
                )
                .localCheckpoint()
            )

        assert got_winners == want_winners, f"seed {seed}: winners diverged"
        assert _rows(folded.select("doc_id", "t")) == _rows(
            cur.select("doc_id", "t")
        ), f"seed {seed}: final streams diverged"
