"""The end-to-end training-data curation pipeline as ONE registered,
oracle-checked query — the composition a pretraining data team actually
ships, built from the engine's own stages:

    quality gate → benchmark decontamination → exact dedup → per-source
    token-budget mixing

Each stage exists as a standalone id (`q_quality_score`,
`q_decontaminate`, `q_dedup_exact`, `q_sample_token_budget`); this module
proves they COMPOSE — the driver value-checks the full four-stage
dataflow against a single DuckDB CTE chain, so a semantic drift in any
stage (or in how stages hand off) turns the composite red even if every
unit id stays green. The near-dup analog (`q_dedup_clusters_bounded` →
`q_dedup_filtered_corpus`) covers the fuzzy tier; this is the exact tier
end to end.

Scale shape (the stages narrow monotonically, so each pays less than the
last): quality is a scan-time filter; decontamination broadcasts the
KB-scale benchmark gram set into a semi/anti pair; dedup is one shuffle
on the md5 fingerprint; the budget window shuffles once on source and
keeps only the md5-ordered prefix. Nothing in the pipeline is
all-pairs, collects to the driver, or shuffles the corpus more than once
per stage key."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from breweries_case_spark.io.reader import load_table
from breweries_case_spark.operators.sampling import (
    TOKEN_BUDGET_PER_SOURCE,
    _md5_key,
)
from breweries_case_spark.operators.text import BENCHMARK_MOD, _ngram_rows

#: quality-gate thresholds — language-agnostic (the synthetic corpus is
#: 5-lingual word soup; stopword-based gates would only fit English)
MIN_TOKENS = 10
MEAN_TOKEN_LEN_RANGE = (2.0, 12.0)


def quality_mask():
    """Stage-1 gate predicate over a ``text`` column: ≥ MIN_TOKENS
    whitespace tokens AND mean token length inside MEAN_TOKEN_LEN_RANGE.
    Shared with ``pipelines/corpus.py`` so the nightly pipeline's gate
    is provably THIS gate, not a drifting re-implementation."""
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    mean_len = F.length(F.col("text")).cast("double") / n_tok
    lo, hi = MEAN_TOKEN_LEN_RANGE
    return (n_tok >= MIN_TOKENS) & mean_len.between(lo, hi)


def content_fingerprint():
    """Exact-dedup canonicalization: md5 of the lowercased trimmed text
    (the q_dedup_exact contract; shared with pipelines/corpus.py)."""
    return F.md5(F.lower(F.trim(F.col("text"))))


def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-stage curation composite over documents; output is the final
    mixed corpus slice (doc_id, lang, source, ws_tokens, cum_tokens)."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    is_bench = F.col("doc_id") % BENCHMARK_MOD == 0

    # 1. quality gate: narrow scan-time predicate, no shuffle
    qual = d.filter(quality_mask())

    # 2. decontamination: benchmark grams come from the FULL corpus (the
    # eval suite exists regardless of training-side quality filtering),
    # broadcast into a semi-join on the survivors' gram stream
    bench_grams = _ngram_rows(d.filter(is_bench), 3).select("g").distinct()
    corpus = qual.filter(~is_bench)
    contaminated = (
        _ngram_rows(corpus, 3)
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = corpus.join(contaminated, "doc_id", "left_anti")

    # 3. exact dedup: md5 content fingerprint, keep-min-doc_id (the
    # q_dedup_exact contract), one shuffle on the fingerprint
    fp = content_fingerprint()
    keepers = (
        clean.select(fp.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    kept = clean.join(keepers.select("doc_id"), "doc_id", "left_semi")

    # 4. per-source token budget: md5-ordered cumulative prefix
    wo = (
        Window.partitionBy("source")
        .orderBy(_md5_key(F.col("doc_id")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        kept.select("doc_id", "lang", "source", n_tok.alias("ws_tokens"))
        .withColumn("cum_tokens", F.sum("ws_tokens").over(wo))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET_PER_SOURCE)
        .select("doc_id", "lang", "source", "ws_tokens", "cum_tokens")
    )


QUERIES = {
    "q_training_mix": q_training_mix,
}

ORACLES = {
    "q_training_mix": rf"""
        WITH base AS (
            SELECT doc_id, lang, source, text,
                   len(string_split_regex(trim(text), '\s+')) AS n_tok
            FROM documents),
        qual AS (
            SELECT * FROM base
            WHERE n_tok >= {MIN_TOKENS}
              AND CAST(length(text) AS DOUBLE) / n_tok
                  BETWEEN {MEAN_TOKEN_LEN_RANGE[0]} AND {MEAN_TOKEN_LEN_RANGE[1]}),
        btk AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
            FROM documents WHERE doc_id % {BENCHMARK_MOD} = 0),
        bgrams AS (
            SELECT DISTINCT tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g
            FROM btk, unnest(generate_series(1, len(tk) - 2)) AS s(i)),
        ctk AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
            FROM qual WHERE doc_id % {BENCHMARK_MOD} <> 0),
        contaminated AS (
            SELECT DISTINCT c.doc_id
            FROM (SELECT doc_id,
                         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g
                  FROM ctk,
                       unnest(generate_series(1, len(tk) - 2)) AS s(i)) c
            JOIN bgrams USING (g)),
        clean AS (
            SELECT * FROM qual
            WHERE doc_id % {BENCHMARK_MOD} <> 0
              AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
        keepers AS (
            SELECT MIN(doc_id) AS doc_id
            FROM (SELECT md5(lower(trim(text))) AS fp, doc_id FROM clean)
            GROUP BY fp),
        ranked AS (
            SELECT doc_id, lang, source, n_tok AS ws_tokens,
                   CAST(SUM(n_tok) OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM clean
            WHERE doc_id IN (SELECT doc_id FROM keepers))
        SELECT doc_id, lang, source, ws_tokens, cum_tokens
        FROM ranked
        WHERE cum_tokens <= {TOKEN_BUDGET_PER_SOURCE}
    """,
}
