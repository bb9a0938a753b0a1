"""SURVEY §6 measurement: the URL-dedup scale claim — q_dedup_url's
only exchange is the canonical-string hash aggregate WITH map-side
partials, so the shuffled volume is bounded by (mapper × distinct
canonical URLs), not corpus rows. Under corpus growth the canonical URL
space saturates (it is a function of bounded URL structure, not of how
many times each URL is crawled), so the exchange flattens while the
scan grows linearly — the property that makes URL-level dedup the cheap
FIRST pass at 100 TB (no document bytes move, only URL partials).

Variants: the q_dedup_url plan over the sf0.1 documents corpus at 1×
and 8× (union of doc_id-offset replicas — the offset shifts every
residue in the derived URL, so replicas produce NEW raw URLs landing in
the same bounded canonical space: exactly a re-crawl). Interleaved
rounds, per-variant minima; partial_count asserted in the FINAL
adaptive plan; exchange volume measured semantically as distinct
(mapper partition, canonical_url) partial rows.

Usage: PYTHONPATH=. python scripts/measure_url_dedup_scaling.py
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from breweries_case_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"
ROUNDS = 3
REPLICAS = 8


def build_corpus(spark, replicas: int):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars"
    )
    if replicas > 1:
        d = d.withColumn(
            "rep", F.explode(F.sequence(F.lit(1), F.lit(replicas)))
        ).select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias(
                "doc_id"
            ),
            "lang",
            "source",
            "n_chars",
        )
    return d.repartition(32).localCheckpoint()


def dedup_plan(d):
    from breweries_case_spark.operators.sampling import (
        _canonicalized,
        _derived_url,
    )

    canonical, host = _canonicalized()
    canon = d.select("doc_id", _derived_url().alias("url")).select(
        "doc_id", canonical.alias("canonical_url"), host.alias("domain")
    )
    return canon.groupBy("canonical_url", "domain").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count("*").alias("copies"),
    )


def partial_rows(d) -> int:
    """Distinct (mapper partition, canonical_url) pairs — the rows the
    partial aggregate emits into the exchange."""
    from breweries_case_spark.operators.sampling import (
        _canonicalized,
        _derived_url,
    )

    canonical, _ = _canonicalized()
    return (
        d.select("doc_id", _derived_url().alias("url"))
        .select(F.spark_partition_id().alias("p"), canonical.alias("c"))
        .select("p", "c")
        .distinct()
        .count()
    )


def main() -> None:
    spark = get_session(app_name="measure_url_dedup")
    corpora = {r: build_corpus(spark, r) for r in (1, REPLICAS)}
    walls: dict[int, list[float]] = {1: [], REPLICAS: []}
    for _ in range(ROUNDS):
        for r, d in corpora.items():
            t0 = time.perf_counter()
            dedup_plan(d).write.format("noop").mode("overwrite").save()
            walls[r].append(time.perf_counter() - t0)

    out = {}
    for r, d in corpora.items():
        plan = dedup_plan(d)
        plan.write.format("noop").mode("overwrite").save()
        final = plan._jdf.queryExecution().executedPlan().toString()
        assert "partial_count" in final or "partial" in final.lower(), final[
            :2000
        ]
        out[f"{r}x"] = {
            "rows": d.count(),
            "distinct_canonical": plan.count(),
            "partial_rows_into_exchange": partial_rows(d),
            "best_wall_sec": round(min(walls[r]), 3),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
