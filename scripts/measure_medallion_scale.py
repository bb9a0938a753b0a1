"""SURVEY §6 measurement: the reference's ONE real workload (medallion
bronze→silver→gold) at sf0.1-equivalent volume.

The reference's published envelope is <30 s/layer at 10k rows
(tests/integration/test_performance.py:71-73); bench.py reproduces that
exact comparison every round. This probe scales the same pipeline to
600k payloads (60× the reference ceiling, the sf0.1-equivalent volume)
staged as JSON lines and ingested through q_ingest_staged_json's path
(ingest_staged_files with the declared schema) — the bulk-backfill
route, since a 600k-row driver-side page loop is exactly what the REST
source's scale note says NOT to do.

What it proves, per layer:
- bronze: distributed schema'd JSON scan → to_json re-serialization →
  partitioned parquet write, ZERO exchanges (narrow end to end);
- silver: partition-pruned scan → ONE from_json parse (vs the
  reference's 12 get_json_object calls — at 600k rows the 12× parse
  multiplier is the difference between one pass and twelve) → validity
  gate → write, ZERO exchanges;
- gold: groupBy(countDistinct) — the ONLY shuffling layer, and the
  countDistinct-vs-size(collect_set) choice means the shuffle carries
  (group, id) pairs for partial dedup, not materialized id arrays.

Usage: PYTHONPATH=. python scripts/measure_medallion_scale.py
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from breweries_case_spark.session import get_session

N_ROWS = 600_000
DAY = dt.date(2024, 1, 15)


def _stage_payloads(spark, staging: str) -> None:
    """Distributed generation of the 600k-row staged backfill: the same
    index-deterministic brewery payload the registry's synthetic fetcher
    emits, built with Spark expressions and written as JSON lines — no
    row ever touches the driver."""
    types = F.array(*[F.lit(t) for t in (
        "micro", "nano", "regional", "brewpub", "large", "planning")])
    i = F.col("id")
    payload = F.struct(
        F.format_string("brewery-%05d", i).alias("id"),
        F.concat(F.lit("Synthetic Brewery "), i).alias("name"),
        F.element_at(types, (i % 6 + 1).cast("int")).alias("brewery_type"),
        F.concat(F.lit("City"), i % 10).alias("city"),
        F.concat(F.lit("State"), i % 5).alias("state_province"),
        (i + 90000).cast("string").alias("postal_code"),
        F.lit("United States").alias("country"),
        # raw i for longitude/phone, i % 10000 for latitude — exactly the
        # fetcher's formulas (%04d pads but never truncates, so i >= 10k
        # renders 5-6 digits in both implementations)
        F.format_string("-122.%04d", i).alias("longitude"),
        F.format_string("45.%04d", i % 10000).alias("latitude"),
        F.format_string("555-%04d", i).alias("phone"),
    )
    (
        spark.range(N_ROWS)
        .repartition(32)
        .select(F.to_json(payload).alias("value"))
        .write.mode("overwrite")
        .text(staging)
    )


def _exchanges(df) -> int:
    """Exchange count in the FINAL (adaptive) physical plan."""
    full = df._jdf.queryExecution().executedPlan().toString()
    final = full.split("+- == Initial Plan ==")[0]
    return final.count("Exchange")


def main() -> None:
    base = tempfile.mkdtemp(prefix="medallion_scale_")
    spark = get_session(
        app_name="medallion_scale",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        from breweries_case_spark.io.rest_source import ingest_staged_files
        from breweries_case_spark.io.writer import (
            read_partitioned,
            write_partition_overwrite,
        )
        from breweries_case_spark.pipelines.medallion import (
            bronze_to_silver,
            silver_to_gold,
        )
        from breweries_case_spark.schemas import BREWERY_PAYLOAD_SCHEMA

        staging = f"{base}/staged"
        t0 = time.perf_counter()
        _stage_payloads(spark, staging)
        stage_s = round(time.perf_counter() - t0, 2)

        out: dict[str, object] = {"rows": N_ROWS, "stage_sec": stage_s}

        # bronze: schema'd staged scan → raw_json + partition column
        staged = ingest_staged_files(
            spark, staging, BREWERY_PAYLOAD_SCHEMA, file_format="json"
        )
        bronze = staged.select(
            F.to_json(F.struct(*staged.columns)).alias("raw_json"),
            F.lit(DAY).alias("extraction_date"),
        )
        t0 = time.perf_counter()
        write_partition_overwrite(bronze, f"{base}/bronze")
        out["bronze_sec"] = round(time.perf_counter() - t0, 2)
        out["bronze_exchanges"] = _exchanges(bronze)

        silver = bronze_to_silver(read_partitioned(spark, f"{base}/bronze"), DAY)
        t0 = time.perf_counter()
        write_partition_overwrite(silver, f"{base}/silver")
        out["silver_sec"] = round(time.perf_counter() - t0, 2)
        out["silver_exchanges"] = _exchanges(silver)

        gold = silver_to_gold(read_partitioned(spark, f"{base}/silver"), DAY)
        t0 = time.perf_counter()
        write_partition_overwrite(gold, f"{base}/gold")
        out["gold_sec"] = round(time.perf_counter() - t0, 2)
        out["gold_exchanges"] = _exchanges(gold)

        # audit: every payload has a valid id, so silver keeps all rows;
        # gold groups: (i%6, i%5, i%10) is fully determined by i mod 30
        # (all three moduli divide 30), so exactly 30 distinct groups
        silver_n = read_partitioned(spark, f"{base}/silver").count()
        gold_n = read_partitioned(spark, f"{base}/gold").count()
        out["silver_rows"] = silver_n
        out["gold_rows"] = gold_n
        assert silver_n == N_ROWS, f"silver dropped rows: {silver_n}"
        assert gold_n == 30, f"unexpected gold groups: {gold_n}"

        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
