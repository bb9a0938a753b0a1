"""Measure the incremental decontaminator's O(delta) probe footprint.

The q_decontaminate_incremental contract: a new benchmark shard's grams
probe the STORED corpus posting, so the day's contact set should track
the DELTA (an eval-suite shard, KBs), not the corpus. This probe prints,
per sf: the capped posting size, the rows the delta probe touches, and
the fraction — the number behind the SURVEY Round-13 claim (the unit
test pins < 10% at sf0.001; this script records the trend as the corpus
grows while the delta stays benchmark-sized).

Usage: PYTHONPATH=. python scripts/measure_decon_incremental.py
"""

from __future__ import annotations

from pyspark.sql import functions as F

from breweries_case_spark.io.reader import load_table
from breweries_case_spark.operators.text import (
    BENCHMARK_DELTA_MOD,
    BENCHMARK_MOD,
    DECON_DF_CAP,
    _ngram_rows,
)
from breweries_case_spark.session import get_test_session


def main() -> None:
    spark = get_test_session()
    spark.sparkContext.setLogLevel("ERROR")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = load_table(spark, f"/root/testdata/{sf}", "documents")
        grams = _ngram_rows(d, 3)
        posting = (
            grams.filter(F.col("doc_id") % BENCHMARK_MOD != 0)
            .distinct()
            .localCheckpoint()
        )
        rare = (
            posting.groupBy("g")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= DECON_DF_CAP)
            .select("g")
        )
        capped = posting.join(rare, "g", "left_semi").localCheckpoint()
        delta_grams = (
            grams.filter(
                (F.col("doc_id") % BENCHMARK_MOD == 0)
                & (F.col("doc_id") % BENCHMARK_DELTA_MOD != 0)
            )
            .select("g")
            .distinct()
        )
        total = capped.count()
        touched = capped.join(delta_grams, "g", "left_semi").count()
        n_delta = delta_grams.count()
        print(
            f"{sf}: posting={total} delta_grams={n_delta} "
            f"touched={touched} frac={touched / total:.4f}"
        )


if __name__ == "__main__":
    main()
