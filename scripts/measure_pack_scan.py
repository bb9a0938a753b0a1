"""SURVEY §6 measurement: concat-packing prefix sum — per-key window
cumsum vs the two-phase distributed scan (q_pack_concat's topology).

The window form funnels every row of a key through ONE task: its sort
AND its memory footprint are per-key-global, so at 100 TB a single hot
key (or a one-language corpus — the common case) serializes the whole
scan and must hold the key's entire row set in one partition. The
two-phase scan's per-task row bound is corpus/parts regardless of key
skew. Wall clock at sf0.1-derived sizes under-sells that difference
(the cumsum itself is cheap); the structural metric is MAX ROWS PER
TASK in the stage that computes offsets — the thing that OOMs or
serializes at scale — so this probe reports both, on a 16x-inflated
corpus in two regimes: the fixture's 5-lang key and a worst-case
single-key collapse.

Usage: PYTHONPATH=. python scripts/measure_pack_scan.py
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from breweries_case_spark.io.reader import load_table
from breweries_case_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"
INFLATE = 16
SCAN_PARTS = 8
ROUNDS = 3


def _docs(spark, single_key: bool):
    d = load_table(spark, SF_DIR, "documents")
    n = d.count()
    copies = spark.range(INFLATE).select(F.col("id").alias("rep"))
    d = d.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("rep") * F.lit(n)).alias("doc_id"),
        (F.lit("all") if single_key else F.col("lang")).alias("lang"),
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("long")
        .alias("n_tokens"),
    )
    return d


def window_scan(spark, single_key: bool):
    d = _docs(spark, single_key)
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return d.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias(
            "start_offset"
        ),
    )


def twophase_scan(spark, single_key: bool):
    import pandas as pd

    d = _docs(spark, single_key)
    parts = (
        d.repartitionByRange(SCAN_PARTS, "lang", "doc_id")
        .sortWithinPartitions("lang", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    partials = parts.groupBy("pid", "lang").agg(
        F.sum("n_tokens").alias("subtotal")
    ).collect()
    base: dict = {}
    running: dict = {}
    for r in sorted(partials, key=lambda r: (r["lang"], r["pid"])):
        base[(r["pid"], r["lang"])] = running.get(r["lang"], 0)
        running[r["lang"]] = running.get(r["lang"], 0) + int(r["subtotal"])
    base_b = spark.sparkContext.broadcast(base)

    def _scan(batches):
        run: dict = {}
        for pdf in batches:
            starts = []
            for pid, lang, n in zip(pdf["pid"], pdf["lang"], pdf["n_tokens"]):
                if lang not in run:
                    run[lang] = base_b.value.get((int(pid), lang), 0)
                starts.append(run[lang])
                run[lang] += int(n)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "n_tokens": pdf["n_tokens"],
                    "start_offset": pd.Series(starts, dtype="int64"),
                }
            )
            yield out

    return parts.mapInPandas(
        _scan,
        "doc_id long, lang string, n_tokens long, start_offset long",
    )


def _max_rows_per_task(df) -> int:
    counts = (
        df.withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .count()
        .collect()
    )
    return max(r["count"] for r in counts)


def main():
    spark = get_session(
        app_name="pack_scan_probe",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    # correctness: identical offsets in both regimes
    for sk in (False, True):
        a = {
            r.doc_id: r.start_offset for r in window_scan(spark, sk).collect()
        }
        b = {
            r.doc_id: r.start_offset
            for r in twophase_scan(spark, sk).collect()
        }
        assert a == b, f"single_key={sk}: scan disagreement"

    out = {}
    for sk, tag in ((False, "5key"), (True, "1key")):
        out[f"window_{tag}_max_task_rows"] = _max_rows_per_task(
            window_scan(spark, sk)
        )
        out[f"twophase_{tag}_max_task_rows"] = _max_rows_per_task(
            twophase_scan(spark, sk)
        )
        wt, tt = [], []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            window_scan(spark, sk).write.format("noop").mode(
                "overwrite"
            ).save()
            wt.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            twophase_scan(spark, sk).write.format("noop").mode(
                "overwrite"
            ).save()
            tt.append(time.perf_counter() - t0)
        out[f"window_{tag}_wall_s"] = round(min(wt), 3)
        out[f"twophase_{tag}_wall_s"] = round(min(tt), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
