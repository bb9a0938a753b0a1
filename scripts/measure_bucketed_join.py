"""SURVEY §6 measurement: pre-bucketed co-located join vs plain shuffle
sort-merge join.

Bucketing is the classic 100 TB answer to a REPEATED big-big join: pay
one clustered write per table, then every subsequent join on the bucket
key plans with ZERO exchanges (both sides arrive pre-partitioned and
pre-sorted). This probe materializes both forms of the same
lineitem⋈orders join at sf0.1 scale (fact ×16 = 9.6M rows), verifies
the bucketed plan really has no Exchange, and times the two join
executions (the one-off bucketed write is reported separately — it is
the amortized cost).

Usage: PYTHONPATH=. python scripts/measure_bucketed_join.py
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from breweries_case_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"
ROUNDS = 3
BUCKETS = 32


def main():
    warehouse = tempfile.mkdtemp(prefix="bucket_probe_wh_")
    spark = get_session(
        app_name="bucket_probe",
        extra_configs={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            # static conf — must be set at session build
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    try:
        _run(spark)
    finally:
        # cleanup even on mid-run failure: otherwise the derby
        # metastore keeps table entries pointing at a deleted tempdir.
        # Each step is independently guarded — if the SESSION died,
        # DROP TABLE would raise and mask the real error AND skip the
        # rmtree/stop below it
        import contextlib

        for t in ("fact_b", "dim_b", "fact_p", "dim_p"):
            with contextlib.suppress(Exception):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(warehouse, ignore_errors=True)
        with contextlib.suppress(Exception):
            spark.stop()


def _final_plan(agg) -> str:
    """ONLY the adaptive final plan: executedPlan().toString() prints
    Final AND Initial sections, so a naive substring count doubles every
    Exchange (measured: a 2-exchange SMJ counts 4)."""
    full = agg._jdf.queryExecution().executedPlan().toString()
    return full.split("== Initial Plan ==")[0]


def _run(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(16))))
        .drop("rep")
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )

    # materialize the SAME fact/dim as plain tables too, so both join
    # variants read identical parquet — otherwise the shuffle variant
    # would be charged the x16 explode each round and the comparison
    # would flatter bucketing
    li.write.mode("overwrite").saveAsTable("fact_p")
    o.write.mode("overwrite").saveAsTable("dim_p")

    # one-off clustered writes (the amortized cost)
    t0 = time.perf_counter()
    li.write.mode("overwrite").bucketBy(BUCKETS, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("fact_b")
    o.write.mode("overwrite").bucketBy(BUCKETS, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable("dim_b")
    write_cost = time.perf_counter() - t0

    def agg_of(join_df):
        return join_df.agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice") + F.col("o_totalprice")).alias("s"),
        )

    results = {}
    plans = {}
    for _ in range(ROUNDS):
        for name in ("shuffle", "bucketed"):
            if name == "shuffle":
                fp, dp = spark.table("fact_p"), spark.table("dim_p")
                j = fp.join(dp, fp.l_orderkey == dp.o_orderkey)
            else:
                fb, db = spark.table("fact_b"), spark.table("dim_b")
                j = fb.join(db, fb.l_orderkey == db.o_orderkey)
            agg = agg_of(j)
            t0 = time.perf_counter()
            agg.collect()
            wall = time.perf_counter() - t0
            results[name] = min(results.get(name, float("inf")), wall)
            plans[name] = _final_plan(agg)

    # the bucketed plan must contain no Exchange below the final
    # single-partition agg exchange (count the hashpartitioning ones) —
    # ENFORCED, not just printed: a silently-degraded bucketed run
    # would otherwise publish a bogus comparison
    bucketed_shuffles = plans["bucketed"].count("Exchange hashpartitioning")
    shuffle_shuffles = plans["shuffle"].count("Exchange hashpartitioning")
    assert bucketed_shuffles == 0, (
        f"bucketed join planned {bucketed_shuffles} exchanges — "
        "co-location is not in effect; comparison invalid"
    )
    print(
        json.dumps(
            {
                "fact_rows": 9_600_000,
                "rounds": ROUNDS,
                "best_sec": {k: round(v, 2) for k, v in results.items()},
                "one_off_bucketed_write_sec": round(write_cost, 2),
                "join_exchanges": {
                    "shuffle": shuffle_shuffles,
                    "bucketed": bucketed_shuffles,
                },
            }
        )
    )

if __name__ == "__main__":
    main()
