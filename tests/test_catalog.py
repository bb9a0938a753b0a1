"""Catalog/DDL bootstrap tests (S6): namespaces + partitioned tables +
idempotency + dynamic partition overwrite against the cataloged table —
the executable analog of reference setup/create_tables_script.py, which
this runtime can't run verbatim (no Iceberg jars)."""

from __future__ import annotations

import datetime as dt

import pytest

from breweries_case_spark.io.catalog import (
    LAYER_TABLES,
    bootstrap_tables,
    drop_all,
    verify_tables,
)

D1, D2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)


@pytest.fixture()
def catalog(spark):
    drop_all(spark)
    yield "spark_catalog"
    drop_all(spark)


def _insert_bronze(spark, rows):
    df = spark.createDataFrame(rows, "raw_json string, extraction_date date")
    # dynamic overwrite (session sets partitionOverwriteMode=dynamic):
    # replaces ONLY the partitions present in df — the reference's
    # idempotent-rerun contract (S5) against a cataloged table
    df.write.mode("overwrite").insertInto(
        "spark_catalog.bronze_layer.tbl_bronze_breweries"
    )


def test_bootstrap_creates_all_tables_empty(spark, catalog):
    fqns = bootstrap_tables(spark, catalog)
    assert len(fqns) == len(LAYER_TABLES) == 3
    assert verify_tables(spark, catalog) == {fqn: 0 for fqn in fqns}
    # partitioning metadata is real: DESCRIBE shows the partition column
    desc = spark.sql(f"DESCRIBE TABLE {fqns[0]}").collect()
    assert any("Partition Information" in (r.col_name or "") for r in desc)


def test_bootstrap_is_idempotent_and_preserves_data(spark, catalog):
    bootstrap_tables(spark, catalog)
    _insert_bronze(spark, [('{"a":1}', D1), ('{"b":2}', D1), ('{"c":3}', D2)])
    bootstrap_tables(spark, catalog)  # rerun must NOT clobber
    counts = verify_tables(spark, catalog)
    assert counts["spark_catalog.bronze_layer.tbl_bronze_breweries"] == 3


def test_dynamic_overwrite_replaces_only_touched_partition(spark, catalog):
    bootstrap_tables(spark, catalog)
    _insert_bronze(spark, [('{"a":1}', D1), ('{"b":2}', D1), ('{"c":3}', D2)])
    _insert_bronze(spark, [('{"a-rerun":1}', D1)])  # rerun day 1 only
    t = spark.table("spark_catalog.bronze_layer.tbl_bronze_breweries")
    per_day = {
        r.extraction_date: r.n
        for r in t.groupBy("extraction_date").count().withColumnRenamed("count", "n").collect()
    }
    assert per_day == {D1: 1, D2: 1}


def test_replace_resets_tables(spark, catalog):
    bootstrap_tables(spark, catalog)
    _insert_bronze(spark, [('{"a":1}', D1)])
    bootstrap_tables(spark, catalog, replace=True)
    assert verify_tables(spark, catalog)[
        "spark_catalog.bronze_layer.tbl_bronze_breweries"
    ] == 0


def _has_iceberg(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_write_roundtrip_or_clean_error(spark, tmp_path):
    """Exercise write_iceberg end-to-end when iceberg-spark-runtime is on
    the classpath (ACID overwritePartitions + read-back + partition-scoped
    re-overwrite); in jar-less sandboxes, pin the OTHER contract — a
    descriptive RuntimeError, not an opaque py4j failure. Catalog configs
    are runtime-settable, so no dedicated session is needed."""
    import pyspark.sql.functions as F

    from breweries_case_spark.io.writer import write_iceberg

    df = spark.range(3).select(
        F.col("id"),
        F.when(F.col("id") < 2, "2024-01-01").otherwise("2024-01-02").alias(
            "extraction_date"
        ),
    )
    if not _has_iceberg(spark):
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            write_iceberg(df, "lake.db.t")
        return

    spark.conf.set(
        "spark.sql.catalog.icetest", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.icetest.type", "hadoop")
    spark.conf.set("spark.sql.catalog.icetest.warehouse", str(tmp_path))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS icetest.db")
    write_iceberg(df, "icetest.db.t")
    assert spark.table("icetest.db.t").count() == 3
    # partition-scoped overwrite: replace only 2024-01-01 rows
    day1 = spark.range(1).select(
        F.lit(99).alias("id"), F.lit("2024-01-01").alias("extraction_date")
    )
    write_iceberg(day1, "icetest.db.t")
    per_day = {
        r.extraction_date: r.n
        for r in spark.table("icetest.db.t")
        .groupBy("extraction_date")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_day == {"2024-01-01": 1, "2024-01-02": 1}
    # the first commit is still readable via snapshot time travel
    snaps = spark.sql(
        "SELECT snapshot_id FROM icetest.db.t.snapshots ORDER BY committed_at"
    ).collect()
    assert len(snaps) >= 2
    first = spark.read.option("snapshot-id", snaps[0].snapshot_id).table(
        "icetest.db.t"
    )
    assert first.count() == 3


def test_expectations_enforce_raises_with_failing_checks(spark):
    """enforce() names exactly the failed checks; evaluate() computes
    violation counts (incl. the reference's tested empty-string id
    semantics and the count-minus-distinct uniqueness form) in one pass."""
    from breweries_case_spark.io.expectations import (
        enforce,
        evaluate,
        expect_non_empty,
        expect_unique,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "  "), (2, None)], "k long, name string"
    )
    got = {
        r.check: (r.n_violations, r.passed)
        for r in evaluate(
            df, [expect_unique("k"), expect_non_empty("name")]
        ).collect()
    }
    assert got == {
        "k_unique": (1, False),  # duplicate k=1
        "name_non_empty": (2, False),  # blank + NULL
    }
    with pytest.raises(ValueError, match="k_unique"):
        enforce(df, [expect_unique("k")])
