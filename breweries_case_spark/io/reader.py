"""Parquet table reader over the driver's star-schema testdata.

The reference reads catalog tables via ``spark.table`` (SURVEY §2.1 S3,
reference ``src/processors/breweries_silver_processors.py:30``); here the
catalog analog is a directory of parquet files per scale factor
(``/root/testdata/sf*/{table}.parquet``, TESTDATA.md).

Scale note: ``spark.read.parquet`` gives vectorized scans with predicate
pushdown + column pruning for free; at 100 TB the same call pattern works
over partitioned directories / Iceberg tables — callers never hand-roll
file listings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (SURVEY §2.1 S3). Schema comes from parquet footers —
    explicit and stable, no inference pass."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        return _load_events(spark, os.path.join(sf_dir, "events.parquet"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Events with ``ts`` normalized to session-TZ TIMESTAMP regardless of
    how the generator encoded it. Seen encodings across driver rounds:
    parquet TIMESTAMP(NANOS) (Spark's vectorized reader rejects it — read
    nanos as long, truncate to micros with exact integer division) and
    TIMESTAMP(MICROS) isAdjustedToUTC=false (arrives as TIMESTAMP_NTZ —
    reinterpret the wall time as UTC, matching the session timeZone=UTC the
    factory pins and the epoch values DuckDB reads from the same file)."""
    from pyspark.sql.types import LongType, TimestampNTZType

    try:
        df = spark.read.parquet(path)
    except Exception as e:
        # Nanos path: unsupported type fails at footer-schema resolution.
        # Retry under nanosAsLong ONLY for that failure — a missing file,
        # corrupt footer, or permission error re-raises as itself rather
        # than surfacing as a confusing second failure with the original
        # cause discarded.
        markers = ("PARQUET_TYPE_ILLEGAL", "Illegal Parquet type", "NANOS")
        if not any(m in str(e) for m in markers):
            raise
        # Conf is captured into the relation at read time (verified: the
        # scan still executes after restore), so save/restore keeps it from
        # leaking into later unrelated nanos-parquet reads on this session.
        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            try:
                df = spark.read.parquet(path)
            except Exception as retry_err:
                raise retry_err from e
        finally:
            if prior is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        # Cast interprets the wall time in the session timeZone — UTC per
        # the session factory — giving the same epoch DuckDB reads.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a SMALL scan so CPU-heavy per-row work uses every core.

    Local parquet testdata arrives as one split per file, which serializes
    compute-bound expressions (shingling, hashing) onto one core. At 100 TB
    a scan has thousands of splits — more than ``defaultParallelism`` — so
    this returns the input unchanged and never injects a full-table shuffle
    at scale; the guard is what makes it safe to use unconditionally."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works against the
    same names the DuckDB oracle uses."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
