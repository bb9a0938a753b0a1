"""JDBC source/sink (SURVEY §2.1 source-family breadth — the reference
ingests only REST + Iceberg; JDBC is the other canonical enterprise
source, and Spark's connector surface is identical for any driver on the
classpath).

Local stand-in: embedded Derby (ships with Spark for the Hive metastore)
holding an in-memory database — the same `format("jdbc")` reader/writer
code path as Postgres/MySQL in production, no network required.

Scale notes: a naive JDBC read is ONE task holding one connection — a
single-threaded pipe regardless of cluster size. The reader here always
passes partitionColumn/lowerBound/upperBound/numPartitions so Spark
issues numPartitions range-predicated queries in parallel; at 100 TB you
size numPartitions to what the database can serve concurrently and use
a key with uniform range density (skewed ranges → straggler tasks —
pre-compute quantile bounds when the key is non-uniform). Pushdown:
Spark sends filters/column pruning into the JDBC query (catalyst
`PushedFilters` apply to the generated WHERE clause)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from breweries_case_spark.io.reader import load_table

DERBY_URL = "jdbc:derby:memory:spark_graft_jdbc;create=true"
JDBC_READ_PARTITIONS = 4


def write_jdbc(df: DataFrame, table: str, url: str = DERBY_URL) -> None:
    """Write a DataFrame to a JDBC table (overwrite = drop/recreate —
    each executor task opens its own connection and batch-inserts its
    partition)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .mode("overwrite")
        .save()
    )


def read_jdbc_partitioned(
    spark: SparkSession,
    table: str,
    partition_column: str,
    lower: int,
    upper: int,
    url: str = DERBY_URL,
    num_partitions: int = JDBC_READ_PARTITIONS,
) -> DataFrame:
    """Parallel JDBC read: numPartitions range-predicated queries, one
    per task — the distributed read contract (never the one-connection
    default)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower))
        .option("upperBound", str(upper))
        .option("numPartitions", str(num_partitions))
        .load()
    )


def q_ingest_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC round-trip: stage the nation table into embedded Derby, read
    it back with a 4-way partitioned range scan on n_nationkey. The
    oracle is the roundtrip pattern (q_ingest_staged_orc's): a plain
    SELECT over the SOURCE table — the oracle never models Derby; it
    value-checks that the write→read round trip is lossless, so any
    insert-side batching bug, range-predicate gap/overlap between the 4
    partition queries, or type mangling breaks the hash. The registered
    query exercises BOTH connector directions — executor-side batch
    insert and parallel range-predicated select."""
    nation = load_table(spark, sf_dir, "nation")
    write_jdbc(nation, "nation_jdbc")
    out = read_jdbc_partitioned(
        spark, "nation_jdbc", "n_nationkey", lower=0, upper=25
    )
    return out.select("n_nationkey", "n_name", "n_regionkey")


QUERIES = {"q_ingest_jdbc": q_ingest_jdbc}
ORACLES: dict[str, str] = {
    "q_ingest_jdbc": """
        SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
}
