"""Silver-path scalar operators (SURVEY §2.2 P2-P4, §2.7 C1-C7) expressed
over the driver's star schema: ``events.props`` plays bronze ``raw_json``
(JSON-in-string), part/customer strings play the normalization targets.

The full bronze→silver→gold medallion semantics over brewery-shaped data
live in ``pipelines.medallion`` (exercised by unit tests against the
reference's own fixtures, FIXTURES.md §§3-5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from breweries_case_spark.functions import clean_text, digits_only
from breweries_case_spark.io.reader import load_table

# props payload schema — one declared parse, not N get_json_object calls
# (SURVEY §2.2 P2: from_json preferred over 12 JSONPath extractions because
# it parses the string ONCE; at 100 TB the 12x reparse is pure waste).
PROPS_SCHEMA = T.StructType([T.StructField("k", T.StringType(), True)])


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (reference P2,
    breweries_silver_processors.py:36-47)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", PROPS_SCHEMA))
    return parsed.select("event_id", F.col("p.k").alias("k"))


def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String→double cast of a JSON-extracted field (reference P3,
    breweries_silver_processors.py:44-45 longitude/latitude)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", PROPS_SCHEMA))
    return parsed.select(
        "event_id", F.col("p.k").cast(T.DoubleType()).alias("k_double")
    )


def q_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct→JSON-string serialization — the distributed form of the
    reference's driver-side json.dumps per record (reference P4,
    breweries_bronze_processors.py:145)."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.to_json(F.struct("n_nationkey", "n_name")).alias("raw_json"),
    )


def q_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trim / lower(trim) / upper(trim) normalization (reference C1-C3,
    breweries_silver_processors.py:53-59)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        clean_text(F.col("p_name")).alias("name_clean"),
        clean_text(F.col("p_type"), case="lower").alias("type_norm"),
        clean_text(F.col("p_brand"), case="upper").alias("brand_norm"),
    )


def q_regexp_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digits-only normalization (reference C4: phone regexp_replace,
    breweries_silver_processors.py:62)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey", digits_only(F.col("c_name")).alias("name_digits")
    )


def q_write_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: dynamic partition overwrite idempotency (reference S5,
    breweries_bronze_processors.py:133,149-153; idempotency proven by
    reference tests/unit/test_bronze.py:89-109). Writes 3 date partitions,
    reruns ONE with half the rows, and returns per-partition counts read
    back from disk — the rerun partition shrinks, the others are untouched.
    Result is materialized to a local relation so the scratch dir can be
    cleaned up before the driver collects."""
    import shutil
    import tempfile

    from breweries_case_spark.io.writer import (
        read_partitioned,
        write_partition_overwrite,
    )

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("date")
    )
    dates = [
        r[0]
        for r in orders.select("o_orderdate")
        .distinct()
        .orderBy("o_orderdate")
        .limit(3)
        .collect()
    ]
    subset = orders.filter(F.col("o_orderdate").isin(dates))
    tmp = tempfile.mkdtemp(prefix="q_write_dyn_")
    try:
        write_partition_overwrite(subset, tmp, "o_orderdate")
        rerun = subset.filter(
            (F.col("o_orderdate") == dates[0]) & (F.col("o_orderkey") % 2 == 0)
        )
        write_partition_overwrite(rerun, tmp, "o_orderdate")
        summary = (
            read_partitioned(spark, tmp)
            .groupBy("o_orderdate")
            .agg(F.count("*").alias("n_orders"))
            .orderBy("o_orderdate")
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(summary, "o_orderdate date, n_orders long")


QUERIES = {
    "q_json_extract": q_json_extract,
    "q_cast": q_cast,
    "q_to_json": q_to_json,
    "q_clean_normalize": q_clean_normalize,
    "q_regexp_replace": q_regexp_replace,
    "q_write_dynamic_overwrite": q_write_dynamic_overwrite,
}

#: q_write_dynamic_overwrite gained an oracle in the r4 third wave: its
#: read-back summary is a deterministic function of orders (first date's
#: partition halved to even orderkeys by the rerun, the others carried
#: forward), so the driver value-checks the overwrite-idempotency WRITE
#: path, not just row counts.

ORACLES = {
    "q_write_dynamic_overwrite": """
        WITH d AS (
            SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt
            FROM orders ORDER BY 1 LIMIT 3),
        r AS (SELECT dt, ROW_NUMBER() OVER (ORDER BY dt) AS rk FROM d)
        SELECT r.dt AS o_orderdate,
               CAST(COUNT(CASE WHEN r.rk > 1 OR o.o_orderkey % 2 = 0
                          THEN 1 END) AS BIGINT) AS n_orders
        FROM r JOIN orders o ON CAST(o.o_orderdate AS DATE) = r.dt
        GROUP BY 1
    """,
    "q_json_extract": """
        SELECT event_id, json_extract_string(props, '$.k') AS k FROM events
    """,
    "q_cast": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_double
        FROM events
    """,
    "q_to_json": """
        SELECT n_nationkey,
               to_json(struct_pack(n_nationkey := n_nationkey,
                                   n_name := n_name)) AS raw_json
        FROM nation
    """,
    "q_clean_normalize": """
        SELECT p_partkey,
               trim(p_name) AS name_clean,
               lower(trim(p_type)) AS type_norm,
               upper(trim(p_brand)) AS brand_norm
        FROM part
    """,
    "q_regexp_replace": """
        SELECT c_custkey,
               regexp_replace(c_name, '[^0-9]', '', 'g') AS name_digits
        FROM customer
    """,
}
