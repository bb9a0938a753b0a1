"""Classic TPC-H queries over the driver's TPC-H-ish star schema —
the recognizable OLAP workload, adapted only where the synthetic tables
lack a column (noted per query). These exercise the composed shapes a
warehouse user actually runs: multi-way joins with dimension broadcast,
selective date filters feeding partial aggregation, and deterministic
top-k — and they're the natural scale probes, since TPC-H semantics are
defined from 1 GB to 100 TB.

Plan stance (same engine-wide rules as operators/relational.py):
filters sit adjacent to scans so they push into parquet; small dims
(region, nation) get explicit broadcast; the orders⋈lineitem exchanges
are left to AQE, which at 100 TB re-plans with runtime stats rather than
a local[32] heuristic. Double aggregates use the decimal-sum device
(functions/numeric.py) so value hashes match DuckDB bit-for-bit. Per-row
PRODUCTS (price·(1−disc)·(1+tax)) are summed at scale 6, not 2: the
engines' double→decimal casts disagree on scale-2 TIES (Spark rounds the
double's shortest decimal representation via BigDecimal, DuckDB the
binary value), but a product of three ≤2-digit factors is an exact
≤6-digit decimal sitting ~1e-11 from its double — at scale 6 both
engines recover it exactly and no tie can occur. Top-k queries carry an
explicit
key tie-break — "ORDER BY revenue DESC LIMIT n" is nondeterministic
under ties and would flap the driver's hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from breweries_case_spark.functions.numeric import decimal_avg, decimal_sum
from breweries_case_spark.io.reader import load_table

# lazy: Column construction needs an active SparkContext, so these can't
# be module-level constants
def _disc_price():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _charge():
    return _disc_price() * (1 + F.col("l_tax"))


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: one scan, map-side partial aggregation
    into 6 groups — the canonical aggregate-throughput probe."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            decimal_sum(F.col("l_quantity")).alias("sum_qty"),
            decimal_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            decimal_sum(_disc_price(), scale=6).alias("sum_disc_price"),
            decimal_sum(_charge(), scale=6).alias("sum_charge"),
            decimal_avg(F.col("l_quantity")).alias("avg_qty"),
            decimal_avg(F.col("l_extendedprice")).alias("avg_price"),
            decimal_avg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (adapted: no o_shippriority column in
    the synthetic orders table — the output carries o_orderdate only).
    Selective segment/date filters reach the scans; the two big joins are
    AQE's call; top-10 is TakeOrderedAndProject with an o_orderkey
    tie-break for determinism."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(decimal_sum(_disc_price(), scale=6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local supplier volume: 6-way join where the customer and
    supplier must share a nation. region/nation broadcast explicitly
    (25 + 5 rows); the fact-side joins stay AQE-planned."""
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(decimal_sum(_disc_price(), scale=6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting (adapted: synthetic customer has
    no address/phone/comment — the grouping carries the columns that
    exist). Top-20 customers by lost revenue on returned lineitems."""
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(decimal_sum(_disc_price(), scale=6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


QUERIES = {
    "q_tpch_q1": q_tpch_q1,
    "q_tpch_q3": q_tpch_q3,
    "q_tpch_q5": q_tpch_q5,
    "q_tpch_q10": q_tpch_q10,
}

_DISC_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"

ORACLES = {
    "q_tpch_q1": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM({_DISC_SQL}) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                    AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))) / COUNT(l_quantity), 6)
                    AS DOUBLE) AS avg_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) / COUNT(l_extendedprice), 6)
                    AS DOUBLE) AS avg_price,
               CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,6))) / COUNT(l_discount), 6)
                    AS DOUBLE) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_tpch_q3": f"""
        SELECT l_orderkey, o_orderdate,
               CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q_tpch_q5": f"""
        SELECT n_name, CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "q_tpch_q10": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue
        FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
}
