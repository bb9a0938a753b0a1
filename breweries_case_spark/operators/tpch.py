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


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking (adapted: synthetic lineitem has
    no l_commitdate/l_receiptdate — "late" means shipped after the order
    date, the analogous lateness predicate). EXISTS decorrelates to a
    left-semi join; the quarter filter reaches the orders scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change: the pure scan-throughput
    probe — every predicate is scan-pushable (shipdate range, discount
    band, quantity cap) and the plan is scan → filter → one global agg,
    zero shuffles before the single-row exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            decimal_sum(
                F.col("l_extendedprice") * F.col("l_discount"), scale=6
            ).alias("revenue")
        )
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode/priority (adapted: no l_shipmode or
    l_commitdate — grouped by l_linestatus, "late" = shipped >30 days
    after order date). Conditional aggregation over one big join whose
    only shuffle is the orderkey exchange AQE plans."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect (adapted: synthetic p_type is a single
    word, so the predicate is equality with 'PROMO', not LIKE 'PROMO%').
    The part side is dimension-small relative to lineitem; AQE broadcasts
    it at this SF, and at 100 TB the partkey exchange is the plan. The
    final scalar is a double division of two decimal-exact sums —
    bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    promo = decimal_sum(
        F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(0.0),
        scale=6,
    )
    total = decimal_sum(_disc_price(), scale=6)
    return joined.agg(
        (F.lit(100.0) * promo / total).alias("promo_revenue_pct")
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customer: groupBy-HAVING on the fact table
    feeding a semi-filterable join back to orders/customer. The HAVING
    threshold (sum qty > 250) keeps the join input tiny — the shape where
    AQE's runtime row counts flip the second join to broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(decimal_sum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue (adapted: no p_container — the three
    disjunctive branches pair brand with size and quantity bands). The
    probe for OR-of-ANDs handling: the join key is shared across
    branches, so it stays ONE equi-join with a residual disjunction, not
    a union of three joins — and the partkey filter implied by all
    branches still prunes the part scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(decimal_sum(_disc_price(), scale=6).alias("revenue"))
    )


QUERIES = {
    "q_tpch_q1": q_tpch_q1,
    "q_tpch_q3": q_tpch_q3,
    "q_tpch_q4": q_tpch_q4,
    "q_tpch_q5": q_tpch_q5,
    "q_tpch_q6": q_tpch_q6,
    "q_tpch_q10": q_tpch_q10,
    "q_tpch_q12": q_tpch_q12,
    "q_tpch_q14": q_tpch_q14,
    "q_tpch_q18": q_tpch_q18,
    "q_tpch_q19": q_tpch_q19,
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
    "q_tpch_q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q_tpch_q6": """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                   AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q_tpch_q12": """
        SELECT l_linestatus,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "q_tpch_q14": f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                   ELSE CAST(0.0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(SUM({_DISC_SQL}) AS DOUBLE) AS promo_revenue_pct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    "q_tpch_q18": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(total_qty AS DOUBLE) AS total_qty
        FROM (SELECT l_orderkey,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250) big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
    """,
    "q_tpch_q19": f"""
        SELECT CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
}
