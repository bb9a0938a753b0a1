"""Modern Spark 4 SQL surface: VARIANT semi-structured processing,
recursive CTEs, and correlated LATERAL joins — capabilities the reference
era (Spark 3.5) lacked or worked around, now first-class in the engine.

- VARIANT upgrades the reference's bronze→silver JSON story
  (``get_json_object`` per field, reference
  ``src/processors/breweries_silver_processors.py:36-47``): one
  ``parse_json`` produces a typed binary-encoded value that downstream
  projections shred WITHOUT re-parsing — at 100 TB the parse cost is paid
  once per row, not once per extracted field.
- Recursive CTEs (new in Spark 4) replace driver-side loops for
  fixpoint-shaped queries; the date-spine id here is the canonical
  reporting shape (LEFT JOIN events so zero-activity days surface).
- LATERAL gives per-row correlated subqueries — top-N-per-key without a
  window over the full partition; Catalyst decorrelates it to a
  rank-limited join.

All three ids run through ``spark.sql`` over the registered views — the
same front end as ``q_sql_interactive`` (SURVEY §3.4) — and have DuckDB
oracle twins (DuckDB speaks the same ANSI shapes; only the date-increment
and JSON-extract spellings differ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from breweries_case_spark.io.reader import load_table, register_views


def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through the VARIANT type: parse each
    event's ``props`` JSON once, then shred typed fields from the
    variant. ``variant_get`` returns NULL (not an error) for missing
    paths — the schema-drift-tolerant semantics the reference's silver
    layer relied on ``get_json_object`` for. Narrow per-row projection;
    the variant parse is the single-parse upgrade of 12 stacked
    ``get_json_object`` calls (SURVEY §2.2 P2)."""
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json: malformed payloads become NULL variants instead of
    # failing the scan (DuckDB's json_extract errors on garbage, so the
    # oracle twin relies on the data contract that props is valid JSON —
    # the Spark side no longer does)
    v = F.try_parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k_int"),
        (k % 10).alias("k_bucket"),
        F.try_variant_get(v, "$.missing", "string").alias("absent_field"),
    )


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE date spine (Jan 2024) LEFT-joined to daily event
    counts — days with zero events appear with n_events=0, which a plain
    GROUP BY over events cannot produce. The recursion is 30 rows on the
    driver-side plan; the join against events is the only distributed
    work (one shuffle, or broadcast of the spine — AQE's choice, and the
    spine side is trivially broadcastable at any scale)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE spine(dt) AS (
            SELECT DATE '2024-01-01'
            UNION ALL
            SELECT date_add(dt, 1) FROM spine WHERE dt < DATE '2024-01-30'
        )
        SELECT s.dt, COUNT(e.event_id) AS n_events
        FROM spine s LEFT JOIN events e ON CAST(e.ts AS DATE) = s.dt
        GROUP BY s.dt
        """
    )


def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via a correlated LATERAL subquery
    (ORDER BY totalprice DESC, keyed tie-break, LIMIT 2) — the
    per-row-subquery spelling of top-N-per-key. Catalyst decorrelates
    this to a partitioned rank under the hood, so the plan matches the
    window formulation (q_window_rank) while the SQL stays the shape an
    analyst migrating from Postgres/DuckDB writes. Inner lateral:
    customers without orders drop out (both engines)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        """
    )


#: bits interleaved per dimension (16+16 → 32-bit z-value) and the coarse
#: bucket width (top 14 z-bits → 16384 layout buckets)
ZORDER_BITS = 16
ZORDER_BUCKET_SHIFT = 18


def _z_interleave(a, b):
    """Morton/Z-order interleave of two ZORDER_BITS-bit values: bit i of
    ``a`` lands at position 2i, bit i of ``b`` at 2i+1. Pure shifts/
    masks/adds — exact and identical on both engines."""
    z = F.lit(0).cast("long")
    for i in range(ZORDER_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _z_interleave_sql(a: str, b: str) -> str:
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout evaluation over orders on the
    (customer, order-day) plane — the data-clustering pass behind
    Delta/Iceberg's OPTIMIZE ZORDER: interleaving the two key's bits
    makes rows close in EITHER dimension land in the same file, so
    min/max file statistics prune scans for predicates on BOTH columns,
    not just the leading sort key. Output is the layout-quality summary
    a table service records per bucket (top 14 z-bits): row count and
    the min/max range of each dimension inside the bucket — tight
    ranges ⇒ effective pruning for either predicate.

    Plan: narrow projection computes the z-value inside the scan
    (32 codegen shift/mask terms, no UDF), one hash aggregate on the
    bucket. At scale the same z-value is the ``repartitionByRange`` /
    write-ordering key and this query is the post-OPTIMIZE audit. The
    day dimension is days-since-epoch (exact integer); both dims are
    masked to ZORDER_BITS so the interleave is total."""
    o = load_table(spark, sf_dir, "orders")
    mask = (1 << ZORDER_BITS) - 1
    cust = F.col("o_custkey").bitwiseAND(F.lit(mask))
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01"))
    ).bitwiseAND(F.lit(mask))
    z = _z_interleave(cust, day)
    return (
        o.select(
            F.shiftright(z, ZORDER_BUCKET_SHIFT).alias("z_bucket"),
            F.col("o_custkey").alias("cust"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.to_date(F.lit("1970-01-01")),
            ).alias("day"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("cust").alias("min_cust"),
            F.max("cust").alias("max_cust"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
        )
    )


QUERIES = {
    "q_variant_json": q_variant_json,
    "q_recursive_cte": q_recursive_cte,
    "q_lateral_topn": q_lateral_topn,
    "q_zorder_layout": q_zorder_layout,
}


ORACLES = {
    "q_zorder_layout": f"""
        WITH base AS (
            SELECT (o_custkey & {(1 << ZORDER_BITS) - 1}) AS cm,
                   (date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE))
                    & {(1 << ZORDER_BITS) - 1}) AS dm,
                   o_custkey AS cust,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS day
            FROM orders),
        zed AS (
            SELECT ({_z_interleave_sql("cm", "dm")})
                       >> {ZORDER_BUCKET_SHIFT} AS z_bucket,
                   cust, day
            FROM base)
        SELECT z_bucket, COUNT(*) AS n_rows,
               MIN(cust) AS min_cust, MAX(cust) AS max_cust,
               MIN(day) AS min_day, MAX(day) AS max_day
        FROM zed GROUP BY 1
    """,
    "q_variant_json": """
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INT) AS k_int,
               CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
               CAST(json_extract_string(props, '$.missing') AS VARCHAR)
                   AS absent_field
        FROM events
    """,
    "q_recursive_cte": """
        WITH RECURSIVE spine(dt) AS (
            SELECT DATE '2024-01-01'
            UNION ALL
            SELECT dt + 1 FROM spine WHERE dt < DATE '2024-01-30'
        )
        SELECT s.dt, COUNT(e.event_id) AS n_events
        FROM spine s LEFT JOIN events e ON CAST(e.ts AS DATE) = s.dt
        GROUP BY s.dt
    """,
    "q_lateral_topn": """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
    """,
}
