"""Spatial operators: grid-cell-blocked radius self-join — the
geospatial analog of LSH blocking (north-star §2.9 extension; the
reference has no spatial surface, but Open Brewery DB rows carry
longitude/latitude, `src/processors/breweries_bronze_processors.py`'s
API payload, so "breweries within r of each other" is the natural query
a user of that dataset asks next).

Fixture: the synthetic tables carry no coordinates, so each customer
gets a deterministic pseudo-location derived from md5(custkey) —
uniform over [-90,90)×[-180,180), regenerated identically by the
DuckDB oracle (same fixture discipline as entity.py's pseudo-address).

Distance is SQUARED PLANAR DEGREES, not haversine: sin/cos differ in
the last ulp across libm builds, which would break oracle bit-equality
(the determinism stance of analytics.py). The blocking geometry is
identical either way — production swaps the final filter expression for
haversine and nothing else changes.

Scale: this is the standard grid (geohash-bucket) spatial join. Each
point maps to one cell of side = radius; candidate pairs come from
equi-joining each point's cell against its 3×3 neighborhood (explode 9
offsets on ONE side — the candidate set provably covers every pair
within r). One shuffle on cell id; density skew (cities) is the hazard
— sub-split hot cells exactly like salted joins. The oracle is the
O(n²) cross-join ground truth; the grid plan was measured emitting
IDENTICAL pairs at sf0.001/0.01."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from breweries_case_spark.io.reader import load_table

#: radius in planar degrees (cell side = radius)
GEO_RADIUS_DEG = 2.0


def _located_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(key, lat, lon) with md5-derived uniform pseudo-coordinates."""
    c = load_table(spark, sf_dir, "customer")

    def h48(tag: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(tag), F.col("c_custkey").cast("string"))
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")

    return c.select(
        F.col("c_custkey").alias("key"),
        ((h48("lat") % 1_800_000) / 10_000.0 - 90.0).alias("lat"),
        ((h48("lon") % 3_600_000) / 10_000.0 - 180.0).alias("lon"),
    )


def q_geo_join_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within GEO_RADIUS_DEG of each other (squared
    planar distance), via the grid-blocked join described in the module
    docstring. Output: (key_a, key_b, dist2) with key_a < key_b."""
    r = GEO_RADIUS_DEG
    pts = _located_customers(spark, sf_dir).select(
        "key",
        "lat",
        "lon",
        F.floor(F.col("lat") / r).cast("long").alias("cx"),
        F.floor(F.col("lon") / r).cast("long").alias("cy"),
    )
    offsets = F.expr(
        "array(-1L, 0L, 1L)"
    )
    probe = (
        pts.withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            F.col("key").alias("key_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    build = pts.select(
        F.col("key").alias("key_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "cx",
        "cy",
    )
    dist2 = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lon_a") - F.col("lon_b")) * (
        F.col("lon_a") - F.col("lon_b")
    )
    return (
        probe.join(build, ["cx", "cy"])
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(dist2 <= F.lit(r * r))
        .select(
            "key_a",
            "key_b",
            (F.floor(dist2 * 1e6 + F.lit(0.5)) / 1e6).alias("dist2"),
        )
    )


_LOCATED_CTE = """
        pts AS (
            SELECT c_custkey AS key,
                   (CAST(concat('0x', substr(md5('lat' ||
                        CAST(c_custkey AS VARCHAR)), 1, 12)) AS BIGINT)
                        % 1800000) / 10000.0 - 90.0 AS lat,
                   (CAST(concat('0x', substr(md5('lon' ||
                        CAST(c_custkey AS VARCHAR)), 1, 12)) AS BIGINT)
                        % 3600000) / 10000.0 - 180.0 AS lon
            FROM customer)
"""

QUERIES = {
    "q_geo_join_radius": q_geo_join_radius,
}

ORACLES = {
    "q_geo_join_radius": "WITH "
    + _LOCATED_CTE
    + f"""
        SELECT a.key AS key_a, b.key AS key_b,
               FLOOR(((a.lat - b.lat) * (a.lat - b.lat)
                      + (a.lon - b.lon) * (a.lon - b.lon)) * 1000000.0
                     + 0.5) / 1000000.0 AS dist2
        FROM pts a JOIN pts b ON a.key < b.key
        WHERE (a.lat - b.lat) * (a.lat - b.lat)
              + (a.lon - b.lon) * (a.lon - b.lon)
                  <= {GEO_RADIUS_DEG * GEO_RADIUS_DEG!r}
    """,
}
