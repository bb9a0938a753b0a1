"""Catalog/DDL bootstrap — the reference's table-creation surface (S6).

Mirrors reference ``setup/create_tables_script.py:39-176`` and
``sql/table/{bronze,silver,gold}_table_ddl.sql``: three layer namespaces,
one partitioned table per layer with commented columns and table
properties, idempotent create, optional replace, and the row-count verify
the reference sketches (``create_tables_script.py:137-150``).

The reference targets an Iceberg catalog (Nessie REST). This runtime has no
``iceberg-spark-runtime`` jar, so the bootstrap is FORMAT-PARAMETRIC:

- with Iceberg on the classpath (``session.iceberg_configs()``), pass
  ``catalog="lake", fmt="iceberg"`` and the emitted DDL is the reference's
  (``USING iceberg PARTITIONED BY (extraction_date) TBLPROPERTIES ...``);
- otherwise it runs the SAME statements as ``USING parquet`` against the
  session catalog — Spark's built-in catalog persists the namespace +
  partitioned-table metadata under ``spark.sql.warehouse.dir``, which is
  the testable local analog (namespaces, partition pruning, TBLPROPERTIES
  and idempotent re-create all behave identically at the DDL level).

At 100 TB the catalog choice is a connection string, not a code change:
every statement here is catalog-qualified and the writers
(``io.writer.write_iceberg`` / dynamic-overwrite inserts) address tables by
fully-qualified name.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

# (namespace, table, column DDL) — schemas verbatim from the reference DDL
# files (sql/table/*.sql); COMMENT text preserved so DESCRIBE parity holds.
LAYER_TABLES: list[tuple[str, str, str]] = [
    (
        "bronze_layer",
        "tbl_bronze_breweries",
        """
        raw_json STRING COMMENT 'Raw JSON from API',
        extraction_date DATE COMMENT 'Date when data was extracted'
        """,
    ),
    (
        "silver_layer",
        "tbl_silver_brewery",
        """
        id STRING COMMENT 'Brewery unique identifier',
        name STRING COMMENT 'Brewery name',
        brewery_type STRING COMMENT 'Type of brewery',
        city STRING COMMENT 'City location',
        state STRING COMMENT 'State/Province',
        country STRING COMMENT 'Country',
        postal_code STRING COMMENT 'Postal code',
        longitude DOUBLE COMMENT 'Longitude coordinate',
        latitude DOUBLE COMMENT 'Latitude coordinate',
        phone STRING COMMENT 'Phone number (digits only)',
        website_url STRING COMMENT 'Website URL',
        extraction_date DATE COMMENT 'Date when data was extracted'
        """,
    ),
    (
        "gold_layer",
        "tbl_gold_brewery_agg",
        """
        brewery_type STRING COMMENT 'Type of brewery',
        country STRING COMMENT 'Country',
        state STRING COMMENT 'State/Province',
        city STRING COMMENT 'City',
        brewery_count BIGINT COMMENT 'Count of breweries',
        unique_brewery_count BIGINT COMMENT 'Count of unique breweries',
        extraction_date DATE COMMENT 'Date when data was extracted'
        """,
    ),
]

PARTITION_COL = "extraction_date"

# reference tableProperty calls (create_tables_script.py:72-74 et al.)
TABLE_PROPERTIES = (
    "'write.format.default'='parquet',"
    "'write.parquet.compression-codec'='snappy'"
)


def _fqn(catalog: str, namespace: str, table: str) -> str:
    return f"{catalog}.{namespace}.{table}"


def bootstrap_tables(
    spark: SparkSession,
    catalog: str = "spark_catalog",
    fmt: str = "parquet",
    replace: bool = False,
) -> list[str]:
    """Create the three layer namespaces + tables; returns the FQNs.

    Idempotent by default (``CREATE ... IF NOT EXISTS`` — rerunning a
    bootstrap must never clobber data, reference ``create_tables_script``
    keeps drop_existing opt-in). ``replace=True`` is the
    ``createOrReplace()`` analog: drop-then-create, yielding empty tables.
    """
    fqns: list[str] = []
    for namespace, table, columns in LAYER_TABLES:
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")
        fqn = _fqn(catalog, namespace, table)
        if replace:
            spark.sql(f"DROP TABLE IF EXISTS {fqn}")
        spark.sql(
            f"""
            CREATE TABLE IF NOT EXISTS {fqn} ({columns})
            USING {fmt}
            PARTITIONED BY ({PARTITION_COL})
            TBLPROPERTIES ({TABLE_PROPERTIES})
            """
        )
        fqns.append(fqn)
    return fqns


def verify_tables(
    spark: SparkSession, catalog: str = "spark_catalog"
) -> dict[str, int]:
    """Row count per bootstrapped table (the reference's sketched
    verify_tables, create_tables_script.py:137-150). Raises if any table is
    missing — the bootstrap contract is all-or-nothing."""
    return {
        _fqn(catalog, ns, t): spark.table(_fqn(catalog, ns, t)).count()
        for ns, t, _ in LAYER_TABLES
    }


def drop_all(spark: SparkSession, catalog: str = "spark_catalog") -> None:
    """Tear down namespaces + tables (test cleanup; the reference's
    commented drop_tables_if_exist made executable)."""
    for namespace, _, _ in LAYER_TABLES:
        spark.sql(f"DROP NAMESPACE IF EXISTS {catalog}.{namespace} CASCADE")


def list_catalog(
    spark: SparkSession,
    catalog: str = "spark_catalog",
    schema_pattern: str = "*_layer",
) -> "DataFrame":
    """Metadata exploration — the Trino ``SHOW SCHEMAS LIKE '%_layer'`` +
    ``SHOW TABLES FROM <layer>`` surface (reference ``README.md:118-137``)
    as one DataFrame of (schema_name, table_name). Pure catalog metadata:
    no data files are touched, so it is instant at any table size.

    ``catalog`` and ``schema_pattern`` are interpolated into SQL text, so
    they are validated against a conservative identifier/LIKE-pattern
    allowlist — internal callers pass constants, but the function is
    public API and must not be a quote-injection vector."""
    _IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    if not _IDENT.match(catalog):
        raise ValueError(f"invalid catalog identifier: {catalog!r}")
    if not re.match(r"^[A-Za-z0-9_*|]+$", schema_pattern):
        raise ValueError(f"invalid schema pattern: {schema_pattern!r}")
    schemas = [
        r[0]
        for r in spark.sql(
            f"SHOW SCHEMAS IN {catalog} LIKE '{schema_pattern}'"
        ).collect()
    ]
    out = None
    for ns in sorted(schemas):
        t = (
            spark.sql(f"SHOW TABLES IN {catalog}.{ns}")
            .where("NOT isTemporary")
            .selectExpr(
                f"'{ns}' AS schema_name", "tableName AS table_name"
            )
        )
        out = t if out is None else out.unionByName(t)
    if out is None:
        return spark.createDataFrame(
            [], "schema_name string, table_name string"
        )
    return out


def q_catalog_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered metadata-exploration demo (oracle-backed): bootstrap
    the reference's three layer namespaces + tables into the session
    catalog (idempotent), then enumerate them via real SHOW SCHEMAS /
    SHOW TABLES — completing the Trino interactive surface beside
    q_sql_interactive's SELECT coverage. The oracle is the reference
    DDL inventory (setup/create_tables_script.py:39-176): listing
    anything extra or missing reds the hash."""
    bootstrap_tables(spark)
    return list_catalog(spark)


QUERIES = {
    "q_catalog_listing": q_catalog_listing,
}

ORACLES = {
    "q_catalog_listing": """
        SELECT 'bronze_layer' AS schema_name,
               'tbl_bronze_breweries' AS table_name
        UNION ALL SELECT 'silver_layer', 'tbl_silver_brewery'
        UNION ALL SELECT 'gold_layer', 'tbl_gold_brewery_agg'
    """,
}
