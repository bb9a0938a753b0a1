"""Operator library — every SURVEY §2 query id as a named function
``(spark, sf_dir) -> DataFrame`` plus its DuckDB oracle SQL twin.

Each submodule exports ``QUERIES: dict[str, callable]`` and
``ORACLES: dict[str, str]`` (oracle omitted for non-SQL-expressible ops —
the driver then records a rows-only check). ``collect_registry()`` merges
them for ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from breweries_case_spark.operators import relational

    modules = [relational]
    for name in (
        "medallion_queries",
        "dedup",
        "similarity",
        "text",
        "multimodal",
        "streaming_queries",
    ):
        mod = __import__(f"breweries_case_spark.operators.{name}", fromlist=[name])
        modules.append(mod)
    from breweries_case_spark.io import rest_source

    modules.append(rest_source)

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in modules:
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLES", {})
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query ids: {dup}")
        queries.update(q)
        oracles.update(o)
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return queries, oracles
