from breweries_case_spark.pipelines.medallion import (
    ingest_to_bronze,
    bronze_to_silver,
    run_medallion,
    silver_to_gold,
)

__all__ = [
    "ingest_to_bronze",
    "bronze_to_silver",
    "run_medallion",
    "silver_to_gold",
]
