"""breweries_case_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
``danielfdc/breweries_case`` (a medallion Bronze→Silver→Gold lakehouse PoC,
see SURVEY.md) as a reusable, idiomatic Spark engine:

- ``session``     — SparkSession factories (prod / test profiles)
- ``schemas``     — explicit StructTypes for every persistent table
- ``io``          — parquet star-schema reader, partition-overwrite writer,
                    paginated REST source
- ``operators``   — the full relational surface (scans, filters, projections,
                    joins, aggregations, windows, set ops) plus LLM-data
                    operators (dedup, similarity search, text analysis,
                    multimodal plumbing)
- ``pipelines``   — bronze/silver/gold medallion pipelines as pure functions
- ``streaming``   — Structured Streaming windows over the events table

Everything is built on public Apache Spark APIs only.  Design target is a
1000-executor cluster at ~100 TB; tests run on local[*] at small scale
factors for correctness.
"""

__version__ = "0.1.0"
