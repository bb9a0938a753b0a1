"""Explicit schemas for every persistent table (SURVEY.md §1.4).

The reference mandates explicit schemas ("PySpark: explicit schemas, coherent
partitioning", reference ``README.md:181``) and declares them twice — SQL DDL
(``sql/table/*.sql``) and StructType (``setup/create_tables_script.py``).
Here each schema lives once, as the StructType, with DDL derivable via
``schema.simpleString()``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Medallion (brewery-shaped) tables -------------------------------------
# bronze: raw payload as one JSON string + partition date
# (reference setup/create_tables_script.py:61-64)
BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("raw_json", T.StringType(), False),
        T.StructField("extraction_date", T.DateType(), False),
    ]
)

# silver: conformed/typed (reference setup/create_tables_script.py:84-97)
SILVER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("brewery_type", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("postal_code", T.StringType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("phone", T.StringType(), True),
        T.StructField("website_url", T.StringType(), True),
        T.StructField("extraction_date", T.DateType(), False),
    ]
)

# gold: aggregated (reference setup/create_tables_script.py:115-123)
GOLD_SCHEMA = T.StructType(
    [
        T.StructField("brewery_type", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("brewery_count", T.LongType(), False),
        T.StructField("unique_brewery_count", T.LongType(), False),
        T.StructField("extraction_date", T.DateType(), False),
    ]
)

# The API payload shape parsed out of raw_json at silver (FIXTURES.md §1;
# reference src/processors/breweries_silver_processors.py:36-47 reads these
# 12 paths). Declared once so bronze→silver uses a single from_json parse
# instead of 12 get_json_object calls.
BREWERY_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("brewery_type", T.StringType(), True),
        T.StructField("address_1", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state_province", T.StringType(), True),
        T.StructField("postal_code", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("longitude", T.StringType(), True),
        T.StructField("latitude", T.StringType(), True),
        T.StructField("phone", T.StringType(), True),
        T.StructField("website_url", T.StringType(), True),
    ]
)

# --- Star-schema / extension tables (driver testdata, TESTDATA.md) ----------
# The generator has encoded ts differently across driver rounds:
# TIMESTAMP(NANOS) (Spark's vectorized reader rejects it; scan as a raw
# nanos long with spark.sql.legacy.parquet.nanosAsLong and truncate to
# microseconds) and TIMESTAMP(MICROS) isAdjustedToUTC=false (arrives as
# TIMESTAMP_NTZ; reinterpret the wall time in the UTC session zone).
# Either way every operator sees EVENTS_SCHEMA — the post-load shape.
# io.reader.load_table and streaming.windows.stream_events both implement
# this contract; tests/test_medallion.py pins declared == loaded.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # nanos since epoch
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

EVENTS_RAW_SCHEMA_NTZ = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),  # micros, wall time
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# tz-aware (isAdjustedToUTC) micros: already an instant — read as
# TIMESTAMP, no cast needed
EVENTS_RAW_SCHEMA_LTZ = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),  # micros, UTC instant
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),  # micros after load
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON-in-string
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Multimodal: media as opaque binary + typed metadata struct (north-star X5).
# Decode/feature-extraction is a Pandas-UDF stage over this schema
# (operators/multimodal.py); the binary column never round-trips through
# Python row-at-a-time.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)
