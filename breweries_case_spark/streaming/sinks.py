"""Streaming sinks: foreachBatch → idempotent partition overwrite
(SURVEY §7.2 phase 7 — reuses the batch writer from io.writer, the same
dynamic-overwrite idempotency story the reference uses for daily reruns,
reference ``breweries_bronze_processors.py:133,149-153``).

Semantics: each micro-batch overwrites exactly the date partitions present
in the batch. This models the reference's unit of redelivery — a FULL
partition (a day's extract) — so replaying a batch converges instead of
duplicating. For sub-partition increments you'd append + compact, or write
to Iceberg where MERGE gives row-level idempotency; the plumbing here is
identical either way (swap the body of ``_write_batch``).

Scale: foreachBatch hands each micro-batch over as a regular DataFrame, so
the write is a normal distributed parquet job — partitionBy prunes to the
touched dates, never a table rewrite."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from breweries_case_spark.io.writer import write_partition_overwrite


def stream_to_partitioned_parquet(
    events: DataFrame,
    path: str,
    checkpoint: str,
    partition_col: str = "event_date",
    ts_col: str = "ts",
    mode: str = "overwrite-partitions",
) -> StreamingQuery:
    """Start a stream writing date-partitioned parquet via foreachBatch.
    Caller drives it (processAllAvailable / awaitTermination) and stops it.

    ``mode`` makes the redelivery contract explicit:

    - ``"overwrite-partitions"`` — each micro-batch REPLACES the date
      partitions it contains. Correct ONLY when the source delivers whole
      partitions per batch (the reference's daily-extract contract);
      if a date's rows straddle micro-batches, the later batch would
      silently erase the earlier one — choose "append" for such sources.
    - ``"append"`` — each micro-batch appends files; safe for incremental
      sources (Kafka-like), replays may duplicate (dedup downstream or
      compact), idempotent re-processing comes from the checkpoint."""
    if mode not in ("overwrite-partitions", "append"):
        raise ValueError(f"unknown mode {mode!r}")
    with_date = events.withColumn(partition_col, F.to_date(F.col(ts_col)))

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if mode == "overwrite-partitions":
            write_partition_overwrite(batch_df, path, partition_col)
        else:
            batch_df.write.mode("append").partitionBy(partition_col).parquet(path)

    return (
        with_date.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
