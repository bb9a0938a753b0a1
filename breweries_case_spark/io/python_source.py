"""Spark 4 Python DataSource: the reference's paginated REST ingest
re-expressed as a genuinely DISTRIBUTED source.

The reference fetches pages in a driver-side loop
(``src/processors/breweries_bronze_processors.py:59-125``: GET page N,
append, stop on short page) and only then parallelizes via
``createDataFrame`` — at scale the driver is the bottleneck and the
single ingest thread caps throughput. Spark 4's Python DataSource API
moves the fetch INTO executor tasks: each page is an ``InputPartition``,
so 1000 executors fetch 1000 pages concurrently, and the rows enter the
scan as a normal leaf — filter/projection pushdown and AQE apply
downstream.

The sandbox has no network, so the page "fetch" here is a deterministic
synthetic payload (md5 of the row id — reproducible in DuckDB, which
makes this the rare INGEST id with a value-checked oracle). A real
deployment swaps ``_fetch_page`` for an HTTP GET wrapped in
``io.rest_source``'s retrying session; the partition shape, schema
declaration, and executor-side execution are exactly what production
uses. Contrast with ``q_ingest_rest``, which keeps the reference's
driver-side topology for mock-server parity testing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

N_PAGES = 10
PAGE_SIZE = 100
#: pages admitted per micro-batch by the streaming reader — the
#: maxFilesPerTrigger analog for a paginated API
PAGES_PER_BATCH = 3


def _fetch_page(page: int, page_size: int):
    """One page of the synthetic API: the stand-in for a retried HTTP GET.
    Runs inside an executor task (one call per InputPartition)."""
    import hashlib

    for i in range(page_size):
        rid = page * page_size + i
        yield (page, rid, hashlib.md5(str(rid).encode()).hexdigest())


class PagedApiDataSource(DataSource):
    """``spark.read.format("paged_api")`` — options: pages, page_size."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return "page INT, row_id BIGINT, payload STRING"

    def reader(self, schema) -> "_PagedApiReader":
        return _PagedApiReader(self.options)

    def streamReader(self, schema) -> "_PagedApiStreamReader":
        return _PagedApiStreamReader(self.options)


class _PagedApiReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_pages = int(options.get("pages", N_PAGES))
        self.page_size = int(options.get("page_size", PAGE_SIZE))

    def partitions(self):
        # one partition per API page — the unit of executor-side fetch
        # parallelism (the driver never sees row data, only this list)
        return [InputPartition(p) for p in range(self.n_pages)]

    def read(self, partition):
        return _fetch_page(partition.value, self.page_size)


class _PagedApiStreamReader(DataSourceStreamReader):
    """Streaming form of the paged ingest (Spark 4
    ``DataSourceStreamReader``): offsets are page numbers, each trigger
    admits up to PAGES_PER_BATCH new pages (the ``maxFilesPerTrigger``
    analog — backpressure for a rate-limited API), and each admitted
    page is one InputPartition fetched INSIDE an executor task. Exactly
    the Kafka-less topology a production REST/CDC feed uses: the driver
    tracks only (start, end) page offsets; row data never crosses it.
    Offsets are durable in the checkpoint log, so restart resumes from
    the committed page — at-least-once into an idempotent sink
    (streaming.sinks' partition overwrite) gives effective
    exactly-once."""

    def __init__(self, options) -> None:
        self.n_pages = int(options.get("pages", N_PAGES))
        self.page_size = int(options.get("page_size", PAGE_SIZE))
        self.pages_per_batch = int(
            options.get("pages_per_batch", PAGES_PER_BATCH)
        )
        self._seen = 0  # driver-side high-water mark across triggers

    def initialOffset(self) -> dict:
        return {"page": 0}

    def latestOffset(self) -> dict:
        # each trigger "discovers" up to pages_per_batch new pages until
        # the API is exhausted — the deterministic replay cadence
        self._seen = min(self.n_pages, self._seen + self.pages_per_batch)
        return {"page": self._seen}

    def partitions(self, start: dict, end: dict):
        return [InputPartition(p) for p in range(start["page"], end["page"])]

    def read(self, partition):
        return _fetch_page(partition.value, self.page_size)

    def commit(self, end: dict) -> None:
        pass  # the synthetic API needs no ack; a real feed acks here


def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed paginated ingest through the registered Python
    DataSource (sf_dir unused — the source is the synthetic API). The
    oracle regenerates the same rows in DuckDB from generate_series +
    md5, so the executor-side fetch path is value-checked end to end."""
    spark.dataSource.register(PagedApiDataSource)
    return spark.read.format("paged_api").load()


def q_python_datasource_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming paginated ingest replay: readStream over the
    registered Python DataSource, pages admitted PAGES_PER_BATCH per
    micro-batch (10 pages → 4 genuine batches, unlike the single-batch
    file replays), driven to completion into a memory sink. Append of
    disjoint page partitions is batch-split-invariant, so the SAME
    oracle as the batch twin value-checks the streaming path end to
    end — offset tracking, per-trigger admission, executor-side fetch,
    and sink append all included."""
    from breweries_case_spark.streaming.windows import run_stream_to_memory

    spark.dataSource.register(PagedApiDataSource)
    stream = spark.readStream.format("paged_api").load()
    return run_stream_to_memory(
        stream, "python_datasource_stream_out", output_mode="append"
    )


QUERIES = {
    "q_python_datasource": q_python_datasource,
    "q_python_datasource_stream": q_python_datasource_stream,
}

_PAGED_ORACLE = f"""
        SELECT CAST(rid // {PAGE_SIZE} AS INT) AS page,
               CAST(rid AS BIGINT) AS row_id,
               md5(CAST(rid AS VARCHAR)) AS payload
        FROM generate_series(0, {N_PAGES * PAGE_SIZE - 1}) t(rid)
    """
ORACLES = {
    "q_python_datasource": _PAGED_ORACLE,
    # append of disjoint page partitions — batch-split-invariant, so the
    # streaming replay shares the batch oracle
    "q_python_datasource_stream": _PAGED_ORACLE,
}
