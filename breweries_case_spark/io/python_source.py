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
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

N_PAGES = 10
PAGE_SIZE = 100


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


def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed paginated ingest through the registered Python
    DataSource (sf_dir unused — the source is the synthetic API). The
    oracle regenerates the same rows in DuckDB from generate_series +
    md5, so the executor-side fetch path is value-checked end to end."""
    spark.dataSource.register(PagedApiDataSource)
    return spark.read.format("paged_api").load()


QUERIES = {
    "q_python_datasource": q_python_datasource,
}

ORACLES = {
    "q_python_datasource": f"""
        SELECT CAST(rid // {PAGE_SIZE} AS INT) AS page,
               CAST(rid AS BIGINT) AS row_id,
               md5(CAST(rid AS VARCHAR)) AS payload
        FROM generate_series(0, {N_PAGES * PAGE_SIZE - 1}) t(rid)
    """,
}
