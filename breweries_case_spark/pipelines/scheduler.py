"""Scheduler glue — the engine dropped into a daily orchestrator.

The reference sequences three thin Airflow DAGs (bronze → silver → gold,
chained with ExternalTaskSensor: ``dags/01_dag_elt_breweries_bronze.py:24-49``,
``dags/02_dag_etl_breweries_silver.py:64-71``). Here the medallion sequence
is already one idempotent library call (``pipelines.medallion.run_medallion``
— rerunning a date replaces exactly that date's partitions in all three
layers), so the scheduler wrapper is deliberately thin:

- ``daily_task`` — the PythonOperator-callable shape: parse the scheduler's
  ``ds`` string, build a session, fetch, run, stop. Works verbatim as an
  Airflow python_callable, a cron entry (``python -m
  breweries_case_spark.pipelines.scheduler 2024-01-15 /data/medallion``),
  or any other scheduler that can call Python.
- ``build_airflow_dag`` — import-gated DAG factory for deployments that DO
  have Airflow: one DAG, one task per day, same callable. Raises a clear
  error when airflow isn't installed (this runtime doesn't ship it).

Scale stance: the scheduler owns WHEN; the engine owns correctness under
reruns (dynamic partition overwrite) — so backfills are just re-invocations
for old dates, no special backfill code path.
"""

from __future__ import annotations

import datetime as _dt
import logging
from collections.abc import Callable, Iterable, Mapping

logger = logging.getLogger(__name__)

RecordFetcher = Callable[[], Iterable[Mapping]]


def _default_fetcher() -> Iterable[Mapping]:
    from breweries_case_spark.io.rest_source import (
        fetch_paginated,
        synthetic_page_fetcher,
    )

    # production swaps in http_page_fetcher(base_url); the synthetic pages
    # keep the wrapper runnable offline
    return fetch_paginated(synthetic_page_fetcher(), per_page=200)


def daily_task(
    execution_date: str,
    base_path: str,
    fetcher: RecordFetcher = _default_fetcher,
) -> dict[str, int]:
    """One scheduled run: the reference's run_*_etl body
    (``dags/02_dag_etl_breweries_silver.py:26-50``) for all three layers.
    Returns the per-layer audit counts the scheduler logs."""
    from pyspark.sql import SparkSession

    from breweries_case_spark.pipelines.medallion import run_medallion
    from breweries_case_spark.session import get_session

    day = _dt.datetime.strptime(execution_date, "%Y-%m-%d").date()
    # stop the session only if this task CREATED it — get_session
    # getOrCreate()s, and stopping a session some host process (notebook,
    # test harness, long-lived worker) already owns would strand it
    owned = SparkSession.getActiveSession() is None
    spark = get_session(app_name=f"medallion_{execution_date}")
    try:
        counts = run_medallion(spark, fetcher(), day, base_path)
        logger.info("medallion %s: %s", execution_date, counts)
        return counts
    finally:
        if owned:
            spark.stop()


def build_airflow_dag(
    base_path: str,
    dag_id: str = "breweries_medallion_daily",
    schedule: str = "@daily",
    fetcher: RecordFetcher = _default_fetcher,
):
    """Airflow DAG factory (import-gated): one PythonOperator running
    ``daily_task`` with the scheduler-templated ``ds``. The reference's
    three sensor-chained DAGs collapse to one task because layer
    sequencing + idempotency live in the engine, not the scheduler."""
    try:
        from airflow import DAG
        from airflow.operators.python import PythonOperator
    except ImportError as exc:  # pragma: no cover - airflow not in this image
        raise RuntimeError(
            "apache-airflow is not installed; use daily_task() directly "
            "from your scheduler, or install airflow to build a DAG"
        ) from exc

    dag = DAG(
        dag_id,
        schedule=schedule,
        start_date=_dt.datetime(2024, 1, 1),
        catchup=False,
        tags=["breweries", "medallion"],
    )
    PythonOperator(
        task_id="run_medallion",
        python_callable=lambda ds, **_: daily_task(ds, base_path, fetcher),
        dag=dag,
    )
    return dag


if __name__ == "__main__":
    import sys

    logging.basicConfig(level=logging.INFO)
    date_arg = sys.argv[1] if len(sys.argv) > 1 else _dt.date.today().isoformat()
    path_arg = sys.argv[2] if len(sys.argv) > 2 else "/tmp/breweries_medallion"
    print(daily_task(date_arg, path_arg))
