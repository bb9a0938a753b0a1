"""Scheduler wrapper smoke tests: daily_task runs the full medallion
sequence for a scheduler-shaped date string, reruns stay idempotent, and
the Airflow factory fails loudly when airflow is absent."""

from __future__ import annotations

import pytest

from breweries_case_spark.pipelines.scheduler import build_airflow_dag, daily_task


def _tiny_fetcher():
    return [
        {"id": "b-1", "name": "A", "brewery_type": "micro", "city": "X",
         "state_province": "S", "postal_code": "1", "country": "US",
         "longitude": "-1.0", "latitude": "1.0", "phone": "555",
         "website_url": None},
        {"id": "b-2", "name": "B", "brewery_type": "nano", "city": "Y",
         "state_province": "S", "postal_code": "2", "country": "US",
         "longitude": "-2.0", "latitude": "2.0", "phone": "556",
         "website_url": None},
    ]


def test_daily_task_runs_and_reruns_idempotently(spark, tmp_path):
    # daily_task builds its own session; reuse of the shared fixture session
    # is fine because get_session getOrCreate()s onto it
    base = str(tmp_path / "medallion")
    first = daily_task("2024-02-01", base, fetcher=_tiny_fetcher)
    assert first == {"bronze": 2, "silver": 2, "gold": first["gold"]}
    again = daily_task("2024-02-01", base, fetcher=_tiny_fetcher)
    assert again == first  # rerun replaces the same partitions, same audit


def test_airflow_factory_gated(monkeypatch):
    import sys

    monkeypatch.setitem(sys.modules, "airflow", None)
    with pytest.raises(RuntimeError, match="airflow"):
        build_airflow_dag("/tmp/x")
