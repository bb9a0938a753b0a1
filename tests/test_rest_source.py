"""REST source error-path tests — the connectivity contract the reference
pins in tests/integration/test_connectivity.py:57-116 (page-cap stop,
partial-page stop, 429 Retry-After honored, 5xx exponential backoff,
non-retryable 404 propagates), replayed pure-Python against
fetch_paginated / with_retries / the urllib fallback fetcher. No network,
no sleeps (fake sleep or retries=0 throughout)."""

from __future__ import annotations

import io
import urllib.request
from email.message import Message
from urllib.error import HTTPError

import pytest

from breweries_case_spark.io.rest_source import (
    RetryableHTTPError,
    fetch_paginated,
    http_page_fetcher,
    with_retries,
)

# --- fetch_paginated stop conditions ----------------------------------------


def test_page_cap_stop():
    calls = []

    def full_pages(page, per_page):
        calls.append(page)
        return [{"i": i} for i in range(per_page)]

    got = fetch_paginated(full_pages, per_page=10, max_pages=3)
    assert len(got) == 30
    assert calls == [1, 2, 3]  # stops AT the cap, no probe of page 4


def test_partial_page_stop():
    def pages(page, per_page):
        return [{"i": i} for i in range(per_page if page < 2 else 3)]

    got = fetch_paginated(pages, per_page=10, max_pages=50)
    assert len(got) == 13  # one full + one partial, then stop


def test_empty_first_page_yields_nothing():
    assert fetch_paginated(lambda p, n: [], per_page=10) == []


def test_empty_page_stops_mid_run():
    def pages(page, per_page):
        return [{"i": i} for i in range(per_page)] if page <= 2 else []

    assert len(fetch_paginated(pages, per_page=5, max_pages=50)) == 10


# --- with_retries backoff contract ------------------------------------------


def test_retry_after_header_honored():
    sleeps = []
    attempts = []

    def call():
        attempts.append(1)
        if len(attempts) < 3:
            raise RetryableHTTPError(429, retry_after=7.5)
        return [{"ok": True}]

    got = with_retries(call, retries=5, backoff=0.6, sleep=sleeps.append)
    assert got == [{"ok": True}]
    assert sleeps == [7.5, 7.5]  # Retry-After wins over exponential backoff


def test_5xx_exponential_backoff_sequence():
    sleeps = []
    attempts = []

    def call():
        attempts.append(1)
        raise RetryableHTTPError(503)

    with pytest.raises(RetryableHTTPError):
        with_retries(call, retries=3, backoff=0.5, sleep=sleeps.append)
    assert sleeps == [0.5, 1.0, 2.0]  # backoff * 2^attempt
    assert len(attempts) == 4  # initial try + 3 retries, then raise


def test_success_needs_no_sleep():
    sleeps = []
    assert with_retries(lambda: [{"a": 1}], sleep=sleeps.append) == [{"a": 1}]
    assert sleeps == []


def test_non_retryable_error_propagates_immediately():
    attempts = []

    def call():
        attempts.append(1)
        raise ValueError("404 is not retryable")

    with pytest.raises(ValueError):
        with_retries(call, retries=5, sleep=lambda s: None)
    assert len(attempts) == 1  # no blind retry of non-retryable failures


# --- urllib fallback fetcher (requests made un-importable) -------------------


def _http_error(code: int, retry_after: str | None = None) -> HTTPError:
    headers = Message()
    if retry_after is not None:
        headers["Retry-After"] = retry_after
    return HTTPError("http://api.test/breweries", code, "err", headers, io.BytesIO())


@pytest.fixture()
def urllib_fetcher(monkeypatch):
    """Force the stdlib branch of http_page_fetcher and capture urlopen."""
    monkeypatch.setitem(__import__("sys").modules, "requests", None)

    state = {"responses": []}

    class _Resp:
        def __init__(self, body: bytes):
            self._body = body

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def read(self):
            return self._body

    def fake_urlopen(url, timeout=None):
        nxt = state["responses"].pop(0)
        if isinstance(nxt, Exception):
            raise nxt
        return _Resp(nxt)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    return state


def test_urllib_fallback_success(urllib_fetcher):
    urllib_fetcher["responses"] = [b'[{"id": "x"}]']
    fetch = http_page_fetcher("http://api.test/breweries", retries=0)
    assert fetch(1, 200) == [{"id": "x"}]


def test_urllib_fallback_404_propagates(urllib_fetcher):
    urllib_fetcher["responses"] = [_http_error(404)]
    fetch = http_page_fetcher("http://api.test/breweries", retries=0)
    with pytest.raises(HTTPError) as exc:
        fetch(1, 200)
    assert exc.value.code == 404  # NOT wrapped retryable: client errors fail fast


def test_urllib_fallback_429_converts_to_retryable_with_retry_after(urllib_fetcher):
    urllib_fetcher["responses"] = [_http_error(429, retry_after="3")]
    fetch = http_page_fetcher("http://api.test/breweries", retries=0)
    with pytest.raises(RetryableHTTPError) as exc:
        fetch(1, 200)
    assert exc.value.status == 429
    assert exc.value.retry_after == 3.0


def test_urllib_fallback_retries_5xx_then_succeeds(urllib_fetcher):
    # 2 transient 503s then a good page; backoff=0.0 keeps the real
    # time.sleep calls at zero duration so the test never stalls
    urllib_fetcher["responses"] = [
        _http_error(503),
        _http_error(503),
        b'[{"id": "y"}]',
    ]
    fetch = http_page_fetcher("http://api.test/breweries", retries=3, backoff=0.0)
    assert fetch(1, 200) == [{"id": "y"}]


def test_staged_csv_equals_staged_json(spark):
    """Both staged formats land byte-identical bronze rows (CSV nullValue
    declaration makes empty-string round back to NULL like JSON absent)."""
    from breweries_case_spark.io.rest_source import (
        q_ingest_staged_csv,
        q_ingest_staged_json,
    )

    csv_rows = sorted(r.raw_json for r in q_ingest_staged_csv(spark, "").collect())
    json_rows = sorted(r.raw_json for r in q_ingest_staged_json(spark, "").collect())
    assert len(csv_rows) == 450
    assert csv_rows == json_rows


def test_jdbc_roundtrip_matches_parquet(spark, sf_dir):
    """JDBC staged write + partitioned read-back must equal the parquet
    source, and the read must actually be split into range partitions."""
    from breweries_case_spark.io.jdbc_source import q_ingest_jdbc
    from breweries_case_spark.io.reader import load_table

    back = q_ingest_jdbc(spark, sf_dir)
    assert back.rdd.getNumPartitions() == 4
    got = sorted(map(tuple, back.collect()))
    want = sorted(
        map(
            tuple,
            load_table(spark, sf_dir, "nation")
            .select("n_nationkey", "n_name", "n_regionkey")
            .collect(),
        )
    )
    assert got == want


def test_staged_json_quarantine_splits_good_and_bad(spark, tmp_path):
    """Malformed lines must land in the quarantine lane with their raw
    text; valid lines parse under the declared schema; nothing vanishes."""
    from breweries_case_spark.io.rest_source import ingest_staged_json_quarantine

    p = tmp_path / "staged"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": "a1", "name": "Alpha"}\n'
        "this is not json\n"
        '{"id": "b2", "name": "Beta"}\n'
        '{"id": "c3", "name": }\n'
        '{"id": "d4", "name": "Delta"}\n'
    )
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField("id", StringType()), StructField("name", StringType())]
    )
    good, bad = ingest_staged_json_quarantine(spark, str(p), schema)
    assert sorted(r.id for r in good.collect()) == ["a1", "b2", "d4"]
    bad_lines = sorted(r.raw_line for r in bad.collect())
    assert bad_lines == ["this is not json", '{"id": "c3", "name": }']


def test_python_datasource_stream_is_genuinely_multi_batch(spark):
    """The streaming paged source must deliver in MULTIPLE rate-limited
    micro-batches (pages_per_batch admission), not one catch-up batch —
    and the union of batches must equal the batch reader's rows."""
    from breweries_case_spark.io.python_source import (
        PAGES_PER_BATCH,
        N_PAGES,
        PagedApiDataSource,
    )

    spark.dataSource.register(PagedApiDataSource)
    stream = spark.readStream.format("paged_api").load()
    q = (
        stream.writeStream.format("memory")
        .queryName("paged_stream_probe")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        data_batches = sum(
            1 for p in q.recentProgress if p["numInputRows"] > 0
        )
    finally:
        q.stop()
    expected_batches = -(-N_PAGES // PAGES_PER_BATCH)  # ceil
    assert data_batches == expected_batches, (
        f"{data_batches} data batches, expected {expected_batches}"
    )
    got = spark.table("paged_stream_probe")
    batch = spark.read.format("paged_api").load()
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
