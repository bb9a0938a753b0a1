"""Streaming semantics: real readStream replays must equal the batch
mirrors; watermark drops late data; REST source pagination/retry contract
(mirrors reference tests/integration/test_connectivity.py:57-116)."""

from __future__ import annotations

import pytest

from breweries_case_spark.io.rest_source import (
    DEFAULT_MAX_PAGES,
    RetryableHTTPError,
    fetch_paginated,
    synthetic_page_fetcher,
    with_retries,
)
from breweries_case_spark.operators.streaming_queries import (
    q_sessionize_lag,
    q_stream_session,
    q_stream_session_batch,
    q_stream_tumbling,
    q_stream_tumbling_batch,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(cols).collect())


def test_stream_tumbling_equals_batch(spark, sf_dir):
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    stream = _rows(q_stream_tumbling(spark, sf_dir), cols)
    batch = _rows(q_stream_tumbling_batch(spark, sf_dir), cols)
    assert stream == batch


def test_stream_sliding_equals_batch(spark, sf_dir):
    from breweries_case_spark.operators.streaming_queries import (
        q_stream_sliding,
        q_stream_sliding_batch,
    )

    cols = ["window_start", "event_type", "n_events"]
    stream = _rows(q_stream_sliding(spark, sf_dir), cols)
    batch = _rows(q_stream_sliding_batch(spark, sf_dir), cols)
    assert stream == batch


def test_stream_session_equals_batch(spark, sf_dir):
    cols = ["session_start", "user_id", "n_events"]
    stream = _rows(q_stream_session(spark, sf_dir), cols)
    batch = _rows(q_stream_session_batch(spark, sf_dir), cols)
    assert stream == batch


def test_sessionize_lag_equals_session_window(spark, sf_dir):
    cols = ["session_start", "user_id", "n_events"]
    assert _rows(q_sessionize_lag(spark, sf_dir), cols) == _rows(
        q_stream_session_batch(spark, sf_dir), cols
    )


def test_ts_encoding_errors_are_descriptive(tmp_path):
    """The footer sniffer must fail loudly and specifically: no events
    file → FileNotFoundError naming the dir; a non-timestamp ts (e.g. a
    generator writing plain int64) → ValueError naming the type, instead
    of defaulting to a schema the vectorized reader would reject at scan
    time with an opaque error."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from breweries_case_spark.streaming.windows import _events_ts_encoding

    with pytest.raises(FileNotFoundError, match="events"):
        _events_ts_encoding(str(tmp_path))

    pq.write_table(
        pa.table({"ts": pa.array([1, 2], type=pa.int64())}),
        str(tmp_path / "events.parquet"),
    )
    with pytest.raises(ValueError, match="int64"):
        _events_ts_encoding(str(tmp_path))


def test_ts_encoding_classifies_tz_awareness(tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from breweries_case_spark.streaming.windows import _events_ts_encoding

    rows = [dt.datetime(2024, 1, 1, 0, 0, 0)]
    for typ, want in [
        (pa.timestamp("us"), "ntz"),
        (pa.timestamp("us", tz="UTC"), "ltz"),
        (pa.timestamp("ns"), "ns"),
    ]:
        pq.write_table(
            pa.table({"ts": pa.array(rows, type=typ)}),
            str(tmp_path / "events.parquet"),
        )
        assert _events_ts_encoding(str(tmp_path)) == want


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode with watermark: an event older than watermark arriving in
    a later batch is dropped from its (already emitted) window."""
    import pyspark.sql.functions as F

    from breweries_case_spark.streaming.windows import tumbling_counts

    path = str(tmp_path / "stream_in")

    def write_batch(rows, mode):
        spark.createDataFrame(
            rows, "ts timestamp, event_type string, value double"
        ).write.mode(mode).parquet(path)

    import datetime

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    write_batch([(ts(1), "a", 1.0), (ts(2), "a", 1.0)], "overwrite")

    events = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .parquet(path)
    )
    agg = tumbling_counts(events)
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: an event far ahead (advances watermark past window 0-5)
        write_batch([(ts(60), "a", 1.0)], "append")
        q.processAllAvailable()
        # batch 3: a LATE event for the now-closed 0-5 window + fresh event
        write_batch([(ts(3), "a", 99.0), (ts(61), "a", 1.0)], "append")
        q.processAllAvailable()
        # batch 4: push watermark far enough to close the 60-65 window
        write_batch([(ts(120), "a", 1.0)], "append")
        q.processAllAvailable()
    finally:
        q.stop()

    out = {
        (r.window_start.minute, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("wm_out").collect()
    }
    # window 00:00-00:05 emitted with the two on-time events only; the late
    # 99.0 event never appears
    assert out[(0, "a")] == (2, 2.0)
    assert all(v[1] < 99.0 for v in out.values())


# --- REST source contract ----------------------------------------------------


def test_pagination_stops_on_partial_page():
    fetcher = synthetic_page_fetcher(total_rows=450)
    calls = []

    def counting(page, per_page):
        calls.append(page)
        return fetcher(page, per_page)

    records = fetch_paginated(counting, per_page=200)
    assert len(records) == 450
    assert calls == [1, 2, 3]  # partial page 3 stops the loop


def test_pagination_stops_on_empty_page():
    fetcher = synthetic_page_fetcher(total_rows=400)
    records = fetch_paginated(fetcher, per_page=200)
    assert len(records) == 400  # page 3 empty → stop, no phantom rows


def test_pagination_respects_page_cap():
    def infinite(page, per_page):
        return [{"id": f"x{page}-{i}"} for i in range(per_page)]

    records = fetch_paginated(infinite, per_page=200)
    assert len(records) == 200 * DEFAULT_MAX_PAGES


def test_retry_backoff_and_retry_after():
    attempts = []
    sleeps = []

    def flaky():
        attempts.append(1)
        if len(attempts) == 1:
            raise RetryableHTTPError(429, retry_after=7.5)
        if len(attempts) == 2:
            raise RetryableHTTPError(503)
        return [{"ok": True}]

    out = with_retries(flaky, retries=5, backoff=0.6, sleep=sleeps.append)
    assert out == [{"ok": True}]
    assert sleeps[0] == 7.5  # Retry-After honored
    assert sleeps[1] == 0.6 * 2  # exponential backoff, attempt 1


def test_retry_exhaustion_raises():
    def always_500():
        raise RetryableHTTPError(500)

    with pytest.raises(RetryableHTTPError):
        with_retries(always_500, retries=2, sleep=lambda _s: None)


def test_ingest_rest_to_bronze(spark):
    from breweries_case_spark.io.rest_source import q_ingest_rest

    bronze = q_ingest_rest(spark, "")
    assert bronze.count() == 450
    assert bronze.columns == ["raw_json", "extraction_date"]


def test_stateful_running_totals_equal_batch(spark, sf_dir):
    """Final applyInPandasWithState state per user == batch groupBy."""
    import pyspark.sql.functions as F

    from breweries_case_spark.io.reader import load_table
    from breweries_case_spark.operators.streaming_queries import q_stream_stateful

    stateful = {
        r.user_id: (r.n_events, r.total_value)
        for r in q_stream_stateful(spark, sf_dir).collect()
    }
    batch = {
        r.user_id: (r.n, r.total)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(stateful) == set(batch)
    for uid, (n, total) in batch.items():
        assert stateful[uid][0] == n
        assert abs(stateful[uid][1] - total) < 1e-6


def test_stateful_state_accumulates_across_batches(spark, tmp_path):
    """State carries across micro-batches: totals after batch 2 include
    batch 1 (the property a stateless per-batch agg would get wrong)."""
    from breweries_case_spark.streaming.stateful import running_user_totals

    path = str(tmp_path / "stateful_in")

    def write(rows, mode):
        spark.createDataFrame(rows, "user_id long, value double").write.mode(
            mode
        ).parquet(path)

    write([(1, 1.0), (1, 2.0), (2, 5.0)], "overwrite")
    events = spark.readStream.schema("user_id long, value double").parquet(path)
    q = (
        running_user_totals(events)
        .writeStream.format("memory")
        .queryName("stateful_acc")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        write([(1, 10.0)], "append")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("stateful_acc").collect()
    final_u1 = max(
        (r for r in rows if r.user_id == 1), key=lambda r: r.n_events
    )
    assert (final_u1.n_events, final_u1.total_value) == (3, 13.0)


def test_stream_outer_join_emits_timeouts_and_withholds_tail(spark, tmp_path):
    """LEFT OUTER stream-stream interval join semantics on a controlled
    fixture: a matched signup emits its purchase; an unmatched signup
    whose 60 s timeout the purchase-side watermark has passed emits a
    NULL row; an unmatched signup still inside the unprovable window is
    WITHHELD entirely (the property that distinguishes watermark-driven
    outer emission from a batch left join)."""
    import datetime as dt

    from breweries_case_spark.streaming.windows import (
        collapse_outer_probe_rows,
        interval_join_outer,
        run_stream_to_memory,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minute, etype, sec=0):
        return (
            eid,
            t0 + dt.timedelta(minutes=minute, seconds=sec),
            1,
            etype,
            1.0,
            "{}",
        )

    rows = [
        ev(1, 0, "signup"),          # matched by purchase 100 at +30 s
        ev(100, 0, "purchase", 30),
        ev(2, 1, "signup"),          # never matched; timeout 00:02:00
        ev(3, 55, "signup"),         # never matched; timeout 00:56:00
        ev(101, 60, "purchase"),     # watermark advancer -> wm = 00:50:00
    ]
    path = str(tmp_path / "outer_in")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(path)
    src = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path)

    raw = run_stream_to_memory(
        interval_join_outer(
            src.filter("event_type = 'signup'"),
            src.filter("event_type = 'purchase'"),
        ),
        "outer_join_test",
        output_mode="append",
    )
    got = {
        r.signup_id: (r.purchase_id, r.delta_us)
        for r in collapse_outer_probe_rows(raw).collect()
    }
    # signup 1 matched; signup 2's timeout (00:02) < watermark (00:50) ->
    # NULL row emitted; signup 3's timeout (00:56) > watermark -> withheld
    assert got == {1: (100, 30_000_000), 2: (None, None)}


def test_transform_with_state_or_clean_error(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 successor API): where
    google.protobuf exists, the replayed totals must equal
    applyInPandasWithState's; in protobuf-less sandboxes, pin the OTHER
    contract — a descriptive RuntimeError, not a mid-query streaming
    crash (same branch-gate pattern as the Iceberg writer test)."""
    from breweries_case_spark.streaming.stateful import running_user_totals_tws

    path = str(tmp_path / "tws_in")
    spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 5.0)], "user_id long, value double"
    ).write.mode("overwrite").parquet(path)
    events = spark.readStream.schema("user_id long, value double").parquet(path)

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="google.protobuf"):
            running_user_totals_tws(events)
        return

    q = (
        running_user_totals_tws(events)
        .writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table("tws_out").collect()
    }
    assert got == {1: (2, 3.0), 2: (1, 5.0)}


def test_asof_join_matches_per_row_semantics(spark, sf_dir):
    """Every purchase matches the max view_ts <= purchase_ts for its user
    (spot-checked row-wise against a collect-side computation)."""
    import pyspark.sql.functions as F

    from breweries_case_spark.io.reader import load_table
    from breweries_case_spark.operators.relational import q_join_asof

    out = q_join_asof(spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id", "ts")
        .collect()
    )
    views_by_user = {}
    for r in ev:
        views_by_user.setdefault(r.user_id, []).append(r.ts)
    for r in out[:200]:
        best = max(t for t in views_by_user[r.user_id] if t <= r.purchase_ts)
        assert r.view_ts == best


def test_foreachbatch_partition_overwrite_sink(spark, tmp_path):
    """Stream → foreachBatch → dynamic partition overwrite: replaying a
    full partition converges (no duplicates), other partitions untouched."""
    import datetime

    from breweries_case_spark.streaming.sinks import stream_to_partitioned_parquet

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write(rows, mode):
        spark.createDataFrame(rows, "ts timestamp, user_id long").write.mode(
            mode
        ).parquet(src)

    d1 = datetime.datetime(2024, 3, 1, 10, 0)
    d2 = datetime.datetime(2024, 3, 2, 10, 0)
    write([(d1, 1), (d1, 2), (d2, 3)], "overwrite")
    events = spark.readStream.schema("ts timestamp, user_id long").parquet(src)
    q = stream_to_partitioned_parquet(events, out, ckpt)
    try:
        q.processAllAvailable()
        first = spark.read.parquet(out).groupBy("event_date").count().collect()
        assert {(str(r.event_date), r["count"]) for r in first} == {
            ("2024-03-01", 2),
            ("2024-03-02", 1),
        }
        # redelivery of day 1 as a FULL partition (1 row now) → overwrite
        write([(d1, 9)], "append")
        q.processAllAvailable()
    finally:
        q.stop()
    final = spark.read.parquet(out).groupBy("event_date").count().collect()
    assert {(str(r.event_date), r["count"]) for r in final} == {
        ("2024-03-01", 1),
        ("2024-03-02", 1),
    }


def test_stream_dedup_matches_batch_distinct(spark, sf_dir):
    """Streaming dedup key set == batch distinct; every kept key exactly
    once."""
    import pyspark.sql.functions as F

    from breweries_case_spark.io.reader import load_table
    from breweries_case_spark.operators.streaming_queries import q_stream_dedup

    out = q_stream_dedup(spark, sf_dir).collect()
    assert all(r.n_rows == 1 for r in out)
    stream_keys = {(r.user_id, r.event_type) for r in out}
    batch_keys = {
        (r.user_id, r.event_type)
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert stream_keys == batch_keys


def test_staged_file_ingest_json_and_csv(spark, tmp_path):
    """Staged bulk ingest: JSON lines and CSV read back with the explicit
    schema; unknown fields dropped, missing fields land as NULL (bronze
    schema-on-read stance), bad format rejected."""
    import json as _json

    import pytest as _pytest

    from breweries_case_spark.io.rest_source import ingest_staged_files

    schema = "id string, name string, city string"
    jd = tmp_path / "staged_json"
    jd.mkdir()
    with open(jd / "p.jsonl", "w") as fh:
        fh.write(_json.dumps({"id": "a", "name": "A", "extra": 1}) + "\n")
        fh.write(_json.dumps({"id": "b", "city": "Portland"}) + "\n")
    got = {
        r.id: (r.name, r.city)
        for r in ingest_staged_files(spark, str(jd), schema).collect()
    }
    assert got == {"a": ("A", None), "b": (None, "Portland")}

    cd = tmp_path / "staged_csv"
    cd.mkdir()
    (cd / "p.csv").write_text("id,name,city\na,A,\nb,,Portland\n")
    got_csv = {
        r.id: (r.name, r.city)
        for r in ingest_staged_files(
            spark, str(cd), schema, file_format="csv"
        ).collect()
    }
    assert got_csv == {"a": ("A", None), "b": (None, "Portland")}

    with _pytest.raises(ValueError):
        ingest_staged_files(spark, str(jd), schema, file_format="xml")


def test_q_ingest_staged_json_matches_rest(spark):
    from breweries_case_spark.io.rest_source import (
        q_ingest_rest,
        q_ingest_staged_json,
    )

    staged = q_ingest_staged_json(spark, "")
    assert staged.count() == q_ingest_rest(spark, "").count() == 450
    assert staged.columns == ["raw_json", "extraction_date"]


def test_stream_join_equals_batch_interval_join(spark, sf_dir):
    """Stream-stream time-bounded join == the batch binned interval join
    (same predicate, two independent formulations + two engines' worth of
    checks, since the batch side is itself DuckDB-oracle-verified)."""
    from breweries_case_spark.operators.relational import q_join_range_binned
    from breweries_case_spark.operators.streaming_queries import q_stream_join

    cols = ["signup_id", "purchase_id", "delta_us"]
    stream = _rows(q_stream_join(spark, sf_dir), cols)
    batch = _rows(q_join_range_binned(spark, sf_dir), cols)
    assert stream == batch


def test_q_stream_sink_parquet_matches_batch_daily_counts(spark, sf_dir):
    """The registered sink query (stream → foreachBatch commit → read-back)
    must equal a plain batch per-day count of the source."""
    from breweries_case_spark.io.reader import load_table
    from breweries_case_spark.operators.streaming_queries import (
        q_stream_sink_parquet,
    )
    from pyspark.sql import functions as F

    got = {
        (str(r.event_date), r.n_events)
        for r in q_stream_sink_parquet(spark, sf_dir).collect()
    }
    want = {
        (str(r.d), r.n)
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_sink_checkpoint_restart_no_reprocessing(spark, tmp_path):
    """Kill-and-restart durability: a second stream started on the SAME
    checkpoint must resume from the recorded offsets — rows ingested
    before the stop are not re-delivered to the sink (append mode would
    duplicate them if offsets were not honored)."""
    import datetime

    from breweries_case_spark.streaming.sinks import stream_to_partitioned_parquet

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    d1 = datetime.datetime(2024, 4, 1, 9, 0)

    def write(rows, mode):
        spark.createDataFrame(rows, "ts timestamp, user_id long").write.mode(
            mode
        ).parquet(src)

    write([(d1, i) for i in range(5)], "overwrite")
    events = spark.readStream.schema("ts timestamp, user_id long").parquet(src)
    q = stream_to_partitioned_parquet(events, out, ckpt, mode="append")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == 5

    # new input lands while the stream is DOWN; restart on same checkpoint
    write([(d1, 100 + i) for i in range(3)], "append")
    events2 = spark.readStream.schema("ts timestamp, user_id long").parquet(src)
    q2 = stream_to_partitioned_parquet(events2, out, ckpt, mode="append")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = sorted(r.user_id for r in spark.read.parquet(out).collect())
    assert got == [0, 1, 2, 3, 4, 100, 101, 102]  # old rows exactly once


def test_cents_state_update_skips_null_values():
    """NULL event values arrive in the pandas batch as NaN — the cents
    accumulator must SKIP them like SQL SUM skips NULLs, not floor NaN
    into INT64_MIN garbage."""
    import numpy as np
    import pandas as pd

    from breweries_case_spark.streaming.stateful import (
        _update_user_totals_cents,
    )

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    st = FakeState()
    pdf = pd.DataFrame({"value": [1.23, np.nan, 2.005]})
    out = list(_update_user_totals_cents((7,), iter([pdf]), st))
    n, cents = st.value
    assert n == 3  # the NULL row still counts toward n_events
    # floor(1.23*100+0.5)=123, floor(2.005*100+0.5)=201 (200.5+0.5 -> 201)
    assert cents == 123 + int(np.floor(2.005 * 100 + 0.5))
    assert out[0]["value_cents"].iloc[0] == cents


def test_cents_state_update_rejects_infinite_values():
    """+/-Inf can neither be skipped (hides corruption) nor included
    (floor(inf).astype(int64) poisons the state) — it must raise."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from breweries_case_spark.streaming.stateful import (
        _update_user_totals_cents,
    )

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    pdf = pd.DataFrame({"value": [1.0, np.inf]})
    with _pytest.raises(ValueError, match="non-finite"):
        list(_update_user_totals_cents((1,), iter([pdf]), FakeState()))
