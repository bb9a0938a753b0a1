"""Streaming window queries + their batch mirrors (SURVEY §2.8, §7.3 hard
part 4).

``*_batch`` variants run the identical window expression as a batch query —
DuckDB-oracle-checkable (bucket arithmetic spelled out so both engines
floor identically from the epoch). The ``q_stream_*`` variants execute a
REAL Structured Streaming query (readStream file source → watermark →
windowed agg → memory sink, deterministic replay) and are checked
rows-only; a unit test asserts stream output == batch-mirror output."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from breweries_case_spark.io.reader import load_table
from breweries_case_spark.streaming.windows import (
    WATERMARK_MINUTES,
    collapse_outer_probe_rows,
    dedup_events,
    interval_join,
    interval_join_outer,
    run_stream_to_memory,
    session_counts,
    sliding_counts,
    stream_events,
    tumbling_counts,
)

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds

# --- batch mirrors (oracle-checkable) ---------------------------------------


def q_stream_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling windows per event_type — batch twin of the
    streaming aggregation. LITERALLY the same function as the streaming
    path (withWatermark is a no-op on a batch DataFrame), so the
    stream==batch-mirror invariant is held by construction, not by
    keeping two copies in sync."""
    return tumbling_counts(load_table(spark, sf_dir, "events"))


def q_stream_sliding_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding by 5 — each event lands in two windows;
    the oracle reproduces this with an explicit 2-offset union. Same
    function as the streaming path (see q_stream_tumbling_batch)."""
    return sliding_counts(load_table(spark, sf_dir, "events"))


def q_stream_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user via F.session_window (batch mode).
    Oracle: classic gaps-and-islands SQL — proves the dynamic-window
    semantics against a fully independent formulation. Same function as
    the streaming path (see q_stream_tumbling_batch)."""
    return session_counts(load_table(spark, sf_dir, "events"))


def q_sessionize_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + cumulative-sum-of-gap-flags — the windowed
    batch idiom. Identical output to q_stream_session_batch; kept as a
    distinct operator because the window formulation lets arbitrary
    per-event columns ride along through the session. Gap compared in
    microseconds — full timestamp precision, same as session_window.
    Boundary: session_window MERGES events exactly gap apart (verified
    empirically on Spark 4.1.2), so the new-session flag is STRICT >."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us, 1).over(w)
    gap_flag = F.when(
        prev_us.isNull() | (us - prev_us > SESSION_GAP_US), 1
    ).otherwise(0)
    flagged = ev.select("user_id", "ts", "event_id", gap_flag.alias("new_session"))
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_events"))
        .select("user_id", "session_start", "n_events")
    )


#: debounce interval: an event is kept only if it arrives more than
#: this long after the previously KEPT event of its user
DEBOUNCE_US = 120 * 60 * 1_000_000


def q_events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event DEBOUNCE: keep an event iff it arrives more than
    DEBOUNCE_US after the previously KEPT event — the burst/retry-storm
    collapse every event pipeline runs before rate metrics (a click
    storm becomes one click). This is NOT sessionization-with-lag: the
    state is the last KEPT timestamp, a data-dependent recurrence that
    no lag/window combination expresses (lag sees the previous ROW,
    kept or not) — the third recurrence-class operator after
    q_pack_nextfit and the BPE fold, same treatment: the inherently
    sequential scan runs per-user in applyInPandas (Arrow-batched,
    timestamps pre-converted to int64 micros JVM-side), and the oracle
    replays the identical recurrence as a recursive CTE advancing every
    user's chain one row per step. Strict `>` boundary, (ts, event_id)
    total order — deterministic on ties.

    Scale: one shuffle on user_id; the loop is O(events-per-user) with
    O(1) state. Hot users sub-shard the same way q_pack_sequences
    documents (debounce within a shard is a lower bound on drops; exact
    cross-shard stitching needs only each shard's final kept ts)."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )

    def _debounce(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        kept, last = [], None
        for us in pdf["ts_us"]:
            us = int(us)
            if last is None or us - last > DEBOUNCE_US:
                kept.append(True)
                last = us
            else:
                kept.append(False)
        return pdf[pd.Series(kept).values][["user_id", "event_id", "ts_us"]]

    return ev.groupBy("user_id").applyInPandas(
        _debounce, "user_id long, event_id long, ts_us long"
    )


# --- true streaming (rows-only) ---------------------------------------------


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real readStream → watermark → tumbling agg → memory sink replay."""
    return run_stream_to_memory(
        tumbling_counts(stream_events(spark, sf_dir)),
        "stream_tumbling_out",
        output_mode="complete",
    )


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_memory(
        sliding_counts(stream_events(spark, sf_dir)),
        "stream_sliding_out",
        output_mode="complete",
    )


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_memory(
        session_counts(stream_events(spark, sf_dir)),
        "stream_session_out",
        output_mode="complete",
    )


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup replay: per-(user, event_type) counts of the
    deduplicated stream. The dropDuplicatesWithinWatermark guarantee is
    WITHIN-HORIZON only — key state is evicted once the watermark passes,
    so duplicates farther apart in event time than the watermark WOULD
    re-emit under multi-batch delivery. This replay feeds the file source
    in one micro-batch, which makes the dedup globally exact here (equal
    to batch distinct, pinned by tests/test_streaming.py); production
    cadence chooses the watermark to cover the real redelivery horizon.
    Rows-only (streaming execution)."""
    deduped = run_stream_to_memory(
        dedup_events(stream_events(spark, sf_dir)),
        "stream_dedup_out",
        output_mode="append",
        # the oracle (global batch DISTINCT) is valid ONLY under
        # single-micro-batch delivery — fail loudly if the events
        # fixture ever splits into multiple files
        max_input_batches=1,
    )
    return deduped.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_rows")
    )


#: late-data replay: every LATE_EVERY-th event (by id) arrives
#: LATE_SHIFT_US after its event time; the replay delivers arrival order
#: in LATE_BATCHES micro-batches, so watermark advancement between
#: batches drops the stragglers whose window has already closed.
LATE_SHIFT_US = 2 * 24 * 3600 * 1_000_000  # 2 days offline, then sync
LATE_EVERY = 17
LATE_BATCHES = 6
#: streaming/windows.WATERMARK in milliseconds — DERIVED from the same
#: WATERMARK_MINUTES int the engine-side withWatermark uses, so the
#: oracle's ms-granular watermark model can never desync from the engine
LATE_WM_MS = WATERMARK_MINUTES * 60 * 1000
#: state-store instance count for the replay's tumbling agg (r13, guide
#: §2.4/§5): the stateful keyspace is open windows x |event_type| —
#: bounded by the fixture's TIME SPAN / window width, independent of
#: corpus row count (at 100 TB/day the span per day is unchanged), so
#: state stores sized to the keyspace beat one store per session
#: shuffle partition at ANY scale. Map-side partial aggregation keeps
#: the scan stage at full parallelism; only the bounded state stage
#: narrows. Env-parameterised; the default is keyspace-derived, not a
#: core-count tune (it is deliberately NOT a function of
#: $SPARK_GRAFT_CPUS, so the driver's low-core scaling run compares
#: like with like).
def _late_state_partitions() -> int:
    """Validated SPARK_GRAFT_STREAM_STATE_PARTITIONS (r13 ADVICE): a
    malformed or non-positive value must degrade to the keyspace-derived
    default with a warning, not raise at import time — an int() at module
    import would take down the whole operator registry (every query), and
    0/negative would reach spark.sql.shuffle.partitions unvalidated."""
    raw = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
    try:
        val = int(raw)
    except ValueError:
        val = -1
    if val <= 0:
        import warnings

        warnings.warn(
            "SPARK_GRAFT_STREAM_STATE_PARTITIONS must be a positive int, "
            f"got {raw!r}; falling back to 8",
            stacklevel=2,
        )
        return 8
    return val


LATE_STATE_PARTITIONS = _late_state_partitions()


def q_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA DROP semantics, driver-value-checked on a real
    multi-batch replay — the one Structured Streaming behavior a
    single-batch replay can never exercise (within one micro-batch the
    watermark hasn't advanced, so nothing is ever late). Arrival
    simulation: every 17th event arrives 2 days after its event time
    (a device offline then syncing); arrival order is split into 6
    micro-batches delivered one processAllAvailable at a time, so the
    engine's watermark advances on exactly the batch boundaries.
    Late events whose 5-minute window already closed are dropped; the
    append-mode result is the closed windows computed over the
    SURVIVORS only.

    The oracle replays the engine's contract in SQL, from three
    empirically pinned rules (probed on Spark 4.1.2, see
    tests/test_streaming.py):
      1. watermark entering batch i = max event-time MILLISECOND (floor)
         over batches < i, minus the WATERMARK_MINUTES delay — late rows still
         feed the stats, and the first batch has no watermark;
      2. a row is dropped iff its window END <= that watermark
         (inclusive), compared on the window, not the raw timestamp;
      3. a window is emitted iff its end <= the FINAL watermark
         (inclusive — processAllAvailable runs the trailing eviction
         batch after the last data batch).
    Batching is ntile(6) over the total (arrival_us, event_id) order —
    deterministic and identical in both engines.

    Scale: the staging window is the SIMULATION, not the operator — a
    production stream arrives pre-batched by time. The streaming plan
    itself is the standard watermark + tumbling-agg shape whose state is
    O(open windows x event types), independent of stream length."""
    from breweries_case_spark.streaming.windows import replay_in_batches

    ev = load_table(spark, sf_dir, "events")
    arrival = F.unix_micros(F.col("ts")) + F.when(
        F.col("event_id") % LATE_EVERY == 0, F.lit(LATE_SHIFT_US)
    ).otherwise(F.lit(0))
    w = Window.orderBy("arrival_us", "event_id")
    # no checkpoint: the replay harness stages every delivery slice with
    # ONE partitionBy write, so the ntile runs exactly once either way
    # (pre-r13 this checkpointed, then ran one filter+write per batch)
    batched = (
        ev.select("ts", "event_type", "value", "event_id")
        .withColumn("arrival_us", arrival)
        .withColumn("batch", F.ntile(LATE_BATCHES).over(w))
        .select("ts", "event_type", "value", "batch")
    )
    return replay_in_batches(
        spark,
        batched,
        "batch",
        LATE_BATCHES,
        "ts timestamp, event_type string, value double",
        tumbling_counts,
        "stream_late_out",
        state_partitions=LATE_STATE_PARTITIONS,
    )


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-bounded join replay: purchases within 60 s of a
    signup, both sides real streams. Must equal the batch
    q_join_range_binned pair set (tests/test_streaming.py pins it).
    Rows-only (streaming execution)."""
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(
        interval_join(
            ev.filter(F.col("event_type") == "signup"),
            ev.filter(F.col("event_type") == "purchase"),
        ),
        "stream_join_out",
        output_mode="append",
    )


def q_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join replay: every signup with
    its within-60 s purchase, or NULLs once the watermark proves no
    purchase can still arrive — conversion-timeout detection, the
    semantic an inner stream join cannot express (result emission IS the
    state-eviction event). Signups whose timeout the final watermark has
    not passed are withheld, exactly as a live query would withhold
    them; tests/test_streaming.py pins both the matched==batch and the
    withheld-tail properties on a controlled fixture.

    Oracle-backed since r6: the replay is deterministic (single-file
    source → one data micro-batch; final watermark = min of the two
    sides' max event time minus the WATERMARK_MINUTES delay), so the emitted set
    is a closed-form batch query — every matched signup, plus NULL rows
    for exactly the signups whose s_ts + 60 s lies strictly before the
    final watermark. The strict-< eviction boundary is empirical; no
    fixture event lands on the boundary microsecond at any driver sf."""
    ev = stream_events(spark, sf_dir)
    raw = run_stream_to_memory(
        interval_join_outer(
            ev.filter(F.col("event_type") == "signup"),
            ev.filter(F.col("event_type") == "purchase"),
        ),
        "stream_join_outer_out",
        output_mode="append",
    )
    return collapse_outer_probe_rows(raw)


def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    (count, sum) state, replayed to completion — the final row per user
    must equal the batch groupBy, which tests/test_streaming.py pins.
    Rows-only: arbitrary-stateful ops are the canonical non-SQL surface."""
    from breweries_case_spark.streaming.stateful import running_user_totals

    updates = run_stream_to_memory(
        running_user_totals(stream_events(spark, sf_dir)),
        "stream_stateful_out",
        output_mode="update",
    )
    # update mode emits one row per (user, micro-batch); keep the final state
    latest = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        updates.withColumn("rn", F.row_number().over(latest))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


def q_stream_stateful_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED custom stateful streaming (the first value-checked
    arbitrary-state id): per-user running (count, cents) where the value
    sum is quantized per row and accumulated as int64 inside the state —
    order-independent and exact, so the replayed final state must equal
    a batch SQL aggregate bit-for-bit however the stream micro-batched.
    The float twin (q_stream_stateful) stays rows-only as the canonical
    non-SQL surface; this id proves the state machinery (per-key state
    store, update-mode emission, replay) against DuckDB, not just the
    arithmetic."""
    from breweries_case_spark.streaming.stateful import (
        running_user_totals_cents,
    )

    updates = run_stream_to_memory(
        running_user_totals_cents(stream_events(spark, sf_dir)),
        "stream_stateful_exact_out",
        output_mode="update",
    )
    latest = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        updates.withColumn("rn", F.row_number().over(latest))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "value_cents")
    )


def q_stream_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming WRITE path: readStream → foreachBatch →
    idempotent date-partition overwrite (streaming.sinks — the engine's
    exactly-once-per-partition sink contract), then read the committed
    parquet back and aggregate per day. Rows-only (write side effect);
    the sink's replay idempotency is pinned by tests/test_streaming.py.
    The result equals a batch per-day count of the source — checked by
    the same test — so the registry entry exercises commit + read-back,
    not just the transform."""
    import shutil
    import tempfile

    from breweries_case_spark.io.writer import read_partitioned
    from breweries_case_spark.streaming.sinks import stream_to_partitioned_parquet

    base = tempfile.mkdtemp(prefix="q_stream_sink_")
    out, ckpt = f"{base}/out", f"{base}/ckpt"
    q = stream_to_partitioned_parquet(stream_events(spark, sf_dir), out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        daily = (
            read_partitioned(spark, out)
            .groupBy("event_date")
            .agg(F.count("*").alias("n_events"))
            .orderBy("event_date")
        )
        # materialize before the scratch dir vanishes (tiny: one row/day)
        rows = daily.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, daily.schema)


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the third streaming join mode
    beside stream-stream inner/outer: the event stream broadcast-joined
    per microbatch against the (batch) customer dimension. The static
    side is RE-READ each microbatch by Spark's contract, so dimension
    updates between batches are picked up — the standard Kafka-enrich
    topology. No watermark and append-mode inner join make the replay
    output deterministic, so unlike the other true-streaming ids this
    one is ORACLE-BACKED: the driver value-checks real Structured
    Streaming execution against the plain batch join SQL."""
    ev = stream_events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = ev.join(F.broadcast(cust), "user_id").select(
        "event_id", "user_id", "event_type", "c_mktsegment"
    )
    return run_stream_to_memory(joined, "stream_static_out")


#: daily corpus-ingest replay: shard count and their idempotency dates
CORPUS_SHARDS = 3
CORPUS_SHARD_DATES = ("2024-01-01", "2024-01-02", "2024-01-03")


def q_stream_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION corpus-ingest topology end to end, driver-checked
    as one id: a real Structured Streaming query over a file source
    replays three daily document shards (doc_id mod CORPUS_SHARDS), and
    ``foreachBatch`` runs each micro-batch through the full nightly
    pipeline (pipelines/corpus.update_corpus: quality gate →
    within-shard exact keep-min-fp dedup → corpus-fingerprint anti-join
    → MinHash-LSH near-dup probe of the persisted bucket state with
    exact-Jaccard verify on candidates only → ACID partition-overwrite
    commit of docs + fingerprint + bucket state). Output: the final
    committed corpus (doc_id, lang, source, shard_date) after all three
    days — deterministic, so unlike most true-streaming ids this
    composition is ORACLE-BACKED end to end: the oracle unrolls the
    three days as a CTE chain (gate/fp/anti-join per shard, near-dup
    as exact same-lang 3-gram Jaccard ≥ 0.5 vs the prior corpus or a
    lower-id fresh shard doc — the q_dedup_incremental oracle contract,
    which holds iff the LSH blocker recall is lossless on this corpus:
    a driver red here is a RECALL metric, not a pipeline bug).

    Scale: each micro-batch pays O(shard) + O(candidates) only — the
    corpus is touched via one fingerprint equi-join and a broadcast
    bucket semi-join (pipelines/corpus.py design contract); the
    streaming shell adds checkpointed exactly-once delivery on top.
    The replay asserts exactly CORPUS_SHARDS data-carrying
    micro-batches, mirroring streaming/windows.replay_in_batches."""
    import shutil
    import tempfile

    from breweries_case_spark.pipelines.corpus import (
        read_corpus,
        update_corpus,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    batches = [
        d.filter(F.col("doc_id") % CORPUS_SHARDS == i).withColumn(
            "shard_date", F.lit(day)
        )
        for i, day in enumerate(CORPUS_SHARD_DATES)
    ]
    corpus_dir = tempfile.mkdtemp(prefix="stream_corpus_")
    spool = tempfile.mkdtemp(prefix="stream_corpus_src_")
    try:

        def handle(batch_df, _batch_id):
            day_rows = batch_df.select("shard_date").distinct().collect()
            if not day_rows:
                return
            if len(day_rows) > 1:
                raise AssertionError(
                    f"one micro-batch per shard expected, got dates "
                    f"{sorted(r[0] for r in day_rows)}"
                )
            update_corpus(
                spark,
                batch_df.drop("shard_date"),
                corpus_dir,
                day_rows[0][0],
                near_dedup=True,
            )

        schema = (
            "doc_id long, text string, lang string, "
            "source string, shard_date string"
        )
        batches[0].write.mode("overwrite").parquet(spool)
        q = (
            spark.readStream.schema(schema)
            .parquet(spool)
            .writeStream.foreachBatch(handle)
            .start()
        )
        try:
            q.processAllAvailable()
            for b in batches[1:]:
                b.write.mode("append").parquet(spool)
                q.processAllAvailable()
            data_batches = sum(
                1 for p in q.recentProgress if p["numInputRows"] > 0
            )
            if data_batches != CORPUS_SHARDS:
                raise AssertionError(
                    f"corpus replay: {data_batches} data-carrying "
                    f"micro-batches, premise requires {CORPUS_SHARDS}"
                )
        finally:
            q.stop()
        out = read_corpus(spark, corpus_dir).select(
            "doc_id", "lang", "source", "shard_date"
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(spool, ignore_errors=True)


QUERIES = {
    "q_stream_tumbling_batch": q_stream_tumbling_batch,
    "q_stream_corpus_ingest": q_stream_corpus_ingest,
    "q_stream_sink_parquet": q_stream_sink_parquet,
    "q_stream_sliding_batch": q_stream_sliding_batch,
    "q_stream_session_batch": q_stream_session_batch,
    "q_sessionize_lag": q_sessionize_lag,
    "q_events_debounce": q_events_debounce,
    "q_stream_tumbling": q_stream_tumbling,
    "q_stream_sliding": q_stream_sliding,
    "q_stream_session": q_stream_session,
    "q_stream_stateful": q_stream_stateful,
    "q_stream_stateful_exact": q_stream_stateful_exact,
    "q_stream_dedup": q_stream_dedup,
    "q_stream_join": q_stream_join,
    "q_stream_join_outer": q_stream_join_outer,
    "q_stream_static_join": q_stream_static_join,
    "q_stream_late_data": q_stream_late_data,
}

# Spark's F.window FLOORS from the Unix epoch. DuckDB's // truncates
# toward zero (so it would diverge for pre-1970 timestamps); floor() over
# float division floors like Spark for all epochs.
_BUCKET5 = (
    "make_timestamp(CAST(floor(epoch_ms(ts) / 300000.0) AS BIGINT)"
    " * 300000 * 1000)"
)

# Gaps-and-islands sessionization, full microsecond precision — shared by
# both session query oracles. Spark's session_window MERGES an event at
# exactly start+gap into the running session (verified empirically on
# Spark 4.1.2), hence the STRICT > in the new-session flag.
_SESSIONS_CTE = f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    sess AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged)
"""

ORACLES = {
    "q_stream_static_join": """
        SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    "q_stream_tumbling_batch": f"""
        SELECT {_BUCKET5} AS window_start, event_type,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_stream_sliding_batch": f"""
        WITH buck AS (SELECT {_BUCKET5} AS b5, event_type FROM events)
        SELECT window_start, event_type, count(*) AS n_events FROM (
            SELECT b5 AS window_start, event_type FROM buck
            UNION ALL
            SELECT b5 - INTERVAL 5 MINUTE AS window_start, event_type FROM buck)
        GROUP BY 1, 2
    """,
    "q_stream_session_batch": _SESSIONS_CTE
    + """
        SELECT min(ts) AS session_start, user_id, count(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    "q_sessionize_lag": _SESSIONS_CTE
    + """
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    # debounce: the last-KEPT-timestamp recurrence replayed as a
    # recursive CTE advancing every user's chain one row per step (the
    # q_pack_nextfit oracle idiom) — strict >, (ts, event_id) order
    "q_events_debounce": rf"""
        WITH RECURSIVE t AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events),
        r AS (
            SELECT user_id, event_id, ts_us, rn,
                   TRUE AS kept, ts_us AS last_kept
            FROM t WHERE rn = 1
            UNION ALL
            SELECT t.user_id, t.event_id, t.ts_us, t.rn,
                   t.ts_us - r.last_kept > {DEBOUNCE_US},
                   CASE WHEN t.ts_us - r.last_kept > {DEBOUNCE_US}
                        THEN t.ts_us ELSE r.last_kept END
            FROM r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1)
        SELECT user_id, event_id, ts_us FROM r WHERE kept
    """,
    # The three COMPLETE-mode windowed replays gained oracles in the r4
    # third wave: complete mode never evicts aggregation state, so the
    # replayed result is the full-history aggregate regardless of
    # micro-batch boundaries — deterministic, and definitionally equal to
    # the batch mirror (same function, withWatermark is a batch no-op).
    # The driver now value-checks REAL streaming runs, not just mirrors.
    # Remaining q_stream_* ids stay rows-only: append-mode emission
    # depends on watermark advancement across batch boundaries, which is
    # an execution detail the oracle must not assume; their equality with
    # batch twins is pinned by tests/test_streaming.py.
}

ORACLES["q_stream_tumbling"] = ORACLES["q_stream_tumbling_batch"]
ORACLES["q_stream_sliding"] = ORACLES["q_stream_sliding_batch"]
ORACLES["q_stream_session"] = ORACLES["q_stream_session_batch"]

# The INNER stream-stream interval join emits on match (not on watermark
# advancement — that's only the state-EVICTION signal for inner joins),
# so its replay is deterministic too and shares the batch binned
# interval join's oracle (q_join_range_binned — identical schema; their
# equality was already unit-tested).
from breweries_case_spark.operators.relational import (  # noqa: E402
    ORACLES as _REL_ORACLES,
)

ORACLES["q_stream_join"] = _REL_ORACLES["q_join_range_binned"]

# Single-micro-batch delivery (one events file) makes the within-watermark
# dedup globally exact — the docstring's documented equivalence to batch
# distinct, now driver-checked rather than only unit-tested.
ORACLES["q_stream_dedup"] = """
    SELECT user_id, event_type, CAST(1 AS BIGINT) AS n_rows
    FROM (SELECT DISTINCT user_id, event_type FROM events)
"""

# The parquet-sink read-back is likewise deterministic (the sink commits
# every input partition exactly once under processAllAvailable, and the
# summary is per-day counts of the source) — so the WRITE path is
# value-checked too, not just the transform.
# The cents-exact stateful replay: per-row quantization then integer
# accumulation makes the final state order-independent, so the batch SQL
# twin is exact whatever the micro-batch split was.
# Outer BIGINT cast: DuckDB's SUM(BIGINT) is HUGEINT, which a pandas
# .df() consumer coerces to float64 (the r5 driver red) — the bound cast
# keeps it int64 end-to-end. COALESCE pins the Spark state's convention
# for all-NULL users (emit 0, like an initialized-empty accumulator,
# not SQL's NULL) — the fixtures have no NULL values today, but the
# NaN-skip in streaming/stateful.py anticipates them.
ORACLES["q_stream_stateful_exact"] = """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(COALESCE(
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)), 0
           ) AS BIGINT) AS value_cents
    FROM events GROUP BY user_id
"""

# Multi-batch late-data replay twin: the watermark trajectory is a
# closed form of the deterministic batching (ntile over the total
# arrival order), and the three comparison rules are the empirically
# pinned engine semantics documented on q_stream_late_data. Window
# arithmetic in epoch MICROseconds; watermark in engine-native
# MILLIseconds (floored), scaled back to us at the comparisons.
ORACLES["q_stream_late_data"] = f"""
    WITH arr AS (
        SELECT ts, event_type, value, event_id,
               epoch_us(ts) + CASE WHEN event_id % {LATE_EVERY} = 0
                                   THEN {LATE_SHIFT_US} ELSE 0 END
                   AS arrival_us
        FROM events),
    b AS (
        SELECT ts, event_type, value,
               ntile({LATE_BATCHES})
                   OVER (ORDER BY arrival_us, event_id) AS batch
        FROM arr),
    bm AS (SELECT batch, MAX(epoch_us(ts) // 1000) AS mx_ms
           FROM b GROUP BY batch),
    wm AS (
        SELECT batch,
               MAX(mx_ms) OVER (ORDER BY batch
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   - {LATE_WM_MS} AS wm_ms
        FROM bm),
    fin AS (SELECT MAX(mx_ms) - {LATE_WM_MS} AS fin_ms FROM bm),
    surv AS (
        SELECT (epoch_us(b.ts) // 300000000) * 300000000 AS ws_us,
               b.event_type, b.value
        FROM b JOIN wm USING (batch)
        WHERE wm.wm_ms IS NULL
           OR (epoch_us(b.ts) // 300000000) * 300000000 + 300000000
                  > wm.wm_ms * 1000)
    SELECT make_timestamp(ws_us) AS window_start, event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM surv CROSS JOIN fin
    WHERE ws_us + 300000000 <= fin.fin_ms * 1000
    GROUP BY ws_us, event_type
"""

ORACLES["q_stream_sink_parquet"] = """
    SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_events
    FROM events GROUP BY 1
"""


# LEFT OUTER stream-stream join twin: the deterministic replay's final
# watermark is min(max signup ts, max purchase ts) - the WATERMARK_MINUTES delay
# (streaming/windows.WATERMARK), and the emitted set is every matched
# signup plus NULL rows for exactly the signups whose 60 s timeout lies
# strictly before that watermark (state eviction == NULL emission; the
# withheld tail is the complement). MIN over the (delta, purchase_id)
# struct mirrors collapse_outer_probe_rows' coherent-pair pick. The
# strict-< boundary is empirical — no fixture event lands on the exact
# boundary microsecond at any driver sf.
ORACLES["q_stream_join_outer"] = f"""
    WITH s AS (SELECT event_id AS signup_id, ts AS s_ts
               FROM events WHERE event_type = 'signup'),
    p AS (SELECT event_id AS purchase_id, ts AS p_ts
          FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT LEAST((SELECT MAX(s_ts) FROM s),
                        (SELECT MAX(p_ts) FROM p))
                  - INTERVAL {WATERMARK_MINUTES} MINUTE AS w),
    pairs AS (
        SELECT s.signup_id,
               MIN({{'delta': epoch_us(p.p_ts) - epoch_us(s.s_ts),
                    'purchase_id': p.purchase_id}}) AS m
        FROM s JOIN p
          ON p.p_ts >= s.s_ts
         AND p.p_ts <= s.s_ts + INTERVAL 60 SECOND
        GROUP BY 1)
    SELECT s.signup_id,
           pairs.m.purchase_id AS purchase_id,
           CAST(pairs.m.delta AS BIGINT) AS delta_us
    FROM s LEFT JOIN pairs USING (signup_id) CROSS JOIN wm
    WHERE pairs.signup_id IS NOT NULL
       OR s.s_ts + INTERVAL 60 SECOND < wm.w
"""


def _corpus_shard_ctes(i: int, day: str) -> str:
    """One unrolled ingest day for the q_stream_corpus_ingest oracle:
    quality gate (training_mix constants) → within-shard exact
    keep-min-fp → corpus-fingerprint anti-join → near-dup drop (exact
    same-lang 3-gram Jaccard ≥ 0.5, ROUND-6-then-threshold, vs the
    prior corpus OR a lower-id fresh doc in the same shard — the
    q_dedup_incremental contract) → corpus accumulation."""
    from breweries_case_spark.operators.training_mix import (
        MEAN_TOKEN_LEN_RANGE,
        MIN_TOKENS,
    )

    lo, hi = MEAN_TOKEN_LEN_RANGE
    jac = (
        "ROUND(len(list_intersect(sa.sh, sb.sh)) / "
        "(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6)"
    )
    return f"""
        g_{i} AS (
            SELECT doc_id, text, lang, source FROM base
            WHERE doc_id % {CORPUS_SHARDS} = {i - 1}
              AND n_tok >= {MIN_TOKENS}
              AND CAST(length(text) AS DOUBLE) / n_tok
                  BETWEEN {lo} AND {hi}),
        u_{i} AS (
            SELECT g.* FROM g_{i} g
            JOIN (SELECT MIN(doc_id) AS doc_id
                  FROM (SELECT md5(lower(trim(text))) AS fp, doc_id
                        FROM g_{i})
                  GROUP BY fp) k USING (doc_id)),
        f_{i} AS (
            SELECT u.* FROM u_{i} u
            WHERE NOT EXISTS (
                SELECT 1 FROM corpus_{i - 1} c
                WHERE md5(lower(trim(c.text))) = md5(lower(trim(u.text))))),
        nd_{i} AS (
            SELECT DISTINCT sa.doc_id
            FROM f_{i} fa
            JOIN shingled sa ON sa.doc_id = fa.doc_id
            JOIN corpus_{i - 1} c ON TRUE
            JOIN shingled sb ON sb.doc_id = c.doc_id
             AND sb.lang = sa.lang
            WHERE {jac} >= 0.5
            UNION
            SELECT DISTINCT sa.doc_id
            FROM f_{i} fa
            JOIN shingled sa ON sa.doc_id = fa.doc_id
            JOIN f_{i} fb ON fb.doc_id < fa.doc_id
            JOIN shingled sb ON sb.doc_id = fb.doc_id
             AND sb.lang = sa.lang
            WHERE {jac} >= 0.5),
        a_{i} AS (
            SELECT f.doc_id, f.text, f.lang, f.source,
                   '{day}' AS shard_date
            FROM f_{i} f
            WHERE f.doc_id NOT IN (SELECT doc_id FROM nd_{i})),
        corpus_{i} AS (
            SELECT * FROM corpus_{i - 1}
            UNION ALL SELECT * FROM a_{i})"""


ORACLES["q_stream_corpus_ingest"] = (
    r"""
    WITH base AS (
        SELECT doc_id, text, lang, source,
               len(string_split_regex(trim(text), '\s+')) AS n_tok
        FROM documents),
    shingled AS (
        SELECT doc_id, lang,
               list_distinct(list_transform(
                   generate_series(1, len(tk) - 2),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
        FROM (SELECT doc_id, lang,
                     string_split_regex(trim(lower(text)), '\s+') AS tk
              FROM documents)),
    corpus_0 AS (
        SELECT doc_id, text, lang, source,
               CAST(NULL AS VARCHAR) AS shard_date
        FROM documents WHERE FALSE),"""
    + ",".join(
        _corpus_shard_ctes(i, day)
        for i, day in enumerate(CORPUS_SHARD_DATES, start=1)
    )
    + f"""
    SELECT doc_id, lang, source, shard_date FROM corpus_{CORPUS_SHARDS}
"""
)
