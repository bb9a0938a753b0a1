"""Structured Streaming over the ``events`` table (SURVEY §2.8 — additive
surface; the reference is daily batch with partition-overwrite as its
late-data story).

Design: every streaming aggregation here is the SAME logical window
expression as its batch mirror in ``operators.streaming_queries`` — the
mirrors are DuckDB-oracle-checkable, the streaming versions add watermarks
and run through a real ``readStream`` → memory-sink replay (deterministic:
file source + processAllAvailable). This is SURVEY §7.3 hard part 4's
resolution: DuckDB can't replay watermarks, so correctness is pinned on the
batch twin and the streaming path is checked rows-only + unit-tested for
late-data semantics.

Scale: file-source streaming here stands in for Kafka; the window state is
keyed by (window, event_type) / (user, session) and bounded by the
watermark — state store size is O(active windows), not O(stream)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from breweries_case_spark.functions import decimal_sum
from breweries_case_spark.schemas import (
    EVENTS_RAW_SCHEMA,
    EVENTS_RAW_SCHEMA_LTZ,
    EVENTS_RAW_SCHEMA_NTZ,
)

#: single source of truth for the watermark delay — every engine-side
#: withWatermark AND every oracle constant (streaming_queries.LATE_WM_MS,
#: the INTERVAL in the q_stream_join_outer oracle) derives from this int
#: so a change here can never silently desync an oracle
WATERMARK_MINUTES = 10
WATERMARK = f"{WATERMARK_MINUTES} minutes"


def _events_ts_encoding(sf_dir: str) -> str:
    """Sniff the parquet footer(s) for the ts encoding (see schemas.py
    contract note) and classify it: ``'ns'`` (nanos — any tz-ness, read as
    long), ``'ltz'`` (tz-aware micros/millis — an instant, read as
    TIMESTAMP), or ``'ntz'`` (wall-time micros/millis — read as
    TIMESTAMP_NTZ and reinterpreted in the UTC session zone). Streaming
    needs the read schema up front, so unlike the batch reader we can't
    try/except our way to the right one. A non-timestamp ts (e.g. a future
    generator writing plain int64) raises immediately — a wrong guess here
    would otherwise surface as a vectorized-reader failure at scan time.
    Directory inputs must agree across part files: mixed encodings under
    one fixed read schema would silently corrupt whichever files lose."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    matches = sorted(glob.glob(f"{sf_dir}/events.*"))
    if not matches:
        raise FileNotFoundError(
            f"no events.* under {sf_dir!r} — expected events.parquet "
            "(file or directory of part files)"
        )
    path = matches[0]
    if os.path.isdir(path):
        parts = sorted(glob.glob(f"{path}/*.parquet"))
        if not parts:
            raise FileNotFoundError(
                f"events directory {path!r} has no *.parquet part files"
            )
    else:
        parts = [path]

    def classify(p: str) -> str:
        t = pq.read_schema(p).field("ts").type
        if not pa.types.is_timestamp(t):
            raise ValueError(
                f"unrecognized events.ts encoding in {p!r}: {t!r} "
                "(expected a parquet timestamp)"
            )
        if t.unit == "ns":
            return "ns"
        return "ltz" if t.tz is not None else "ntz"

    encodings = {p: classify(p) for p in parts}
    if len(set(encodings.values())) > 1:
        raise ValueError(
            f"mixed events.ts encodings across part files: {encodings}"
        )
    return next(iter(encodings.values()))


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (file source = the deterministic
    local stand-in for Kafka; same DataFrame surface either way)."""
    enc = _events_ts_encoding(sf_dir)
    if enc == "ns":
        # Conf must stay set for the life of the streaming query (the
        # source re-reads it per microbatch), so no save/restore here —
        # documented session-wide effect, only taken on nanos-era data.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = EVENTS_RAW_SCHEMA
    elif enc == "ltz":
        schema = EVENTS_RAW_SCHEMA_LTZ
    else:
        schema = EVENTS_RAW_SCHEMA_NTZ
    raw = (
        spark.readStream.schema(schema)
        # glob the events file specifically — sf_dir holds ALL tables, and a
        # bare directory path would stream every parquet (name-matched
        # columns → silent null rows); the glob form keeps basePath a
        # directory, which the file source requires
        .option("path", f"{sf_dir}/events.*")
        .format("parquet")
        .load()
    )
    if enc == "ns":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if enc == "ltz":
        # already a UTC instant — no reinterpretation needed
        return raw
    # NTZ wall time reinterpreted in the UTC session zone — same epoch
    # DuckDB reads from the same file.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Tumbling-window counts + value sums per event_type, watermarked."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            decimal_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Sliding-window counts per event_type (each event lands in
    width/slide windows)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge
    into one session (F.session_window — dynamic-length windows)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def dedup_events(events: DataFrame) -> DataFrame:
    """Streaming exact dedup: first occurrence of each (user_id,
    event_type) wins; duplicates arriving within the watermark horizon are
    dropped (dropDuplicatesWithinWatermark — state per key is retained
    only until the watermark passes, so state is bounded by the horizon,
    not the stream length; plain dropDuplicates on a stream would grow
    state forever). The streaming face of the operators.dedup family."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


INTERVAL_JOIN_US = 60 * 1_000_000  # 60-second interval == bin width


def interval_join(signups: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream inner join: purchases within [0, 60 s] AFTER a
    signup (the streaming twin of the batch binned interval join — same
    predicate, same output). Spark REQUIRES an equality predicate for
    stream-stream joins, and the batch version's bin rewrite supplies
    exactly that: signups explode to (bin, bin+1), purchases keep their
    bin, the join is equi on bin with the interval as residual. The
    residual is expressed DIRECTLY on the watermarked timestamp columns
    (p_ts BETWEEN s_ts AND s_ts + INTERVAL) — the form Spark's
    stream-stream join analyzer recognizes as a time-range constraint and
    turns into state-eviction watermarks (buffered rows drop once the
    other side's watermark passes ts + 60 s). An equivalent bound written
    over unix_micros() longs computes the same rows but is opaque to the
    analyzer: inner-join state would grow without bound on a real
    multi-batch stream."""
    bin_of = F.floor(
        F.unix_micros(F.col("ts")).cast("long") / F.lit(INTERVAL_JOIN_US)
    )
    s = signups.withWatermark("ts", WATERMARK).select(
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_ts"),
        F.explode(F.array(bin_of, bin_of + 1)).alias("s_bin"),
    )
    p = purchases.withWatermark("ts", WATERMARK).select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        bin_of.alias("p_bin"),
    )
    delta_us = F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("s_ts"))
    return s.join(
        p,
        (F.col("s_bin") == F.col("p_bin"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (
            F.col("p_ts")
            <= F.col("s_ts") + F.expr(f"INTERVAL {INTERVAL_JOIN_US} MICROSECOND")
        ),
    ).select("signup_id", "purchase_id", delta_us.alias("delta_us"))


def interval_join_outer(signups: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every signup row emits —
    with its purchase when one lands within [0, 60 s], or with NULLs
    once the purchase-side watermark passes ``s_ts + 60 s`` and no match
    arrived (conversion-timeout detection: "signups that never
    converted"). This is the semantic inner joins can't express on a
    stream: the NULL row can only be emitted when late data is
    provably impossible, i.e. state eviction and result emission are the
    same watermark event. Same bin-equality rewrite as interval_join
    (Spark requires an equi-key), same analyzer-visible time-range
    residual; rows withheld at end-of-replay are exactly the signups
    whose timeout the final watermark has not yet passed — the test
    accounts for that tail."""
    bin_of = F.floor(
        F.unix_micros(F.col("ts")).cast("long") / F.lit(INTERVAL_JOIN_US)
    )
    s = signups.withWatermark("ts", WATERMARK).select(
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_ts"),
        F.explode(F.array(bin_of, bin_of + 1)).alias("s_bin"),
    )
    p = purchases.withWatermark("ts", WATERMARK).select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        bin_of.alias("p_bin"),
    )
    joined = s.join(
        p,
        (F.col("s_bin") == F.col("p_bin"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (
            F.col("p_ts")
            <= F.col("s_ts") + F.expr(f"INTERVAL {INTERVAL_JOIN_US} MICROSECOND")
        ),
        "leftOuter",
    )
    delta_us = F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("s_ts"))
    return joined.select("signup_id", "purchase_id", delta_us.alias("delta_us"))


def collapse_outer_probe_rows(raw: DataFrame) -> DataFrame:
    """Batch post-pass for interval_join_outer's replay output: the bin
    explode doubled each signup (bin, bin+1), so an unmatched signup
    emits two NULL rows and a matched one emits its match plus the other
    probe's NULL — collapse per signup: a match wins over NULL, and the
    (delta, id) struct-min keeps the surviving pair COHERENT (earliest
    purchase, keyed tie-break), where independent per-column MINs could
    mix fields from different purchases. Kept OUT of the streaming plan
    on purpose: chaining an aggregation after a stream-stream outer join
    stacks a second stateful operator whose own watermark would withhold
    rows further — the collapse is cheap, exact, and stateless once rows
    are final."""
    best = (
        raw.filter(F.col("purchase_id").isNotNull())
        .groupBy("signup_id")
        .agg(F.min(F.struct("delta_us", "purchase_id")).alias("m"))
        # renamed key sidesteps the self-join attribute clash (both
        # branches read the same memory-sink view)
        .select(
            F.col("signup_id").alias("b_signup_id"),
            F.col("m.purchase_id").alias("b_purchase_id"),
            F.col("m.delta_us").alias("b_delta_us"),
        )
    )
    ids = raw.select("signup_id").distinct()
    return ids.join(
        best, F.col("signup_id") == F.col("b_signup_id"), "left"
    ).select(
        "signup_id",
        F.col("b_purchase_id").alias("purchase_id"),
        F.col("b_delta_us").alias("delta_us"),
    )


def replay_in_batches(
    spark: SparkSession,
    batched: DataFrame,
    batch_col: str,
    n_batches: int,
    schema_ddl: str,
    build_query,
    name: str,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> DataFrame:
    """Drive a streaming query over a MULTI-batch replay: ``batched``
    carries a 1..n_batches delivery index in ``batch_col``; every slice
    is staged up front by ONE ``partitionBy(batch_col)`` write, and each
    delivery is an atomic file MOVE into the source dir, fully processed
    before the next moves — so micro-batch boundaries, and therefore
    watermark advancement, are exactly the index boundaries. (One Spark
    job stages all deliveries; the pre-r13 shape checkpointed the frame
    and ran one filter+write job per delivery — n+1 jobs re-scanning the
    same rows. File moves cost no compute and cannot reorder rows:
    delivery contents are identical, guide §1.2/§6.) This is the harness
    for semantics that only exist ACROSS batches (late-data drops,
    append-mode eviction timing); the single-shot
    ``run_stream_to_memory`` replay feeds everything in one batch, where
    a watermark can never drop anything.

    ``state_partitions``: state-store instance count for the streaming
    query, for callers whose stateful operator has a PROVABLY bounded
    keyspace (e.g. a watermarked tumbling agg holds open windows x group
    values — time-span-bounded, independent of corpus size). Partial
    (map-side) aggregation runs before the exchange, so the scan stage
    keeps full parallelism and only the bounded state stage narrows —
    sizing state stores to the keyspace instead of the session shuffle
    default is the production-correct shape at ANY scale, not a local
    tune. The session value is restored after the query stops (Spark
    pins the value in the query's own offset metadata at start).

    Asserts exactly n_batches data-carrying micro-batches ran — the
    delivery-cadence premise the caller's oracle encodes — and returns
    the memory-sink result materialized off the scratch dir."""
    import glob
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix=f"{name}_")
    src = f"{base}/in"
    stage = f"{base}/stage"
    try:
        # ONE file per delivery (r13 ADVICE): repartition on the batch
        # column so each delivery stages as a single part file and the
        # os.rename below is one atomic move — a delivery staged as
        # several files (any multi-partition ``batched``) could be split
        # across two micro-batches if a trigger fires between renames,
        # breaking the exactly-n_batches replay premise. Hash collisions
        # only co-locate two batch VALUES in one task; partitionBy still
        # writes each value its own file.
        batched.repartition(n_batches, F.col(batch_col)).write.partitionBy(
            batch_col
        ).parquet(stage)
        os.makedirs(src, exist_ok=True)

        def deliver(i: int) -> None:
            parts = sorted(glob.glob(f"{stage}/{batch_col}={i}/*.parquet"))
            if not parts:
                raise AssertionError(
                    f"stream {name!r}: delivery {i} staged no files — "
                    f"the replay premise requires {n_batches} non-empty "
                    "deliveries"
                )
            for p in parts:
                # distinct target names: part files of one staging job
                # share task-numbered names across partition dirs
                os.rename(p, f"{src}/b{i}_{os.path.basename(p)}")

        old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
        if state_partitions is not None:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(state_partitions)
            )
        q = None
        try:
            deliver(1)
            stream = spark.readStream.schema(schema_ddl).parquet(src)
            q = (
                build_query(stream)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .start()
            )
            q.processAllAvailable()
            for i in range(2, n_batches + 1):
                deliver(i)
                q.processAllAvailable()
            data_batches = sum(
                1 for p in q.recentProgress if p["numInputRows"] > 0
            )
            if data_batches != n_batches:
                raise AssertionError(
                    f"stream {name!r}: {data_batches} data-carrying "
                    f"micro-batches, replay premise requires exactly "
                    f"{n_batches} — the oracle's watermark "
                    "trajectory no longer matches the delivery"
                )
        finally:
            if q is not None:
                q.stop()
            if state_partitions is not None:
                spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
        out = spark.table(name)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_stream_to_memory(
    streaming_df: DataFrame,
    name: str,
    output_mode: str = "append",
    max_input_batches: int | None = None,
) -> DataFrame:
    """Drive a streaming DataFrame to completion against the available input
    (deterministic replay) and return the materialized result.

    Memory sink is the local harness; production sinks swap in
    ``foreachBatch`` + io.writer.write_partition_overwrite for exactly-once
    idempotent partition updates.

    ``max_input_batches`` makes a delivery-cadence premise LOUD: callers
    whose correctness contract depends on the replay arriving in at most
    N data-carrying micro-batches (e.g. q_stream_dedup's equivalence to
    global batch DISTINCT holds only under single-batch delivery) pass
    the bound, and a fixture change that splits the source into more
    files fails here with a clear message instead of as a driver-side
    value mismatch."""
    spark = streaming_df.sparkSession
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
        if max_input_batches is not None:
            data_batches = sum(
                1 for p in q.recentProgress if p["numInputRows"] > 0
            )
            if data_batches > max_input_batches:
                raise AssertionError(
                    f"stream {name!r}: {data_batches} data-carrying "
                    f"micro-batches, premise allows {max_input_batches} — "
                    "the source fixture is no longer delivered in one "
                    "batch; the registered oracle's equivalence no "
                    "longer holds"
                )
    finally:
        q.stop()
    return spark.table(name)
