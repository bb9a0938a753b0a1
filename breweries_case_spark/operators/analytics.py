"""Product/behavioral analytics operators over the ``events`` star-schema
tables — the query family a warehouse user runs daily on event streams
(funnel conversion, cohort retention, Markov transitions, histograms) plus
the reshaping/statistics surface (unpivot, deterministic moments and
regression aggregates, map columns, positional explode).

These extend SURVEY §2.6's window/agg surface in the same spirit as the
TPC-H block: each id is a classic analytics shape expressed as one
declarative plan Catalyst can optimize, with a DuckDB oracle twin.

Determinism discipline (SURVEY §7.3 hard part 5): every float aggregate
goes through decimal sums or exact integer sums; every derived double is
computed by the IDENTICAL IEEE expression tree on both engines and rounded
to 6; no transcendentals (sqrt is IEEE-correctly-rounded, so it is safe —
unlike exp/log which differ in the last ulp across libm builds).

Scale notes per operator are in the docstrings; the funnel/retention/
transition family deliberately keys every shuffle on ``user_id`` so at
100 TB the whole pipeline is ONE exchange of events reused across stages
(co-partitioned aggregates + joins), not one shuffle per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from breweries_case_spark.functions import decimal_sum
from breweries_case_spark.io.reader import load_table

FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user reaches
    stage N when an event of stage-N type occurs at-or-after their earliest
    stage-N-1 arrival. Output is one row per stage with the user count.

    Plan shape: three per-user min-timestamp aggregates chained by
    user_id-keyed joins — every exchange in the pipeline hashes on
    ``user_id``, so on a cluster the events shuffle once and stages 2..N
    reuse the co-partitioning (Exchange reuse / no new shuffle key). The
    stage tables shrink monotonically (funnel property), so later joins
    get cheaper, and each fits broadcast at any realistic scale."""
    ev = load_table(spark, sf_dir, "events")

    def stage_min(df: DataFrame, etype: str, after: DataFrame | None) -> DataFrame:
        s = ev.filter(F.col("event_type") == etype)
        if after is not None:
            s = s.join(after, "user_id").filter(F.col("ts") >= F.col("t_prev"))
        return s.groupBy("user_id").agg(F.min("ts").alias("t_prev"))

    reached: list[DataFrame] = []
    prev = None
    for etype in FUNNEL_STAGES:
        prev = stage_min(ev, etype, prev)
        reached.append(
            prev.agg(
                F.lit(etype).alias("stage"), F.count("*").alias("users")
            )
        )
    out = reached[0]
    for r in reached[1:]:
        out = out.unionByName(r)
    return out


FUNNEL_WINDOW_HOURS = 24


def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel: stage N counts only when it occurs
    within 24 h of the user's stage-N-1 arrival — the product-analytics
    default (an unbounded funnel overstates conversion by crediting
    purchases weeks later). Same user_id-keyed chain as q_funnel with a
    bounded BETWEEN on each hop; the bound also caps join state at
    scale: a stream-side implementation could evict stage anchors after
    the window, exactly like the stream-stream interval join."""
    ev = load_table(spark, sf_dir, "events")
    bound = F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")

    def stage_min(etype: str, after: DataFrame | None) -> DataFrame:
        s = ev.filter(F.col("event_type") == etype)
        if after is not None:
            s = s.join(after, "user_id").filter(
                (F.col("ts") >= F.col("t_prev"))
                & (F.col("ts") <= F.col("t_prev") + bound)
            )
        return s.groupBy("user_id").agg(F.min("ts").alias("t_prev"))

    reached: list[DataFrame] = []
    prev = None
    for etype in FUNNEL_STAGES:
        prev = stage_min(etype, prev)
        reached.append(
            prev.agg(F.lit(etype).alias("stage"), F.count("*").alias("users"))
        )
    out = reached[0]
    for r in reached[1:]:
        out = out.unionByName(r)
    return out


def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: cohort = Monday-truncated week of a user's
    first event; each (user, active-week) pair counts once toward
    (cohort_week, week_offset). The canonical retention triangle.

    Both engines truncate weeks to Monday, so ``datediff/7`` is an exact
    integer. One shuffle on user_id for first-seen + the distinct, then a
    user_id-keyed join (co-partitioned), then the small final rollup."""
    ev = load_table(spark, sf_dir, "events")
    week = lambda c: F.to_date(F.date_trunc("week", c))  # noqa: E731
    first = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    active = ev.select("user_id", week(F.col("ts")).alias("act_week")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    (src → dst) counts plus mean gap seconds. Ordering is total
    (ts, event_id) so ``lead`` is deterministic under timestamp ties.

    One shuffle on user_id for the sequence window, then a small
    (|types|²-bounded) aggregate. Gap average is an exact BIGINT
    microsecond sum divided in double at the end — order-insensitive."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
        (F.lead(F.unix_micros(F.col("ts"))).over(w) - F.unix_micros(F.col("ts"))).alias(
            "gap_us"
        ),
    ).filter(F.col("dst").isNotNull())
    return seq.groupBy("src", "dst").agg(
        F.count("*").alias("n_transitions"),
        F.round(
            F.sum("gap_us").cast("double") / F.count("*") / F.lit(1000000.0), 6
        ).alias("avg_gap_s"),
    )


def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day distinct users per day (the DAU/WAU board).
    Rolling DISTINCT is the aggregate windows can't do (no
    countDistinct over a frame), and the naive day-spine range join
    plans as a nested loop. The scale-correct form used here: each
    (user, day) row CONTRIBUTES to the 7 trailing windows it belongs to
    (explode of a 7-date sequence — narrow 7× expansion), then one
    hash aggregate per day counts distinct contributors. Inner join back
    to real days drops the phantom day+1..+6 tails. At 100 TB: the
    expansion factor is the window length (constant), both aggregates
    partial map-side, and no plan shape degrades with row count."""
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        F.to_date(F.col("ts")).alias("day"), "user_id"
    ).distinct()
    dau = user_days.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = user_days.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    roll = contrib.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau_7d")
    )
    return dau.join(roll, "day")


def q_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands idiom: distinct (user, day), rank days per user,
    then ``day − rank`` is constant within an island of consecutive
    days; group on it and take the max island length. Two exchanges
    (user window, then the per-user max), both partial-aggregating;
    island detection itself is a narrow derived column, not a self-join
    (the naive formulation joins day to day−1 per row)."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date(F.col("ts")).alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = ud.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("island"),
    )
    return (
        islands.groupBy("user_id", "island")
        .agg(F.count("*").alias("len"))
        .groupBy("user_id")
        .agg(
            F.max("len").cast("int").alias("longest_streak"),
            F.count("*").cast("int").alias("n_streaks"),
        )
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram over events (bucket = floor(value/10)):
    per-bucket count, min/max, decimal-exact sum. The profiling shape that
    feeds data-skew decisions (e.g. whether a join key needs salting).
    Single hash aggregate over ~50 buckets — map-side partials collapse
    virtually all rows before the exchange."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.floor(F.col("value") / F.lit(10.0)).cast("int").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            decimal_sum(F.col("value"), scale=6).alias("sum_value"),
        )
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long reshape of part metrics via the native ``unpivot``
    (melt) operator — a generated projection + union, no shuffle, fully
    pipelined into the scan."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )


def _moment_sums(x, y):
    """Decimal-exact power sums (per-addend rounded to 6, summed exactly)
    cast to double for the closed-form moment formulas. The double
    products feeding the casts are single IEEE multiplies — deterministic
    on both engines."""
    d = lambda c: F.sum(c.cast("decimal(18,6)")).cast("double")  # noqa: E731
    return (
        d(x),
        d(x * x),
        d(y),
        d(y * y),
        d(x * y),
        F.count(F.lit(1)).cast("double"),
    )


def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group distribution moments of lineitem quantity vs price:
    mean, sample stddev, Pearson correlation, population covariance —
    computed from five decimal-exact power sums per group (one aggregate
    pass), combined by the identical double formula on both engines.
    This is the scalable form of DataFrame.stat at 100 TB: power sums are
    algebraic (partial-aggregable map-side), unlike a naive two-pass
    mean-then-deviation plan."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    sx, sx2, sy, sy2, sxy, n = _moment_sums(x, y)
    var_x = (sx2 - sx * sx / n) / (n - F.lit(1.0))
    cov_pop = (sxy - sx * sy / n) / n
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy)
    )
    return li.groupBy("l_returnflag").agg(
        n.cast("long").alias("n"),
        F.round(sx / n, 6).alias("mean_q"),
        F.round(F.sqrt(var_x), 6).alias("std_q"),
        F.round(corr, 6).alias("corr_qp"),
        F.round(cov_pop, 6).alias("covar_pop_qp"),
    )


def q_regr_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (extendedprice ~ quantity):
    slope, intercept, r² from the same algebraic power sums as
    q_stats_moments — the SQL-standard REGR_* family re-derived in a form
    whose float behavior is bit-identical across engines (built-in
    regr_slope would diverge in the last ulp between Spark and DuckDB
    because their summation orders differ)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    sx, sx2, sy, sy2, sxy, n = _moment_sums(x, y)
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    intercept = sy / n - slope * (sx / n)
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy)
    )
    return li.groupBy("l_linestatus").agg(
        n.cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(corr * corr, 6).alias("r2"),
    )


def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over (user, day) baskets of event types:
    pairwise support, confidence, and lift — the A-Priori L2 pass as
    pure relational algebra. Baskets are tiny (≤|event types| items), so
    the within-basket self-join fans out ≤ C(|types|,2) rows per basket
    — linear in baskets, never all-pairs across the corpus. All ratios
    are single IEEE divisions of exact counts (no float sums at all);
    the basket-count scalar is a driver-side 1-row aggregate (the
    parameter-scale collect class, not a data collect)."""
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.select(
        "user_id", F.to_date(F.col("ts")).alias("day"), "event_type"
    ).distinct()
    n_baskets = baskets.select("user_id", "day").distinct().count()
    item = baskets.groupBy("event_type").agg(F.count("*").alias("c_item"))
    a = baskets.select(
        "user_id", "day", F.col("event_type").alias("item_a")
    )
    b = baskets.select(
        "user_id", "day", F.col("event_type").alias("item_b")
    )
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("c_pair"))
    )
    ca = item.select(
        F.col("event_type").alias("item_a"), F.col("c_item").alias("c_a")
    )
    cb = item.select(
        F.col("event_type").alias("item_b"), F.col("c_item").alias("c_b")
    )
    n = F.lit(float(n_baskets))
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .select(
            "item_a",
            "item_b",
            "c_pair",
            F.round(F.col("c_pair") / n, 6).alias("support"),
            F.round(F.col("c_pair") / F.col("c_a"), 6).alias("conf_a_to_b"),
            F.round(
                F.col("c_pair") * n / (F.col("c_a") * F.col("c_b")), 6
            ).alias("lift"),
        )
    )


ZSCORE_THRESHOLD = 3.0


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier detection over event values (|z| > 3) —
    the monitoring query behind metric alerting. Group stats come from
    the same algebraic decimal power sums as q_stats_moments (one
    aggregate pass), broadcast back onto the stream (|event types| rows),
    so the whole detector is scan → tiny agg → broadcast join → narrow
    filter; the threshold comparison runs on the UNROUNDED z (identical
    IEEE doubles on both engines), rounding only the reported value."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value")
    d = lambda c: F.sum(c.cast("decimal(18,6)")).cast("double")  # noqa: E731
    stats = ev.groupBy("event_type").agg(
        d(x).alias("sx"),
        d(x * x).alias("sx2"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    mean = F.col("sx") / F.col("n")
    std = F.sqrt(
        (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n"))
        / (F.col("n") - F.lit(1.0))
    )
    z = (F.col("value") - mean) / std
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > F.lit(ZSCORE_THRESHOLD))
        .select(
            "event_id",
            "event_type",
            "value",
            (F.floor(z * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
            .cast("double")
            .alias("z"),
        )
    )


def q_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: per-user daily value totals densified onto
    the full user × day grid, missing days filled by
    last-observation-carried-forward (IGNORE NULLS window). The grid
    crossJoin is DELIBERATE dense-grid construction over two
    dimension-sized inputs (users × days — never fact-scale); the LOCF
    window shuffles once on user_id. Days before a user's first
    observation stay NULL (both engines)."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    days = ev.select(F.to_date(F.col("ts")).alias("day")).distinct()
    actual = (
        ev.select("user_id", F.to_date(F.col("ts")).alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(decimal_sum(F.col("value"), scale=6).alias("day_value"))
    )
    grid = users.crossJoin(days)
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(actual, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            "day_value",
            F.last("day_value", ignorenulls=True).over(w).alias("filled"),
        )
    )


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column family over part: construct a string→double map
    per row, extract by key, cardinality, sorted-key digest. Map values
    are projected back to scalars before output so the oracle hash never
    sees an engine-specific map encoding. Pure narrow projection."""
    p = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("size"),
        F.col("p_size").cast("double"),
        F.lit("retail"),
        F.col("p_retailprice").cast("double"),
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "size").alias("size_val"),
        F.element_at(m, "retail").alias("retail_val"),
        F.size(m).alias("m_card"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode of part-name tokens: (p_partkey, pos, word) with
    0-based positions — the LATERAL VIEW shape used for ordered nested
    data. Narrow 1→N row generation pipelined into the scan."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "word"),
    ).select("p_partkey", F.col("pos").cast("int").alias("pos"), "word")


#: synthetic service-window length for interval construction
INTERVAL_DAYS = 30


def q_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping intervals per customer: each order opens a
    30-day service window [o_orderdate, o_orderdate+30d]; consolidate
    overlapping-or-touching windows into maximal covered spans with the
    order count per span — the range-consolidation primitive behind
    contract coverage, sensor uptime, and IP-range merging.

    Single-pass plan: one customer-keyed shuffle, a running-max-of-end
    window flags a new island whenever the next start exceeds every
    previous end, a running sum numbers the islands, one groupBy emits
    the spans. All three windows + the final aggregate reuse the SAME
    o_custkey partitioning — one exchange total, any per-customer
    interval count."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("ivl_start"),
        F.date_add(F.col("o_orderdate").cast("date"), INTERVAL_DAYS).alias(
            "ivl_end"
        ),
    )
    wo = Window.partitionBy("o_custkey").orderBy(
        "ivl_start", "ivl_end", "o_orderkey"
    )
    prev_max_end = F.max("ivl_end").over(
        wo.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (
        prev_max_end.isNull() | (F.col("ivl_start") > prev_max_end)
    ).cast("int")
    return (
        o.withColumn("_new", new_island)
        .withColumn(
            "island",
            F.sum("_new").over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("o_custkey", "island")
        .agg(
            F.min("ivl_start").alias("span_start"),
            F.max("ivl_end").alias("span_end"),
            F.count("*").alias("n_orders"),
        )
        .select("o_custkey", "span_start", "span_end", "n_orders")
    )


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline) of parts: the (retailprice, size)
    pairs not dominated by any pair that is cheaper-or-equal AND
    larger-or-equal (one strict) — minimize price, maximize size.

    Scale path: collapse to per-price max size (one hash agg — equal
    prices can only be dominated by their own max), then a sorted sweep:
    a price group survives iff its size beats the running max over all
    strictly cheaper groups. O(n log n) vs the oracle's O(n²) NOT
    EXISTS. The sweep window is global-ordered (1 partition) but runs on
    ≤|distinct prices| rows, and the frontier-of-local-frontiers
    property means a 100 TB input pre-prunes per partition first — the
    union of per-partition frontiers contains the global frontier."""
    p = load_table(spark, sf_dir, "part")
    best = p.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("size")
    )
    sweep = Window.orderBy("price").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_best = F.max("size").over(sweep)
    return (
        best.withColumn("_prev", prev_best)
        .filter(F.col("_prev").isNull() | (F.col("size") > F.col("_prev")))
        .select("price", "size")
    )


def q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-language spread statistics over document length:
    exact median, IQR (p75−p25), and MAD (median absolute deviation
    from the median) — the outlier-resistant profile a corpus audit
    uses where mean/stddev are distorted by the long tail.

    MAD needs the median joined back: phase 1 is one grouped sort-agg,
    the per-lang medians broadcast (a few rows) into the narrow
    deviation compute, phase 2 is a second grouped sort-agg. At 100 TB:
    two shuffles on lang (skew-prone for giant languages — exact
    percentile sorts within group; swap to percentile_approx per the
    q_percentile_approx twin when a stratum outgrows sort-spill
    comfort)."""
    d = load_table(spark, sf_dir, "documents")
    quart = d.groupBy("lang").agg(
        F.percentile(F.col("n_chars"), F.lit(0.5)).alias("_med"),
        F.percentile(F.col("n_chars"), F.lit(0.25)).alias("_p25"),
        F.percentile(F.col("n_chars"), F.lit(0.75)).alias("_p75"),
    )
    dev = d.join(F.broadcast(quart), "lang").withColumn(
        "_absdev", F.abs(F.col("n_chars") - F.col("_med"))
    )
    return dev.groupBy("lang").agg(
        F.round(F.first("_med"), 6).alias("median_chars"),
        F.round(F.first("_p75") - F.first("_p25"), 6).alias("iqr_chars"),
        F.round(F.percentile(F.col("_absdev"), F.lit(0.5)), 6).alias(
            "mad_chars"
        ),
    )


def q_semi_additive_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-additive measure rollup: treat each user's event ``value`` as
    a balance reading — per month, take every user's LAST reading (by
    ts, event_id tiebreak) and sum those across users. The
    account-balance/inventory-level pattern where summing over time
    double-counts but summing the period-end snapshot is correct.

    Plan: one (user, month)-keyed window picks the last reading, the
    month re-aggregate reuses a prefix of the same hash partitioning.
    Decimal sums keep the cross-user total reduce-order-invariant."""
    e = load_table(spark, sf_dir, "events")
    month = F.date_trunc("month", F.col("ts")).cast("date")
    w = Window.partitionBy("user_id", "_month").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        e.withColumn("_month", month)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return (
        last.groupBy(F.col("_month").alias("month"))
        .agg(
            F.count("*").alias("n_users_reporting"),
            decimal_sum(F.col("value")).alias("eom_balance"),
        )
        .orderBy("month")
    )


def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, value-checked: split events into an
    'existing state' shard (event_id % 5 != 4) and a 'new arrivals'
    shard, partial-aggregate EACH SEPARATELY as (count, exact decimal
    sum) state rows, then MERGE states by re-aggregating the union — and
    the result must equal the oracle's one-shot aggregate over all
    events. This is the mergeable-state discipline of
    pipelines/incremental.py (HLL rollups) made driver-checkable: counts
    and decimal sums are exactly mergeable, so the nightly-delta merge
    path provably equals full recompute. Finalization (cast to double)
    happens only AFTER the merge — merging finalized doubles would
    reintroduce reduce-order drift."""
    e = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        )

    old_state = partial(e.filter(F.col("event_id") % 5 != 4))
    new_state = partial(e.filter(F.col("event_id") % 5 == 4))
    return (
        old_state.unionByName(new_state)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").cast("double").alias("total_value"),
        )
    )


def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-explicit navigation windows (first_value / last_value /
    nth_value) over each customer's order history — the W2 family's
    remaining analytic shapes, each with the frame spelled out because
    the SQL default (RANGE UNBOUNDED PRECEDING..CURRENT ROW) silently
    makes last_value ≡ current row, the classic window footgun. Frames:
    first order date over the growing frame, final spend over the FULL
    partition frame, second order's key via nth_value, and the previous
    order's spend via a trailing 1-row frame. Tie-deterministic ordering
    (o_orderdate, o_orderkey); one shuffle on the partition key; values
    are navigated, not aggregated, so no float accumulation exists to
    drift."""
    base = (
        Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    )
    growing = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = base.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    trail1 = base.rowsBetween(-1, -1)
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(growing).alias("first_order_date"),
        F.last("o_totalprice").over(full).alias("final_spend"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_orderkey"),
        F.last("o_totalprice").over(trail1).alias("prev_spend"),
    )


#: attribution lookback window (seconds before the conversion)
ATTRIB_WINDOW_S = 3600
#: touchpoint event types credited with conversions
ATTRIB_TOUCH_TYPES = ("click", "view")


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution: every ``purchase`` credits the
    user's ``click``/``view`` touchpoints in the preceding hour under
    three standard models at once — linear (1/n per touch), first-touch,
    last-touch — aggregated per touchpoint type. The marketing-analytics
    kernel every event warehouse runs; exercises a per-user temporal
    join + per-conversion ranking that none of the funnel ids cover.

    Plan shape: touches and conversions are two filters of ONE events
    scan, equi-joined on user_id (co-partitioned — the same single
    exchange the funnel family rides) with the 1-hour range as a join
    filter; per-conversion rank/count windows key on the conversion id.
    At 100 TB the join is user-keyed (bounded per-user fan-out), never a
    theta join. Determinism: epoch-second comparisons (exact integers),
    tie-break (ts, event_id); the only division (1/n) is requantized to
    6 dp per touch then decimal-summed (SURVEY §7.3 hard part 5)."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.expr("CAST(FLOOR(unix_micros(ts) / 1000000) AS BIGINT)")
    base = ev.select(
        "user_id", "event_id", "event_type", sec.alias("sec")
    )
    touches = base.filter(
        F.col("event_type").isin(*ATTRIB_TOUCH_TYPES)
    ).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.col("sec").alias("t_sec"),
    )
    conv = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("sec").alias("c_sec"),
    )
    j = conv.join(touches, "user_id").filter(
        (F.col("t_sec") <= F.col("c_sec"))
        & (F.col("t_sec") >= F.col("c_sec") - ATTRIB_WINDOW_S)
    )
    w = Window.partitionBy("conv_id").orderBy("t_sec", "touch_id")
    wfull = Window.partitionBy("conv_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = j.select(
        "touch_type",
        F.row_number().over(w).alias("rnk"),
        F.count("*").over(wfull).alias("n_touches"),
    )
    credit = F.floor(F.lit(1e6) / F.col("n_touches") + F.lit(0.5)) / 1e6
    return ranked.groupBy("touch_type").agg(
        F.count("*").alias("touches"),
        F.sum(F.when(F.col("rnk") == 1, 1).otherwise(0)).alias("first_touch"),
        F.sum(
            F.when(F.col("rnk") == F.col("n_touches"), 1).otherwise(0)
        ).alias("last_touch"),
        F.sum(credit.cast("decimal(18,6)")).cast("double").alias("linear_credit"),
    )


QUERIES = {
    "q_funnel": q_funnel,
    "q_funnel_windowed": q_funnel_windowed,
    "q_market_basket": q_market_basket,
    "q_retention_cohort": q_retention_cohort,
    "q_event_transitions": q_event_transitions,
    "q_rolling_distinct": q_rolling_distinct,
    "q_user_streaks": q_user_streaks,
    "q_anomaly_zscore": q_anomaly_zscore,
    "q_locf_fill": q_locf_fill,
    "q_histogram": q_histogram,
    "q_unpivot": q_unpivot,
    "q_stats_moments": q_stats_moments,
    "q_regr_funcs": q_regr_funcs,
    "q_map_funcs": q_map_funcs,
    "q_posexplode": q_posexplode,
    "q_merge_intervals": q_merge_intervals,
    "q_pareto_frontier": q_pareto_frontier,
    "q_robust_stats": q_robust_stats,
    "q_semi_additive_balance": q_semi_additive_balance,
    "q_incremental_agg_merge": q_incremental_agg_merge,
    "q_window_first_last": q_window_first_last,
    "q_attribution": q_attribution,
}


_MOMENT_SUMS_SQL = """
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
            CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx2,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
            CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy2,
            CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
            CAST(COUNT(*) AS DOUBLE) AS n
"""

ORACLES = {
    "q_attribution": f"""
        WITH base AS (
            SELECT user_id, event_id, event_type,
                   CAST(FLOOR(epoch_us(ts) / 1000000) AS BIGINT) AS sec
            FROM events),
        touches AS (
            SELECT user_id, event_id AS touch_id, event_type AS touch_type,
                   sec AS t_sec
            FROM base WHERE event_type IN ('click', 'view')),
        conv AS (
            SELECT user_id, event_id AS conv_id, sec AS c_sec
            FROM base WHERE event_type = 'purchase'),
        j AS (
            SELECT c.conv_id, t.touch_type, t.t_sec, t.touch_id
            FROM conv c JOIN touches t USING (user_id)
            WHERE t.t_sec <= c.c_sec
              AND t.t_sec >= c.c_sec - {ATTRIB_WINDOW_S}),
        ranked AS (
            SELECT touch_type,
                   ROW_NUMBER() OVER (PARTITION BY conv_id
                       ORDER BY t_sec, touch_id) AS rnk,
                   COUNT(*) OVER (PARTITION BY conv_id) AS n_touches
            FROM j)
        SELECT touch_type,
               COUNT(*) AS touches,
               CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS first_touch,
               CAST(SUM(CASE WHEN rnk = n_touches THEN 1 ELSE 0 END)
                    AS BIGINT) AS last_touch,
               CAST(SUM(CAST(FLOOR(1e6 / n_touches + 0.5) / 1e6
                             AS DECIMAL(18,6))) AS DOUBLE) AS linear_credit
        FROM ranked GROUP BY 1
    """,
    "q_window_first_last": """
        SELECT o_custkey, o_orderkey,
               FIRST_VALUE(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS first_order_date,
               LAST_VALUE(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS final_spend,
               NTH_VALUE(o_orderkey, 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS second_orderkey,
               LAST_VALUE(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING)
                   AS prev_spend
        FROM orders
    """,
    "q_funnel": """
        WITH v AS (
            SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t FROM events e
            JOIN v ON e.user_id = v.user_id AND e.ts >= v.t
            WHERE e.event_type = 'click' GROUP BY 1),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t FROM events e
            JOIN c ON e.user_id = c.user_id AND e.ts >= c.t
            WHERE e.event_type = 'purchase' GROUP BY 1)
        SELECT 'view' AS stage, COUNT(*) AS users FROM v
        UNION ALL SELECT 'click', COUNT(*) FROM c
        UNION ALL SELECT 'purchase', COUNT(*) FROM p
    """,
    "q_market_basket": """
        WITH baskets AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
            FROM events),
        n AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_baskets
            FROM (SELECT DISTINCT user_id, day FROM baskets)),
        item AS (
            SELECT event_type, COUNT(*) AS c_item FROM baskets GROUP BY 1),
        pairs AS (
            SELECT a.event_type AS item_a, b.event_type AS item_b,
                   COUNT(*) AS c_pair
            FROM baskets a
            JOIN baskets b
              ON a.user_id = b.user_id AND a.day = b.day
             AND a.event_type < b.event_type
            GROUP BY 1, 2)
        SELECT item_a, item_b, c_pair,
               ROUND(c_pair / n.n_baskets, 6) AS support,
               ROUND(c_pair / ca.c_item, 6) AS conf_a_to_b,
               ROUND(c_pair * n.n_baskets / (ca.c_item * cb.c_item), 6)
                   AS lift
        FROM pairs
        JOIN item ca ON ca.event_type = pairs.item_a
        JOIN item cb ON cb.event_type = pairs.item_b, n
    """,
    "q_funnel_windowed": """
        WITH v AS (
            SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t FROM events e
            JOIN v ON e.user_id = v.user_id
                  AND e.ts >= v.t
                  AND e.ts <= v.t + INTERVAL 24 HOURS
            WHERE e.event_type = 'click' GROUP BY 1),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t FROM events e
            JOIN c ON e.user_id = c.user_id
                  AND e.ts >= c.t
                  AND e.ts <= c.t + INTERVAL 24 HOURS
            WHERE e.event_type = 'purchase' GROUP BY 1)
        SELECT 'view' AS stage, COUNT(*) AS users FROM v
        UNION ALL SELECT 'click', COUNT(*) FROM c
        UNION ALL SELECT 'purchase', COUNT(*) FROM p
    """,
    "q_retention_cohort": """
        WITH first AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY 1),
        active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS act_week
            FROM events)
        SELECT cohort_week,
               CAST(datediff('day', cohort_week, act_week) / 7 AS INT)
                   AS week_offset,
               COUNT(*) AS active_users
        FROM active JOIN first USING (user_id)
        GROUP BY 1, 2
    """,
    "q_event_transitions": """
        WITH seq AS (
            SELECT event_type AS src,
                   LEAD(event_type) OVER w AS dst,
                   LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT src, dst, COUNT(*) AS n_transitions,
               ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
                   AS avg_gap_s
        FROM seq WHERE dst IS NOT NULL
        GROUP BY 1, 2
    """,
    "q_rolling_distinct": """
        WITH ud AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
        contrib AS (
            SELECT ud.day + CAST(s.i AS INT) AS day, user_id
            FROM ud, unnest(generate_series(0, 6)) AS s(i)),
        roll AS (
            SELECT day, COUNT(DISTINCT user_id) AS wau_7d
            FROM contrib GROUP BY 1)
        SELECT d.day, d.dau, r.wau_7d
        FROM dau d JOIN roll r USING (day)
    """,
    "q_anomaly_zscore": """
        WITH s AS (
            SELECT event_type,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE)
                       AS sx2,
                   CAST(COUNT(*) AS DOUBLE) AS n
            FROM events GROUP BY 1),
        z AS (
            SELECT e.event_id, e.event_type, e.value,
                   (e.value - s.sx / s.n)
                       / SQRT((s.sx2 - s.sx * s.sx / s.n) / (s.n - 1.0))
                       AS zraw
            FROM events e JOIN s USING (event_type))
        SELECT event_id, event_type, value,
               FLOOR(zraw * 1000000.0 + 0.5) / 1000000.0 AS z
        FROM z WHERE ABS(zraw) > 3.0
    """,
    "q_locf_fill": """
        WITH users AS (SELECT DISTINCT user_id FROM events),
        days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
        actual AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       AS day_value
            FROM events GROUP BY 1, 2)
        SELECT g.user_id, g.day, a.day_value,
               LAST_VALUE(a.day_value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS filled
        FROM (SELECT * FROM users, days) g
        LEFT JOIN actual a
          ON g.user_id = a.user_id AND g.day = a.day
    """,
    "q_user_streaks": """
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        islands AS (
            SELECT user_id,
                   day - CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY day) AS INT) AS island
            FROM ud),
        runs AS (
            SELECT user_id, island, COUNT(*) AS len
            FROM islands GROUP BY 1, 2)
        SELECT user_id,
               CAST(MAX(len) AS INT) AS longest_streak,
               CAST(COUNT(*) AS INT) AS n_streaks
        FROM runs GROUP BY 1
    """,
    "q_histogram": """
        SELECT CAST(FLOOR(value / 10.0) AS INT) AS bucket,
               COUNT(*) AS n_events,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1
    """,
    "q_unpivot": """
        SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    """,
    "q_stats_moments": f"""
        WITH s AS (
            SELECT l_returnflag,
{_MOMENT_SUMS_SQL}
            FROM lineitem GROUP BY 1)
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n,
               ROUND(sx / n, 6) AS mean_q,
               ROUND(SQRT((sx2 - sx * sx / n) / (n - 1.0)), 6) AS std_q,
               ROUND((n * sxy - sx * sy)
                     / (SQRT(n * sx2 - sx * sx) * SQRT(n * sy2 - sy * sy)),
                     6) AS corr_qp,
               ROUND((sxy - sx * sy / n) / n, 6) AS covar_pop_qp
        FROM s
    """,
    "q_regr_funcs": f"""
        WITH s AS (
            SELECT l_linestatus,
{_MOMENT_SUMS_SQL}
            FROM lineitem GROUP BY 1),
        d AS (
            SELECT l_linestatus, n,
                   (n * sxy - sx * sy) / (n * sx2 - sx * sx) AS slope,
                   (n * sxy - sx * sy)
                       / (SQRT(n * sx2 - sx * sx) * SQRT(n * sy2 - sy * sy))
                       AS corr,
                   sx, sy
            FROM s)
        SELECT l_linestatus,
               CAST(n AS BIGINT) AS n,
               ROUND(slope, 6) AS slope,
               ROUND(sy / n - slope * (sx / n), 6) AS intercept,
               ROUND(corr * corr, 6) AS r2
        FROM d
    """,
    "q_map_funcs": """
        WITH m AS (
            SELECT p_partkey,
                   MAP(['size', 'retail'],
                       [CAST(p_size AS DOUBLE), p_retailprice]) AS m
            FROM part)
        SELECT p_partkey,
               m['size'][1] AS size_val,
               m['retail'][1] AS retail_val,
               CAST(cardinality(m) AS INT) AS m_card,
               array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted
        FROM m
    """,
    "q_posexplode": """
        SELECT p_partkey,
               CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1
                    AS INT) AS pos,
               unnest(string_split(p_name, ' ')) AS word
        FROM part
    """,
    "q_merge_intervals": f"""
        WITH iv AS (
            SELECT o_custkey, o_orderkey,
                   CAST(o_orderdate AS DATE) AS ivl_start,
                   CAST(o_orderdate AS DATE) + INTERVAL {INTERVAL_DAYS} DAY
                       AS ivl_end
            FROM orders),
        flagged AS (
            SELECT o_custkey, ivl_start, ivl_end,
                   CASE WHEN MAX(ivl_end) OVER (
                            PARTITION BY o_custkey
                            ORDER BY ivl_start, ivl_end, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) IS NULL
                          OR ivl_start > MAX(ivl_end) OVER (
                            PARTITION BY o_custkey
                            ORDER BY ivl_start, ivl_end, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
                        THEN 1 ELSE 0 END AS _new,
                   o_orderkey
            FROM iv),
        islands AS (
            SELECT o_custkey, ivl_start, ivl_end,
                   SUM(_new) OVER (
                       PARTITION BY o_custkey
                       ORDER BY ivl_start, ivl_end, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS island
            FROM flagged)
        SELECT o_custkey,
               CAST(MIN(ivl_start) AS DATE) AS span_start,
               CAST(MAX(ivl_end) AS DATE) AS span_end,
               COUNT(*) AS n_orders
        FROM islands GROUP BY o_custkey, island
    """,
    "q_pareto_frontier": """
        WITH pts AS (
            SELECT DISTINCT p_retailprice AS price, p_size AS size
            FROM part)
        SELECT price, size FROM pts a
        WHERE NOT EXISTS (
            SELECT 1 FROM pts b
            WHERE b.price <= a.price AND b.size >= a.size
              AND (b.price < a.price OR b.size > a.size))
    """,
    "q_robust_stats": """
        WITH q AS (
            SELECT lang,
                   quantile_cont(n_chars, 0.5)  AS _med,
                   quantile_cont(n_chars, 0.25) AS _p25,
                   quantile_cont(n_chars, 0.75) AS _p75
            FROM documents GROUP BY lang)
        SELECT d.lang,
               ROUND(ANY_VALUE(q._med), 6) AS median_chars,
               ROUND(ANY_VALUE(q._p75) - ANY_VALUE(q._p25), 6)
                   AS iqr_chars,
               ROUND(quantile_cont(ABS(d.n_chars - q._med), 0.5), 6)
                   AS mad_chars
        FROM documents d JOIN q USING (lang)
        GROUP BY d.lang
    """,
    "q_semi_additive_balance": """
        WITH ranked AS (
            SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
                   user_id, value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('month', ts)
                       ORDER BY ts DESC, event_id DESC) AS _rn
            FROM events)
        SELECT month,
               COUNT(*) AS n_users_reporting,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS eom_balance
        FROM ranked WHERE _rn = 1
        GROUP BY month
    """,
    "q_incremental_agg_merge": """
        SELECT event_type,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_value
        FROM events
        GROUP BY event_type
    """,
}
