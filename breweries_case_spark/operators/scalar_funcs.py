"""SURVEY §2.7 scalar-function breadth — string / datetime / math /
array / higher-order lambda / range-frame window / PII masking, each as
an oracle-backed query over the star-schema tables.

The reference's scalar surface is twelve ``get_json_object`` paths plus
trim/lower (``src/processors/breweries_silver_processors.py:22-48``); an
engine replacing it needs the full warehouse function catalog. Each query
here exercises one §2.7 family end-to-end through the DuckDB oracle, with
cross-engine semantics pinned:

- every function pair used has IDENTICAL semantics in Spark and DuckDB
  (1-based substring/instr, HALF-AWAY rounding of positive doubles,
  ISO weekofyear); where the engines' builtins disagree in signature the
  oracle spells the DuckDB twin (``strpos``/``split_part``/``list_*``,
  ``regexp_replace .. 'g'``).
- transcendental outputs (ln/pow) are rounded to 6 decimals before
  hashing — libm vs JVM intrinsics may differ in the last ulp, and the
  round collapses that while still pinning ~all of the mantissa.
- float folds over ``array<float>`` cast each element to double INSIDE
  the lambda so both engines accumulate in double from the first add
  (same device as operators/similarity.py::_dot).

All plans are scan → narrow projection (or one window) — no shuffle, no
Python: every expression compiles into whole-stage codegen, which is the
point of preferring builtins over UDFs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from breweries_case_spark.io.reader import load_table


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family over part: case, slice, search, pad,
    reverse, replace, translate, split — one narrow codegen'd projection."""
    p = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.upper(name).alias("name_upper"),
        F.length(name).alias("name_len"),
        F.substring(name, 1, 4).alias("name_head"),
        F.concat_ws("-", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.reverse(name).alias("name_rev"),
        F.replace(name, F.lit(" "), F.lit("_")).alias("name_snake"),
        F.instr(name, "e").alias("first_e"),
        F.translate(name, "aeiou", "AEIOU").alias("name_vowels_up"),
        F.element_at(F.split(name, " "), 1).alias("first_word"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
    )


def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-function family over orders: component extraction
    (ISO week, 0=Sunday day-of-week — Spark's 1-based dayofweek shifted
    to DuckDB's convention), boundary snapping (last_day, month trunc),
    and day arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        (F.dayofweek(d) - 1).alias("dow0"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("iso_week"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
    )


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function family over a keyed lineitem slice: abs/sign,
    floor/ceil, 2-decimal rounding, exact sqrt, rounded ln/pow,
    greatest/least, positive modulo."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    price = F.col("l_extendedprice")
    qty = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - F.lit(1000.0)).alias("abs_delta"),
        F.signum(price - F.lit(1000.0)).alias("sign_delta"),
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.round(price, 2).alias("price_round2"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price + 1.0), 6).alias("price_ln"),
        F.round(F.pow(qty, F.lit(1.5)), 6).alias("qty_pow"),
        F.greatest(qty, F.lit(25.0)).alias("qty_floor25"),
        F.least(qty, F.lit(25.0)).alias("qty_cap25"),
        F.pmod(F.col("l_partkey"), F.lit(7)).alias("part_mod7"),
    )


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family over split p_name: size, sort+join (the
    hashable scalarization of an array result — the q_collect_set
    lesson), membership, indexing, distinct count."""
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_join(F.array_sort(words), ",").alias("words_sorted"),
        F.array_contains(words, "red").alias("has_red"),
        F.element_at(words, 1).alias("w1"),
        F.element_at(words, -1).alias("w_last"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
    )


def q_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda family over embeddings (array<float>):
    filter-count, transform+fold (sum of squares), per-element scaling
    summarized as a scalar. Elements cast to double INSIDE the lambda so
    both engines run the identical double fold left-to-right; results
    rounded to 6 to absorb last-ulp libm drift. No shuffle — pure
    per-row codegen'd array work, the built-in path that replaces a
    Python UDF at scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sumsq = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x * x
    )
    possum = F.aggregate(
        F.filter(v, lambda x: x > 0), F.lit(0.0), lambda acc, x: acc + x
    )
    return emb.select(
        "vec_id",
        F.size(F.col("embedding")).alias("dim"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(sumsq, 6).alias("sum_sq"),
        F.round(possum, 6).alias("pos_sum"),
    )


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window over events: per-user trailing-1-hour event
    count and value sum, anchored on epoch seconds so Spark's
    ``rangeBetween`` and DuckDB's ``RANGE BETWEEN 3600 PRECEDING`` agree
    exactly (RANGE mode includes same-second peers in both). One shuffle
    on user_id — the partition key — then sorted frames; at scale this is
    the standard sliding-metric shape and the state is bounded by the
    hour, not history.

    The epoch-second floor uses FLOOR over double division on BOTH
    engines (not Spark's ``div``, which truncates toward zero and would
    diverge from DuckDB's FLOOR for pre-1970 timestamps / negative epoch
    micros). Double division is exact enough here: for |micros| < 2^53
    the quotient's distance to the nearest non-equal integer (>= 1e-6)
    exceeds one ulp, so FLOOR agrees with exact rational floor through
    year ~2100."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.expr("CAST(FLOOR(unix_micros(ts) / 1000000) AS BIGINT)")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("sec"))
        .rangeBetween(-3600, 0)
    )
    return (
        ev.select("event_id", "user_id", sec.alias("sec"), "value")
        .select(
            "event_id",
            "user_id",
            "sec",
            F.count("*").over(w).alias("events_1h"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .over(w)
            .cast("double")
            .alias("value_1h"),
        )
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking over customer — the redaction pass a training-data
    pipeline runs before text lands in a corpus: digit masking, synthetic
    email construction + pattern redaction, and two keyed fingerprints
    (md5 / sha256) that let downstream joins match records without
    carrying the cleartext. Narrow projection, no shuffle; the regexes
    are RE2-compatible so they behave identically in both engines."""
    c = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    email = F.concat(F.lower(F.regexp_replace(name, "[^A-Za-z0-9]", ".")), F.lit("@example.com"))
    return c.select(
        "c_custkey",
        F.regexp_replace(name, "[0-9]", "#").alias("name_masked"),
        F.regexp_replace(
            F.concat(F.lit("contact: "), email),
            "[A-Za-z0-9.]+@[A-Za-z0-9.]+",
            "<EMAIL>",
        ).alias("text_redacted"),
        F.md5(name).alias("name_md5"),
        F.sha2(name, 256).alias("name_sha256"),
    )


def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family over part keys: and/or/xor, shifts, popcount,
    complement — the primitives the engine's own SimHash/bucketing code
    leans on, surfaced as a checked query family. Integer ops are exact
    on both engines; only the SPELLINGS differ (Spark ``^`` is DuckDB
    ``xor()``; Spark 4 uses ``shiftleft``/``shiftright`` functions).
    Narrow projection, no shuffle."""
    p = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        "p_partkey",
        k.bitwiseAND(F.lit(255)).alias("and_255"),
        k.bitwiseOR(F.lit(4096)).alias("or_4096"),
        k.bitwiseXOR(F.lit(0x5A5A)).alias("xor_5a5a"),
        F.shiftleft(k, 3).alias("shl_3"),
        F.shiftright(k, 2).alias("shr_2"),
        F.bit_count(k).alias("popcount"),
        F.bitwise_not(k).alias("complement"),
    )


# (Round-2 DEFERRED tags removed in round 3: the unproven id count fits
# the driver's 50-slot window, so deferral would only delay checking.)

QUERIES = {
    "q_string_funcs": q_string_funcs,
    "q_datetime_funcs": q_datetime_funcs,
    "q_math_funcs": q_math_funcs,
    "q_array_funcs": q_array_funcs,
    "q_higher_order": q_higher_order,
    "q_window_range_frame": q_window_range_frame,
    "q_pii_redact": q_pii_redact,
    "q_bitwise_funcs": q_bitwise_funcs,
}

ORACLES = {
    "q_bitwise_funcs": """
        SELECT p_partkey,
               p_partkey & 255 AS and_255,
               p_partkey | 4096 AS or_4096,
               xor(p_partkey, 23130) AS xor_5a5a,
               p_partkey << 3 AS shl_3,
               p_partkey >> 2 AS shr_2,
               CAST(bit_count(p_partkey) AS INT) AS popcount,
               ~p_partkey AS complement
        FROM part
    """,
    "q_string_funcs": """
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               CAST(LENGTH(p_name) AS INT) AS name_len,
               SUBSTRING(p_name, 1, 4) AS name_head,
               CONCAT_WS('-', p_brand, p_type) AS brand_type,
               LPAD(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
               REVERSE(p_name) AS name_rev,
               REPLACE(p_name, ' ', '_') AS name_snake,
               CAST(STRPOS(p_name, 'e') AS INT) AS first_e,
               TRANSLATE(p_name, 'aeiou', 'AEIOU') AS name_vowels_up,
               SPLIT_PART(p_name, ' ', 1) AS first_word,
               REPEAT(p_brand, 2) AS brand_twice
        FROM part
    """,
    "q_datetime_funcs": """
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS INT) AS y,
               CAST(MONTH(o_orderdate) AS INT) AS m,
               CAST(DAY(o_orderdate) AS INT) AS dom,
               CAST(DAYOFWEEK(o_orderdate) AS INT) AS dow0,
               CAST(DAYOFYEAR(o_orderdate) AS INT) AS doy,
               CAST(WEEKOFYEAR(o_orderdate) AS INT) AS iso_week,
               LAST_DAY(o_orderdate) AS month_end,
               DATE_TRUNC('month', o_orderdate) AS month_start,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)
                   AS due_date
        FROM orders
    """,
    "q_math_funcs": """
        SELECT l_orderkey, l_linenumber,
               ABS(l_extendedprice - 1000.0) AS abs_delta,
               CAST(SIGN(l_extendedprice - 1000.0) AS DOUBLE) AS sign_delta,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
               CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
               ROUND(l_extendedprice, 2) AS price_round2,
               ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
               ROUND(LN(l_extendedprice + 1.0), 6) AS price_ln,
               ROUND(POW(l_quantity, 1.5), 6) AS qty_pow,
               GREATEST(l_quantity, 25.0) AS qty_floor25,
               LEAST(l_quantity, 25.0) AS qty_cap25,
               CAST(l_partkey % 7 AS BIGINT) AS part_mod7
        FROM lineitem
        WHERE l_orderkey <= 500
    """,
    "q_array_funcs": """
        SELECT p_partkey,
               CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INT) AS n_words,
               ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(p_name, ' ')), ',')
                   AS words_sorted,
               LIST_CONTAINS(STRING_SPLIT(p_name, ' '), 'red') AS has_red,
               STRING_SPLIT(p_name, ' ')[1] AS w1,
               STRING_SPLIT(p_name, ' ')[-1] AS w_last,
               CAST(LEN(LIST_DISTINCT(STRING_SPLIT(p_name, ' '))) AS INT)
                   AS n_distinct_words
        FROM part
    """,
    "q_higher_order": """
        SELECT vec_id,
               CAST(LEN(embedding) AS INT) AS dim,
               CAST(LEN(LIST_FILTER(
                   LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)),
                   x -> x > 0)) AS INT) AS n_pos,
               ROUND(LIST_REDUCE(
                   LIST_PREPEND(0.0, LIST_TRANSFORM(embedding,
                       x -> CAST(x AS DOUBLE))),
                   (acc, x) -> acc + x * x), 6) AS sum_sq,
               ROUND(LIST_REDUCE(
                   LIST_PREPEND(0.0, LIST_FILTER(
                       LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)),
                       x -> x > 0)),
                   (acc, x) -> acc + x), 6) AS pos_sum
        FROM embeddings
    """,
    "q_window_range_frame": """
        SELECT event_id, user_id,
               CAST(FLOOR(EPOCH_US(ts) / 1000000) AS BIGINT) AS sec,
               COUNT(*) OVER w AS events_1h,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                   AS value_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(FLOOR(EPOCH_US(ts) / 1000000) AS BIGINT)
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    "q_pii_redact": """
        SELECT c_custkey,
               REGEXP_REPLACE(c_name, '[0-9]', '#', 'g') AS name_masked,
               REGEXP_REPLACE(
                   CONCAT('contact: ',
                          LOWER(REGEXP_REPLACE(c_name, '[^A-Za-z0-9]', '.', 'g')),
                          '@example.com'),
                   '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g')
                   AS text_redacted,
               MD5(c_name) AS name_md5,
               SHA256(c_name) AS name_sha256
        FROM customer
    """,
}
