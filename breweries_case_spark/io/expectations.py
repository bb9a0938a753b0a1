"""Declarative data-quality expectations evaluated in ONE aggregate pass —
the engine's generalization of the reference's hand-rolled silver quality
gate (``src/processors/breweries_silver_processors.py:65-67`` drops
null/empty ids; ``tests/integration/test_performance.py:86-116`` pins the
intent). Instead of one filter per rule, every expectation compiles to a
conditional-count column in a single ``agg`` — at 100 TB the whole
check suite costs one scan with map-side partials, not one job per rule
(the dbt-test-per-query anti-pattern).

Each expectation is (name, violation_predicate Column). ``evaluate``
returns the long-form (check, n_violations, passed) table;
``enforce`` raises with the failing summary — the CI/pipeline gate."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_not_null(col: str) -> tuple[str, Column]:
    return (f"{col}_not_null", F.col(col).isNull())


def expect_non_empty(col: str) -> tuple[str, Column]:
    """The reference's TESTED id semantics: NULL or '' both violate."""
    return (
        f"{col}_non_empty",
        F.col(col).isNull() | (F.trim(F.col(col)) == ""),
    )


def expect_in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    return (f"{col}_in_range", ~F.col(col).between(lo, hi))


def expect_unique(col: str) -> tuple[str, Column]:
    """Uniqueness needs visibility across rows — compiled as a window-free
    count-distinct delta at evaluate() time, flagged by sentinel."""
    return (f"{col}_unique", F.lit(None))  # sentinel; handled in evaluate


def expect_in_set(col: str, allowed: list) -> tuple[str, Column]:
    return (f"{col}_in_set", ~F.col(col).isin(allowed))


def evaluate(df: DataFrame, expectations: list) -> DataFrame:
    """One aggregate pass over ``df``: per-row predicates become
    conditional counts; uniqueness checks become ``count − countDistinct``
    (0 ⇔ unique) in the SAME pass. Output: (check, n_violations,
    passed) — long form via stack, touching no data after the agg."""
    aggs = []
    names = []
    for name, pred in expectations:
        names.append(name)
        if name.endswith("_unique"):
            col = name[: -len("_unique")]
            aggs.append(
                (F.count(F.col(col)) - F.countDistinct(F.col(col)))
                .cast("long")
                .alias(name)
            )
        else:
            aggs.append(F.sum(pred.cast("long")).cast("long").alias(name))
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) AS (check, n_violations)"
    ).select(
        "check",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def evaluate_foreign_key(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Referential-integrity check as the same (check, n_violations,
    passed) frame: child keys with no parent, counted via a left-anti
    join (one shuffle — or broadcast when the parent key set is
    dim-sized, AQE's call). NULL child keys are NOT violations here
    (SQL FK semantics); pair with expect_not_null to forbid them.
    Union the result with evaluate()'s for a single report."""
    viol = (
        child.filter(F.col(child_col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias("__pk")).distinct(),
            F.col(child_col) == F.col("__pk"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    )
    return viol.select(
        F.lit(f"{child_col}_references_{parent_col}").alias("check"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def enforce(df: DataFrame, expectations: list) -> None:
    """Raise ValueError naming every failed check (the pipeline gate)."""
    failed = [
        (r.check, r.n_violations)
        for r in evaluate(df, expectations).filter(~F.col("passed")).collect()
    ]
    if failed:
        raise ValueError(f"data-quality expectations failed: {failed}")


def q_quality_expectations(spark, sf_dir: str) -> DataFrame:
    """The expectation suite over customer as a registered query: key
    uniqueness + non-null, name non-empty, balance range, market-segment
    domain — evaluated in one aggregate pass."""
    from breweries_case_spark.io.reader import load_table

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    single_pass = evaluate(
        c,
        [
            expect_unique("c_custkey"),
            expect_not_null("c_custkey"),
            expect_non_empty("c_name"),
            expect_in_range("c_acctbal", -1000.0, 10000.0),
            expect_in_set("c_mktsegment", segs),
        ],
    )
    fk = evaluate_foreign_key(c, "c_nationkey", n, "n_nationkey")
    return single_pass.unionByName(fk)


QUERIES = {
    "q_quality_expectations": q_quality_expectations,
}

ORACLES = {
    "q_quality_expectations": """
        WITH wide AS (
            SELECT
                CAST(COUNT(c_custkey) - COUNT(DISTINCT c_custkey) AS BIGINT)
                    AS u,
                CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS nn,
                CAST(SUM(CASE WHEN c_name IS NULL OR TRIM(c_name) = ''
                         THEN 1 ELSE 0 END) AS BIGINT) AS ne,
                CAST(SUM(CASE WHEN NOT (c_acctbal BETWEEN -1000.0 AND 10000.0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS rng,
                CAST(SUM(CASE WHEN c_mktsegment NOT IN
                         ('AUTOMOBILE','BUILDING','FURNITURE',
                          'HOUSEHOLD','MACHINERY')
                         THEN 1 ELSE 0 END) AS BIGINT) AS st
            FROM customer)
        SELECT t.check, t.n_violations, t.n_violations = 0 AS passed
        FROM wide, LATERAL (
            SELECT 'c_custkey_unique' AS check, u AS n_violations
            UNION ALL SELECT 'c_custkey_not_null', nn
            UNION ALL SELECT 'c_name_non_empty', ne
            UNION ALL SELECT 'c_acctbal_in_range', rng
            UNION ALL SELECT 'c_mktsegment_in_set', st) t
        UNION ALL
        SELECT 'c_nationkey_references_n_nationkey',
               fk.v, fk.v = 0
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS v
              FROM customer c
              WHERE c.c_nationkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = c.c_nationkey)) fk
    """,
}
