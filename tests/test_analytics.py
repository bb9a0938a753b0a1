"""Semantic pins for the analytics family (operators/analytics.py) on
hand-built fixtures — properties the oracle-parity harness checks only
implicitly (both twins could share the same misunderstanding; these tests
assert the INTENDED semantics from first principles)."""

from __future__ import annotations

import datetime as dt

import pytest


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, ts_minute)."""
    data = [
        (eid, dt.datetime(2024, 1, 1, 0, m), uid, et, 1.0, "{}")
        for (eid, uid, et, m) in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _funnel_counts(spark, rows, monkeypatch, tmp_path):
    """Run q_funnel's logic against a fixture by monkeypatching load_table."""
    import breweries_case_spark.operators.analytics as mod

    df = _events(spark, rows)
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: df)
    out = mod.q_funnel(spark, str(tmp_path))
    return {r.stage: r.users for r in out.collect()}


def test_funnel_is_order_sensitive(spark, monkeypatch, tmp_path):
    """A click BEFORE the user's first view does not advance the funnel —
    the property that distinguishes an ordered funnel from a mere
    per-type distinct count (which would report click=1 here)."""
    got = _funnel_counts(
        spark,
        [
            (1, 10, "click", 0),  # click precedes the view -> stage 2 not reached
            (2, 10, "view", 5),
        ],
        monkeypatch,
        tmp_path,
    )
    assert got == {"view": 1, "click": 0, "purchase": 0}


def test_funnel_same_timestamp_counts(spark, monkeypatch, tmp_path):
    """At-or-after semantics: a click at exactly the first-view timestamp
    reaches stage 2 (ts >= t_prev, not strictly after)."""
    got = _funnel_counts(
        spark,
        [
            (1, 10, "view", 3),
            (2, 10, "click", 3),
            (3, 10, "purchase", 4),
        ],
        monkeypatch,
        tmp_path,
    )
    assert got == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_stage_uses_earliest_prior_arrival(spark, monkeypatch, tmp_path):
    """Stage N anchors on the EARLIEST stage-N arrival after stage N-1:
    user views at t=1, clicks at t=2, purchases at t=3 — but a second,
    later view at t=9 must not invalidate the click at t=2."""
    got = _funnel_counts(
        spark,
        [
            (1, 10, "view", 1),
            (2, 10, "click", 2),
            (3, 10, "purchase", 3),
            (4, 10, "view", 9),
        ],
        monkeypatch,
        tmp_path,
    )
    assert got == {"view": 1, "click": 1, "purchase": 1}


def test_retention_offsets_are_whole_weeks(spark, monkeypatch, tmp_path):
    """A user first seen Wed Jan 3 and active again Tue Jan 9 lands in
    week_offset 1 (Monday-truncated weeks: Jan 1 vs Jan 8), even though
    the raw gap is under 7 days."""
    import breweries_case_spark.operators.analytics as mod

    data = [
        (1, dt.datetime(2024, 1, 3, 12), 10, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 9, 12), 10, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: df)
    out = {
        (r.cohort_week.isoformat(), r.week_offset): r.active_users
        for r in mod.q_retention_cohort(spark, str(tmp_path)).collect()
    }
    assert out == {("2024-01-01", 0): 1, ("2024-01-01", 1): 1}


def test_transitions_tie_break_on_event_id(spark, monkeypatch, tmp_path):
    """Two events at the SAME timestamp order by event_id, so the
    transition sequence is deterministic: view(1) -> click(2) -> error(3)."""
    import breweries_case_spark.operators.analytics as mod

    df = _events(
        spark,
        [(1, 10, "view", 5), (2, 10, "click", 5), (3, 10, "error", 5)],
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: df)
    got = {
        (r.src, r.dst): r.n_transitions
        for r in mod.q_event_transitions(spark, str(tmp_path)).collect()
    }
    assert got == {("view", "click"): 1, ("click", "error"): 1}


def test_lateral_decorrelates_to_group_limit(spark, sf_dir):
    """Plan regression guard: the correlated LATERAL top-N must
    decorrelate into a WindowGroupLimit-pruned rank join — NEVER a
    per-outer-row nested-loop (which would be O(customers × orders) at
    scale)."""
    from breweries_case_spark.operators.modern_sql import q_lateral_topn

    p = q_lateral_topn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_transitions_plan_single_sequence_exchange(spark, sf_dir):
    """Plan guard: the transition matrix needs exactly two exchanges —
    the user-keyed sequence window and the small (src, dst) rollup."""
    from breweries_case_spark.operators.analytics import q_event_transitions

    p = (
        q_event_transitions(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Exchange hashpartitioning") == 2, p


def test_stats_moments_match_numpy(spark, sf_dir):
    """The closed-form decimal-power-sum moments agree with numpy's
    two-pass reference to ~1e-6 on real data (rounding scale)."""
    import numpy as np

    from breweries_case_spark.io.reader import load_table
    from breweries_case_spark.operators.analytics import q_stats_moments

    got = {r.l_returnflag: r for r in q_stats_moments(spark, sf_dir).collect()}
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, g in li.groupby("l_returnflag"):
        x = g["l_quantity"].to_numpy()
        y = g["l_extendedprice"].to_numpy()
        r = got[flag]
        assert r.n == len(x)
        assert r.mean_q == pytest.approx(float(np.mean(x)), abs=2e-6)
        assert r.std_q == pytest.approx(float(np.std(x, ddof=1)), abs=2e-6)
        assert r.corr_qp == pytest.approx(
            float(np.corrcoef(x, y)[0, 1]), abs=2e-6
        )


def test_pagerank_is_a_probability_distribution(spark, sf_dir):
    """No dangling nodes in the event graph ⇒ ranks stay a distribution:
    positive, summing to 1 within the per-iteration quantization error."""
    from breweries_case_spark.operators.graph import q_pagerank

    rows = q_pagerank(spark, sf_dir).collect()
    assert all(r.rank > 0 for r in rows)
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-6


def test_training_mix_stages_narrow_monotonically(spark, sf_dir):
    """Every curation stage may only REMOVE documents, and every kept doc
    passes the quality gate."""
    import pyspark.sql.functions as F

    from breweries_case_spark.io.reader import load_table
    from breweries_case_spark.operators.training_mix import (
        MEAN_TOKEN_LEN_RANGE,
        MIN_TOKENS,
        q_training_mix,
    )

    out = q_training_mix(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    assert out.count() <= d.count()
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    mean_len = F.length(F.col("text")).cast("double") / n_tok
    lo, hi = MEAN_TOKEN_LEN_RANGE
    bad_kept = (
        out.join(d, "doc_id")
        .filter(~((n_tok >= MIN_TOKENS) & mean_len.between(lo, hi)))
        .count()
    )
    assert bad_kept == 0


def test_quantize_reconstruction_is_bounded(spark, sf_dir):
    """int8 quantization invariants: |q|≤127 ⇒ q_sum bounded by 127·dim,
    and per-element error ≤ scale/2 ⇒ err_sq ≤ dim·(scale/2)²."""
    from breweries_case_spark.operators.similarity import q_embed_quantize

    for r in q_embed_quantize(spark, sf_dir).collect():
        assert abs(r.q_sum) <= 127 * r.dim
        # scale_r is rounded to 6; pad the bound accordingly
        bound = r.dim * ((r.scale_r + 1e-6) / 2) ** 2
        assert r.err_sq <= bound + 1e-9, (r.vec_id, r.err_sq, bound)


def test_locf_fill_matches_actuals_and_carries_forward(spark, sf_dir):
    """filled == day_value wherever observed; after a user's first
    observation, filled is never NULL."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from breweries_case_spark.operators.analytics import q_locf_fill

    out = q_locf_fill(spark, sf_dir)
    assert (
        out.filter(
            F.col("day_value").isNotNull()
            & (F.col("filled") != F.col("day_value"))
        ).count()
        == 0
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seen = F.max(F.col("day_value").isNotNull().cast("int")).over(w)
    assert (
        out.withColumn("seen", seen)
        .filter((F.col("seen") == 1) & F.col("filled").isNull())
        .count()
        == 0
    )
