"""Semantic pins for the round-4 additions (entity resolution, geo grid
join, span-level duplication, interval merge, Pareto frontier, robust
stats, weighted/split sampling, semi-additive rollup) — first-principles
properties the Spark/DuckDB twins could get wrong TOGETHER, which the
oracle-parity harness therefore cannot catch."""

from __future__ import annotations

import datetime as dt
import hashlib

import duckdb
import pytest

from breweries_case_spark.operators.entity import jaro_winkler


# ---------------------------------------------------------------- entity

def test_jaro_winkler_matches_duckdb_bitwise():
    """The Python JW used in the pandas UDF must be BIT-identical to
    DuckDB's (the oracle runs DuckDB's) — adversarial cases: prefix
    boost on/off, transpositions, case sensitivity, empty, disjoint."""
    cases = [
        ("martha", "marhta"),
        ("dwayne", "duane"),
        ("dixon", "dicksonx"),
        ("abc", "abc"),
        ("", "abc"),
        ("", ""),
        ("a", "b"),
        ("CRAZY", "crazy"),
        ("jellyfish", "smellyfish"),
        ("hello world", "world hello"),
        ("aabbccddeeff0011", "aabbccddeeff001"),
    ]
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == want, (a, b)
    con.close()


def test_join_jaro_links_are_exactly_the_blocked_true_pairs(spark, sf_dir):
    """On the clean-vs-one-char-dropped fixture the output must be
    PRECISE (every link is a true clean/dirty pairing — no impostors at
    threshold 0.9 on 20-char hex) and COMPLETE: dual prefix∪suffix
    blocking means a one-char drop cannot escape both blocks
    (pigeonhole), and a one-char drop always passes the lev ≤ 2 gate —
    so EVERY true pair with jw ≥ 0.9 must appear. The test derives the
    expected set from the block rule from first principles."""
    from breweries_case_spark.operators.entity import (
        BLOCK_PREFIX,
        DIRTY_OFFSET,
        _clean_records,
        _dirty_records,
        q_join_jaro,
    )

    got = {
        (r.clean_id, r.dirty_id)
        for r in q_join_jaro(spark, sf_dir).collect()
    }
    assert all(c == d - DIRTY_OFFSET for c, d in got)

    clean = {
        r.clean_id: r.addr for r in _clean_records(spark, sf_dir).collect()
    }
    dirty = {
        r.dirty_id: r.addr for r in _dirty_records(spark, sf_dir).collect()
    }
    expected = {
        (k, k + DIRTY_OFFSET)
        for k, addr in clean.items()
        if (
            addr[:BLOCK_PREFIX]
            == dirty[k + DIRTY_OFFSET][:BLOCK_PREFIX]
            or addr[-BLOCK_PREFIX:] == dirty[k + DIRTY_OFFSET][-BLOCK_PREFIX:]
        )
        and jaro_winkler(addr, dirty[k + DIRTY_OFFSET]) >= 0.9
    }
    assert got == expected
    # pigeonhole: dual blocking recovers EVERY true pair above threshold
    assert expected == {
        (k, k + DIRTY_OFFSET)
        for k, addr in clean.items()
        if jaro_winkler(addr, dirty[k + DIRTY_OFFSET]) >= 0.9
    }
    assert len(got) > 0


def test_entity_resolution_clusters_partition_all_records(spark, sf_dir):
    """Cluster sizes must account for EVERY record (matched pairs
    collapse, unmatched stay singletons) and side counts must add up."""
    from breweries_case_spark.operators.entity import (
        _clean_records,
        q_entity_resolution,
    )

    rows = q_entity_resolution(spark, sf_dir).collect()
    n_customers = _clean_records(spark, sf_dir).count()
    assert sum(r.n_members for r in rows) == 2 * n_customers
    assert all(r.n_members == r.n_clean + r.n_dirty for r in rows)
    # on this fixture there are no impostor links: clusters are either
    # singletons or one clean + one dirty
    assert all(
        (r.n_members, r.n_clean, r.n_dirty) in {(1, 1, 0), (1, 0, 1), (2, 1, 1)}
        for r in rows
    )
    assert any(r.n_members == 2 for r in rows)


def test_blocking_width_is_a_config_dial(spark, sf_dir):
    """Widening block_prefix (the corpus-size dial, p ≈ log16(2n²/C))
    must shrink the candidate set it feeds the verifier WITHOUT changing
    the links found: pigeonhole recall holds at any p ≤ len/2, and every
    one-drop pair at this corpus clears jw ≥ 0.9 identically."""
    from breweries_case_spark.operators.entity import _jw_pairs

    p2 = {
        (r.clean_id, r.dirty_id) for r in _jw_pairs(spark, sf_dir).collect()
    }
    p3 = {
        (r.clean_id, r.dirty_id)
        for r in _jw_pairs(spark, sf_dir, block_prefix=3).collect()
    }
    # the dial may only shed impostor candidates, never true links —
    # on this fixture there are no impostors, so the sets are equal up
    # to pairs whose block agreement depends on p (a drop inside char 3
    # breaks the p=3 prefix but not the p=2 one... and vice versa never)
    assert p3 <= p2
    assert len(p3) >= len(p2) * 0.9  # p=3 loses at most the char-3 drops
    # non-vacuity: the parameter must actually reach the block keys —
    # dual recall can make p3 == p2 legitimately, so pin the PLAN
    # (a regression once made blocked() close over the module constant,
    # silently ignoring the dial)
    plan = (
        _jw_pairs(spark, sf_dir, block_prefix=3)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    import re

    assert re.search(r"substring\(addr#\d+, 1, 3\)", plan), plan[:500]
    assert re.search(r"substring\(addr#\d+, -3, 3\)", plan), plan[:500]


# ------------------------------------------------------------------- geo

def test_geo_grid_join_equals_brute_force(spark, sf_dir):
    """The 3x3-neighborhood grid join must emit EXACTLY the brute-force
    within-radius pair set — the coverage proof of the blocking."""
    from breweries_case_spark.operators.geo import (
        GEO_RADIUS_DEG,
        _located_customers,
        q_geo_join_radius,
    )

    pts = {
        r.key: (r.lat, r.lon)
        for r in _located_customers(spark, sf_dir).collect()
    }
    r2 = GEO_RADIUS_DEG * GEO_RADIUS_DEG
    keys = sorted(pts)
    want = {
        (a, b)
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
        if (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2 <= r2
    }
    got = {
        (r.key_a, r.key_b) for r in q_geo_join_radius(spark, sf_dir).collect()
    }
    assert got == want


# ----------------------------------------------------------- dup spans

def _docs(spark, rows):
    """rows: (doc_id, text)."""
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_dup_span_fraction_flags_cross_doc_spans_only(
    spark, monkeypatch, tmp_path
):
    """A span shared ACROSS docs is duplicated; a span repeated only
    WITHIN one doc is not; docs shorter than the span width drop out."""
    import breweries_case_spark.operators.text as mod

    shared = "a b c d e f g h"  # exactly 8 tokens
    fix = _docs(
        spark,
        [
            (1, shared + " x y z"),
            (2, "p q r s " + shared),
            (3, "one two three four five six seven eight nine"),
            (4, "too short"),
            # internal repetition only: an 8-gram (disjoint from
            # `shared`) occurring twice in ONE doc
            (5, "q w e r t y u i q w e r t y u i"),
        ],
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: fix)
    out = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in mod.q_dup_span_fraction(spark, str(tmp_path)).collect()
    }
    assert 4 not in out  # < 8 tokens -> no spans
    assert out[1][1] >= 1 and out[2][1] >= 1  # shared span flagged
    assert out[3][1] == 0  # unique doc clean
    # doc 5's grams exist only inside doc 5: distinct-doc count is 1,
    # so nothing is flagged (cross-doc semantics, not repetition)
    assert out[5][1] == 0


# ------------------------------------------------------------ analytics

def _orders(spark, rows):
    """rows: (o_orderkey, o_custkey, o_orderdate)."""
    return spark.createDataFrame(
        [
            (k, c, "F", 1.0, dt.datetime(*d), "1-URGENT")
            for (k, c, d) in rows
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def test_merge_intervals_merges_overlap_and_touch_not_gap(
    spark, monkeypatch, tmp_path
):
    import breweries_case_spark.operators.analytics as mod

    fix = _orders(
        spark,
        [
            (1, 7, (2024, 1, 1)),   # [Jan 1, Jan 31]
            (2, 7, (2024, 1, 20)),  # overlaps -> same span
            (3, 7, (2024, 3, 1)),   # [Mar 1, Mar 31] gap -> new span
            (4, 7, (2024, 3, 31)),  # touches Mar 31 end -> merges
            (5, 8, (2024, 1, 1)),   # other customer independent
        ],
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: fix)
    out = sorted(
        (r.o_custkey, str(r.span_start), str(r.span_end), r.n_orders)
        for r in mod.q_merge_intervals(spark, str(tmp_path)).collect()
    )
    assert out == [
        (7, "2024-01-01", "2024-02-19", 2),
        (7, "2024-03-01", "2024-04-30", 2),
        (8, "2024-01-01", "2024-01-31", 1),
    ]


def _parts(spark, rows):
    """rows: (p_partkey, p_retailprice, p_size)."""
    return spark.createDataFrame(
        [(k, f"part {k}", "Brand#1", "TYPE", s, p) for (k, p, s) in rows],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size long, p_retailprice double",
    )


def test_pareto_frontier_dominance_and_price_ties(
    spark, monkeypatch, tmp_path
):
    import breweries_case_spark.operators.analytics as mod

    fix = _parts(
        spark,
        [
            (1, 10.0, 5),   # frontier (cheapest)
            (2, 10.0, 3),   # same price, smaller -> dominated
            (3, 20.0, 5),   # equal size but pricier -> dominated
            (4, 20.0, 9),   # frontier (bigger than all cheaper)
            (5, 30.0, 9),   # equal size, pricier -> dominated
            (6, 30.0, 12),  # frontier
        ],
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: fix)
    got = sorted(
        (r.price, r.size)
        for r in mod.q_pareto_frontier(spark, str(tmp_path)).collect()
    )
    assert got == [(10.0, 5), (20.0, 9), (30.0, 12)]


def test_robust_stats_known_values(spark, monkeypatch, tmp_path):
    """n_chars {1,2,3,4,100}: median 3, IQR p75-p25 = 4-2 = 2, absolute
    deviations {2,1,0,1,97} -> MAD 1 — the outlier barely moves MAD
    while it would wreck a stddev."""
    import breweries_case_spark.operators.analytics as mod

    fix = _docs(
        spark, [(i, "x") for i in range(5)]
    ).drop("n_chars").join(
        spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4), (4, 100)],
            "doc_id long, n_chars long",
        ),
        "doc_id",
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: fix)
    rows = mod.q_robust_stats(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.median_chars, r.iqr_chars, r.mad_chars) == (3.0, 2.0, 1.0)


def test_semi_additive_takes_last_reading_per_user_month(
    spark, monkeypatch, tmp_path
):
    import breweries_case_spark.operators.analytics as mod

    data = [
        # user 1: two January readings -> only the later (30.0) counts
        (1, dt.datetime(2024, 1, 5), 10, "view", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 25), 10, "view", 30.0, "{}"),
        # user 2: one January reading
        (3, dt.datetime(2024, 1, 10), 20, "view", 5.0, "{}"),
        # user 1 again in February: separate period
        (4, dt.datetime(2024, 2, 1), 10, "view", 99.0, "{}"),
    ]
    fix = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: fix)
    out = {
        str(r.month): (r.n_users_reporting, r.eom_balance)
        for r in mod.q_semi_additive_balance(spark, str(tmp_path)).collect()
    }
    assert out == {"2024-01-01": (2, 35.0), "2024-02-01": (1, 99.0)}


# ------------------------------------------------------------ pruning

#: ids whose plans must NOT read documents.text — they project only
#: metadata columns, and at 100 TB dragging the wide text column through
#: the scan is the difference between a metadata query and a full-corpus
#: read. (q_sample_weighted keys on n_chars, q_split on doc_id.)
TEXT_FREE_IDS = [
    "q_sample_weighted",
    "q_split_train_val_test",
    "q_robust_stats",
]


def test_document_metadata_queries_prune_text_column(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for qid in TEXT_FREE_IDS:
        df = qs[qid](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        scans = [
            ln
            for ln in plan.splitlines()
            if "ReadSchema" in ln and "documents" in ln
        ]
        assert scans, f"{qid}: no documents scan found\n{plan}"
        for ln in scans:
            assert "text" not in ln.split("ReadSchema")[1], (
                f"{qid} reads documents.text: {ln}"
            )


# ------------------------------------------------------------- sampling

def test_weighted_sample_is_deterministic_and_formula_exact(spark, sf_dir):
    from breweries_case_spark.operators.sampling import (
        WEIGHTED_SAMPLE_K,
        q_sample_weighted,
    )

    a = q_sample_weighted(spark, sf_dir).collect()
    b = q_sample_weighted(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == min(
        WEIGHTED_SAMPLE_K,
        spark.read.parquet(f"{sf_dir}/documents.parquet").count(),
    )
    r = a[0]
    h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:12], 16)
    assert r.priority == r.n_chars / ((h + 1) / 2.0**48)


def test_split_is_total_and_consistent(spark, sf_dir):
    from breweries_case_spark.operators.sampling import (
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        q_split_train_val_test,
    )

    rows = q_split_train_val_test(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r.bucket < 100
        want = (
            "train"
            if r.bucket < SPLIT_TRAIN_LT
            else "val" if r.bucket < SPLIT_VAL_LT else "test"
        )
        assert r.split == want
    counts = {s: 0 for s in ("train", "val", "test")}
    for r in rows:
        counts[r.split] += 1
    assert counts["train"] > counts["val"] + counts["test"]
