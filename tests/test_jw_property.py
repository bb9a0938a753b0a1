"""Property test: the Python Jaro–Winkler driving the entity-linkage
pandas UDF must be BIT-identical to DuckDB's ``jaro_winkler_similarity``
(which the oracle runs) on ARBITRARY strings — not just the curated
cases in test_round4_ops. Small alphabet maximizes match/transposition
collisions; mixed lengths exercise the match-window asymmetry."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from breweries_case_spark.operators.entity import jaro_winkler

_s = st.text(alphabet="abAB ", min_size=0, max_size=24)


@given(a=_s, b=_s)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_bitwise_equal_to_duckdb(a, b):
    con = duckdb.connect()
    try:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
    finally:
        con.close()
    assert jaro_winkler(a, b) == want, (a, b)
