"""Property-based tests (hypothesis) for the driver-side pure-Python
surfaces: REST pagination/retry and the minhash hash-family arithmetic.
Spark-side semantics are covered by the oracle-parity suite; these pin the
invariants that don't need a JVM."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from breweries_case_spark.io.rest_source import (
    RetryableHTTPError,
    fetch_paginated,
    with_retries,
)
from breweries_case_spark.operators.dedup import _HASH_AB, _MERSENNE_P


@given(
    total=st.integers(min_value=0, max_value=5000),
    per_page=st.integers(min_value=1, max_value=500),
)
@settings(max_examples=50, deadline=None)
def test_pagination_fetches_every_row_exactly_once(total, per_page):
    def fetcher(page, pp):
        start = (page - 1) * pp
        return list(range(start, min(start + pp, total)))

    max_pages = (total // per_page) + 2  # cap never binds
    got = fetch_paginated(fetcher, per_page=per_page, max_pages=max_pages)
    assert got == list(range(total))


@given(
    failures=st.integers(min_value=0, max_value=4),
    retry_after=st.one_of(
        st.none(), st.floats(min_value=0.1, max_value=60, allow_nan=False)
    ),
)
@settings(max_examples=50, deadline=None)
def test_retry_succeeds_iff_failures_within_budget(failures, retry_after):
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) <= failures:
            raise RetryableHTTPError(503, retry_after=retry_after)
        return ["ok"]

    out = with_retries(flaky, retries=4, sleep=lambda _s: None)
    assert out == ["ok"]
    assert len(calls) == failures + 1


@given(h=st.integers(min_value=0, max_value=_MERSENNE_P - 1))
@settings(max_examples=200, deadline=None)
def test_minhash_family_stays_in_range_and_injective_inputs_differ(h):
    """Each family member maps [0,P) → [0,P) without overflowing int64
    (the ANSI-mode safety argument in operators/dedup.py, checked in
    Python where the arithmetic is unbounded)."""
    for a, b in _HASH_AB:
        v = (a * h + b) % _MERSENNE_P
        assert 0 <= v < _MERSENNE_P
        assert a * h + b < 2**63  # never overflows Spark LongType


def test_minhash_family_members_distinct_and_invertible():
    """All 16 (a, b) pairs are distinct and every a is coprime with P
    (a odd, a < P, P prime ⇒ each member is a bijection on [0, P) — the
    permutation property minhashing requires)."""
    assert len(set(_HASH_AB)) == len(_HASH_AB) == 16
    for a, _b in _HASH_AB:
        assert 0 < a < _MERSENNE_P and a % 2 == 1


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=800), max_size=200),
    cap=st.integers(min_value=1, max_value=600),
)
@settings(max_examples=100, deadline=None)
def test_ffd_pack_invariants(sizes, cap):
    from collections import defaultdict

    from breweries_case_spark.operators.pandas_ops import ffd_pack

    # kernel contract: caller passes sizes pre-sorted descending
    sizes = sorted(sizes, reverse=True)
    bins = ffd_pack(sizes, cap)
    assert len(bins) == len(sizes)  # nothing dropped
    fills = defaultdict(list)
    for b, s in zip(bins, sizes):
        fills[b].append(s)
    assert sorted(fills) == list(range(len(fills)))  # dense ids
    for members in fills.values():
        # a bin only exceeds cap when one oversized item owns it alone
        if sum(members) > cap:
            assert len(members) == 1
    # first-fit property: an item never opens a new bin while an earlier
    # bin could still hold it (checked by replay)
    running = []
    for b, s in zip(bins, sizes):
        if b == len(running):
            assert all(f + s > cap for f in running)
            running.append(s)
        else:
            running[b] += s


# --- fixture invariants the engine's packed keys rely on ---------------------


def test_linenumber_fits_pair_key_packing():
    """q_join_interval_overlap / q_join_interval_sweep pack the pair
    identity as l_orderkey*8 + l_linenumber (relational.py), injective
    only while l_linenumber is in 1..7 (the TPC-H domain). The synthetic
    generator already deviates from TPC-H elsewhere — if it ever emits
    linenumber >= 8 the packing would silently alias distinct rows, so
    pin the domain at every shipped sf dir with a plain parquet scan."""
    import glob

    import duckdb

    for d in sorted(glob.glob("/root/testdata/sf*")):
        lo, hi = duckdb.sql(
            f"SELECT min(l_linenumber), max(l_linenumber) "
            f"FROM '{d}/lineitem.parquet'"
        ).fetchone()
        assert 1 <= lo and hi <= 7, (
            f"{d}: l_linenumber range [{lo}, {hi}] breaks the *8 packing"
        )
