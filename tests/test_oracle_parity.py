"""Local replica of the driver's DuckDB-oracle gate (SURVEY §5 engine test
plan): every query id with an oracle runs on Spark AND DuckDB at sf0.001;
row counts, column names, and order-insensitive value multisets must match
EXACTLY (floats included — determinism is engineered in, see
functions.numeric)."""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from breweries_case_spark.io.reader import TABLES

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=repr
    )


def _duck_rows(sql, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    idx = sorted(range(len(names)), key=lambda i: names[i])
    rows = cur.fetchall()
    con.close()
    return sorted(names), sorted(
        (tuple(_norm(row[i]) for i in idx) for row in rows), key=repr
    )


@pytest.mark.parametrize("qid", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, qid):
    df = QUERIES[qid](spark, sf_dir)
    s_cols, s_rows = _spark_rows(df)
    d_cols, d_rows = _duck_rows(ORACLES[qid], sf_dir)
    assert s_cols == d_cols, f"{qid}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{qid}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{qid}: first diffs {mismatches[:3]}"


#: ids whose plans deliberately contain a nested-loop join: 1-row scalar
#: crossJoins (corpus/total constants, PageRank's n_nodes, TPC-H scalar
#: subqueries) and the naive inequality-join ground-truth tier. Anything
#: OUTSIDE this set growing a CartesianProduct/BNLJ is an accidental
#: O(n²) plan — the regression this sweep exists to catch.
NESTED_LOOP_OK = {
    "q_tfidf",
    "q_tpch_q11",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q22",
    "q_pagerank",
    "q_join_range",
    "q_join_range_binned",
    "q_locf_fill",  # deliberate dense-grid crossJoin of two dimensions
    # deliberate broadcast-NL pairing against the eval-suite-sized
    # benchmark side — corpus-linear with a constant inner side
    "q_decontaminate_semantic",
    "q_join_skew_split",  # 1-row mean-load scalar crossJoin
    "q_text_bm25",  # 1-row (N, avgdl) scalar crossJoin
    "q_skew_profile",  # 1-row (n_keys, total) scalar crossJoin
    "q_hybrid_search",  # BM25's scalars + a 1-row max-bm25 crossJoin
    # deliberate |customers| × SCD2_PROBE_POINTS(6) probe grid — the
    # broadcast side is a handful of dates, output-sized by definition
    "q_scd2_lookup",
    "q_profile_drift",  # 1-row × 1-row scalar crossJoin of two profiles
}


def test_all_queries_run(spark, sf_dir):
    """Every registered query (oracle or not) executes, has a schema, and
    plans without an ACCIDENTAL quadratic join (cartesian / nested-loop
    outside the documented scalar-broadcast and ground-truth set)."""
    for qid, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, qid
        plan = df._jdf.queryExecution().executedPlan().toString()
        if qid not in NESTED_LOOP_OK:
            assert "CartesianProduct" not in plan, qid
            assert "BroadcastNestedLoopJoin" not in plan, qid
        assert df.count() >= 0, qid


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
