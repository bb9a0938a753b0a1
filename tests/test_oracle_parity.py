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


def _duck_frame(sql, sf_dir):
    """The DRIVER's oracle path: DuckDB → pandas via ``.df()``. Unlike
    ``fetchall()`` (Python ints — HUGEINT compares equal to Spark's
    Decimal/long), this bridge coerces HUGEINT/DECIMAL to float64 and
    materializes LIST cells as numpy arrays — exactly the representation
    the driver canonicalizes. Every r4/r5 driver red was invisible to the
    fetchall gate and would have been caught here."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    pdf = con.execute(sql).df()
    con.close()
    return pdf


#: Spark types whose pandas image is an exact integer column — the oracle
#: side must deliver the same column as an integer dtype, or the driver's
#: canonical strings diverge (5 vs 5.0) / lose precision past 2^53.
_INTEGRAL_SPARK = ("ByteType", "ShortType", "IntegerType", "LongType")

#: Constructing a registered query is EAGER for the streaming replays,
#: the certificates (IVF Lloyd training), and the snapshot/catalog
#: bootstraps — and both parametrized tests below need the same frame,
#: so construction is cached per (qid, sf_dir). Returned frames are
#: memory-sink/localCheckpoint-backed or lazy plans; re-collecting them
#: is safe and cheap.
_DF_CACHE: dict = {}


def _spark_df(qid, spark, sf_dir):
    key = (qid, sf_dir)
    if key not in _DF_CACHE:
        _DF_CACHE[key] = QUERIES[qid](spark, sf_dir)
    return _DF_CACHE[key]


@pytest.mark.parametrize("qid", sorted(ORACLES))
def test_driver_pandas_canon(spark, sf_dir, qid):
    """Representation contract for the driver's pandas-based compare
    (VERDICT r5 'What's wrong' #5). Three asymmetric-coercion classes are
    banned from oracle-backed outputs:

    1. Spark integral column arriving float64 from DuckDB ``.df()``
       (HUGEINT sums, UNION ALL literal/HUGEINT mixes) — q_table_checksum
       r4+r5, q_stream_stateful_exact r5, q_embed_pca_invariants r5.
    2. List/array-typed cells on either side — pandas sort/hash crashes
       (``unhashable type: 'list'``) — q_multimodal_decode r5.
    3. High-precision DecimalType on the Spark side — Spark→pandas keeps
       exact object Decimals while DuckDB coerces to float64; publish as
       STRING (exactness) or DOUBLE (when ≤2^53) instead.
    """
    df = _spark_df(qid, spark, sf_dir)
    spark_types = {f.name: f.dataType for f in df.schema.fields}
    for name, dtype in spark_types.items():
        tname = type(dtype).__name__
        assert tname not in ("ArrayType", "MapType", "StructType"), (
            f"{qid}.{name}: {tname} in oracle-backed output — flatten to "
            "scalars or to_json; pandas canon cannot sort/hash list cells"
        )
        assert tname != "DecimalType", (
            f"{qid}.{name}: DecimalType in oracle-backed output — DuckDB "
            ".df() coerces DECIMAL/HUGEINT to float64; cast to STRING "
            "(exact) or DOUBLE/BIGINT (bounded) on BOTH sides"
        )

    import numpy as np

    pdf = _duck_frame(ORACLES[qid], sf_dir)
    for name, dtype in spark_types.items():
        kind = pdf[name].dtype.kind
        if type(dtype).__name__ in _INTEGRAL_SPARK:
            if kind not in ("i", "u"):
                # One SYMMETRIC coercion is driver-safe: a nullable int
                # column that actually contains NULLs becomes float64 on
                # BOTH bridges (DuckDB .df() and Spark's Arrow toPandas),
                # so canonical strings still agree — provided every
                # non-null value is integral and exactly representable
                # (< 2^53). Anything else (HUGEINT sums, literal/HUGEINT
                # UNION mixes — no NULLs involved) is the asymmetric
                # class that reds the driver.
                col = pdf[name]
                vals = col.dropna().to_numpy(dtype="float64")
                assert kind == "f" and col.isna().any(), (
                    f"{qid}.{name}: Spark {dtype} but oracle .df() "
                    f"delivers {col.dtype} with no NULLs — HUGEINT/float "
                    "coercion; CAST the oracle expression AS BIGINT"
                )
                assert (
                    np.all(vals == np.floor(vals))
                    and np.all(np.abs(vals) < 2**53)
                ), (
                    f"{qid}.{name}: nullable-int float64 carries "
                    "non-integral or >2^53 values — precision loss"
                )
        if kind == "O" and len(pdf):
            # EVERY cell, not just row 0: a UNION ALL oracle can lead
            # with a scalar branch and hide list cells further down —
            # the driver canon would still crash on them
            has_listy = (
                pdf[name]
                .map(lambda v: isinstance(v, (list, np.ndarray)))
                .any()
            )
            assert not has_listy, (
                f"{qid}.{name}: oracle .df() delivers list cells — "
                "flatten/to_json on both sides"
            )


@pytest.mark.parametrize("qid", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, qid):
    df = _spark_df(qid, spark, sf_dir)
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
    # the same scalars split into stored + shard 1-row halves
    "q_bm25_incremental",
    "q_skew_profile",  # 1-row (n_keys, total) scalar crossJoin
    # 3-row vocab-size literal crossJoin onto the vocab-bounded count
    # table (the q_quality_gate cutoff pattern, one size bigger)
    "q_vocab_coverage",
    # same 3-row k-table crossJoin, onto the |langs|x|vocab|-bounded
    # post-merge type counts
    "q_bpe_oov_report",
    "q_hybrid_search",  # BM25's scalars + a 1-row max-bm25 crossJoin
    # deliberate |customers| × SCD2_PROBE_POINTS(6) probe grid — the
    # broadcast side is a handful of dates, output-sized by definition
    "q_scd2_lookup",
    "q_profile_drift",  # 1-row × 1-row scalar crossJoin of two profiles
    "q_bpe_merge_apply",  # 1-row winning-pair scalar crossJoin
    "q_mix_temperature",  # 1-row normalizer-scalars crossJoin
    # q_tfidf's 1-row corpus-count scalar, split into the stored (N_c)
    # and delta (N_s) 1-row scalars the incremental index maintains
    "q_tfidf_incremental",
    "q_quality_gate",  # 1-row cutoff-bin scalar crossJoin
    # same 1-row cutoff crossJoin, derived from the merged histogram
    "q_quality_gate_incremental",
    "q_mix_epochs",  # 1-row largest-source scalar crossJoin
    # composite inherits q_quality_gate's 1-row cutoff crossJoin and
    # q_mix_epochs' 1-row largest-source crossJoin
    "q_training_mix_v2",
    # same two inherited 1-row scalar crossJoins (gate cutoff +
    # largest-source), r12 quality-weighted variant
    "q_mix_epochs_quality",
    # certificate's ground-truth tier: all-pairs over the DISTINCT-hash
    # tables (bounded by hash diversity, tens of rows at driver sfs) —
    # the certify-only quadratic, like the range-join ground truths
    "q_dedup_perceptual_capped",
    # same ground-truth tier at the mechanism cap
    "q_dedup_mechanism_cap",
}


#: ids whose FINAL plans contain an unpartitioned Window by design —
#: each window runs over a value-bounded summary (quality-bin
#: histograms for the gate/curve/curriculum/v2-composite, the per-key
#: count table for the skew profile, per-price maxima for the Pareto
#: sweep), never corpus rows. Anything OUTSIDE this set growing a
#: single-partition WindowExec is an accidental global sort — the
#: regression this sweep exists to catch (the known-benign "No
#: Partition Defined for Window" warning must not hide a new one).
#: NB: operators whose bounded global windows sit BEHIND a
#: localCheckpoint (vocab-coverage rank, stream-replay ntile) don't
#: surface in final plans — the sweep still covers every live plan.
GLOBAL_WINDOW_OK = {
    "q_quality_gate",
    # the gate's cumulative windows over the MERGED stored+shard bin
    # histogram — same value-bounded summary
    "q_quality_gate_incremental",
    # global type rank over the vocab-bounded post-merge count summary
    # (the vocab-coverage stance; here the rank is IN the final plan —
    # only its per-(lang,tok) input is checkpointed)
    "q_bpe_oov_report",
    "q_quality_token_curve",
    # the curve's DESC cumulative windows per parity half — same
    # value-bounded bucket summary, four windows instead of two
    "q_quality_curve_drift",
    "q_curriculum_order",
    "q_training_mix_v2",
    # curriculum_stage_table's DESC cumulative window over the
    # value-bounded survivor bin histogram (the q_curriculum_order
    # shape) sits in the final plan — r12 quality-weighted epochs
    "q_mix_epochs_quality",
    "q_skew_profile",
    "q_pareto_frontier",
}


def _unpartitioned_windows(df) -> list[str]:
    """Physical-plan sweep for Window operators with an EMPTY partition
    spec (WindowExec / WindowInPandasExec / WindowGroupLimitExec) —
    the single-task global-sort shape the plan pins forbid outside the
    documented bounded-summary allowlist."""
    plan = df._jdf.queryExecution().executedPlan()
    found: list[str] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name in (
            "WindowExec",
            "WindowInPandasExec",
            "WindowGroupLimitExec",
        ) and node.partitionSpec().isEmpty():
            found.append(name)
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(plan)
    return found


@pytest.mark.slow
def test_all_queries_run(spark, sf_dir):
    """Every registered query (oracle or not) executes, has a schema,
    plans without an ACCIDENTAL quadratic join (cartesian / nested-loop
    outside the documented scalar-broadcast and ground-truth set), and
    plans without an ACCIDENTAL unpartitioned window (global sort
    outside the documented bounded-summary set)."""
    for qid, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, qid
        plan = df._jdf.queryExecution().executedPlan().toString()
        if qid not in NESTED_LOOP_OK:
            assert "CartesianProduct" not in plan, qid
            assert "BroadcastNestedLoopJoin" not in plan, qid
        if qid not in GLOBAL_WINDOW_OK:
            globals_found = _unpartitioned_windows(df)
            assert not globals_found, (qid, globals_found)
        assert df.count() >= 0, qid


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
