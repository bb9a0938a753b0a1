"""Similarity search over the ``embeddings`` table (north-star X3).

Two tiers behind the same result shape (vec_id, score):

- ``q_sim_topk`` — brute-force exact cosine top-k against a query vector
  (oracle-checked). O(n) per query: fine as the ground-truth baseline and
  for one-off queries even at scale (a 100 TB scan, but embarrassingly
  parallel with a TakeOrderedAndProject top-k — no shuffle of the data,
  only k rows per partition reach the driver-side merge).
- ``q_sim_ann_lsh`` — random-hyperplane LSH: LSH_PLANES-bit sign bucket
  (8 planes → 256 buckets) per vector, candidates = query's bucket ∪ all
  ≤2-bit-flip neighbor buckets (37 probes), exact re-rank of candidates
  only. The IVF-style scale path: bucket build is one narrow pass;
  queries touch ~37/256 of the data, and more planes shrink that
  fraction geometrically. Rows-only check; recall vs the exact top-k is
  pinned by a unit test.

Hyperplanes are deterministic pseudo-random (seeded from md5 of the plane
index — public-knowledge construction, no RNG state), so results are stable
across runs and engines."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from breweries_case_spark.functions import decimal_avg
from breweries_case_spark.io.reader import load_table

TOP_K = 10
QUERY_VEC_ID = 0
LSH_PLANES = 8  # 256 buckets; with ≤2-bit multi-probe ≈ 0.9 recall @ cos 0.9
EMB_DIM = 64


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


@F.pandas_udf(T.DoubleType())
def _cosine_pandas(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Arrow-vectorized cosine for pair re-ranking: both vectors land in a
    numpy matrix and the dot/norms are one einsum each — the HOF ``_dot``
    fold evaluates an interpreted lambda per element per row, this does
    three vectorized passes per Arrow batch (benched against the fold on
    the ANN kNN-join at sf0.1; see ann_knn_join). Used in the rows-only
    ANN paths ONLY: numpy accumulates pairwise, not strictly
    left-to-right, so the last ulp can differ from DuckDB's sequential
    ``list_dot_product`` — harmless for ANN ranking, fatal for the
    oracle-hashed exact ids, which keep the fold."""
    import numpy as np

    a = np.stack(va.to_numpy())
    b = np.stack(vb.to_numpy())
    dots = np.einsum("ij,ij->i", a, b)
    na = np.sqrt(np.einsum("ij,ij->i", a, a))
    nb = np.sqrt(np.einsum("ij,ij->i", b, b))
    return pd.Series(dots / (na * nb))


def _norm_py(vec: list[float]) -> float:
    """Driver-side vector norm with the SAME left-to-right accumulation
    order as _dot's fold and DuckDB's list_dot_product — bit-identical
    IEEE result across all three."""
    import math

    acc = 0.0
    for x in vec:
        acc += x * x
    return math.sqrt(acc)


def _embeddings_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _query_vector(
    spark: SparkSession, sf_dir: str, vec_id: int = QUERY_VEC_ID
) -> list[float]:
    """Driver-side lookup of the query vector — a query PARAMETER, not a
    distributed dataset (one indexed row; at scale this is a key-value
    lookup, not a scan)."""
    row = (
        _embeddings_double(spark, sf_dir)
        .filter(F.col("vec_id") == vec_id)
        .select("v")
        .first()
    )
    return list(row.v)


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for the query vector (vec_id=0), excluding itself.
    Plans as scan → narrow per-row cosine → TakeOrderedAndProject.
    norm_q is a driver-side constant (Catalyst does not constant-fold
    higher-order aggregates over literal arrays, so computing it in an
    expression would redo 64 multiplies + sqrt per scanned row). Python
    and the JVM produce the same IEEE double for the same sum, so the
    oracle still matches bitwise."""
    qv = _query_vector(spark, sf_dir)
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    emb = _embeddings_double(spark, sf_dir)
    dot = _dot(F.col("v"), qlit)
    norm_v = F.sqrt(_dot(F.col("v"), F.col("v")))
    norm_q = F.lit(_norm_py(qv))
    cos = dot / (norm_v * norm_q)
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


#: MMR diversified retrieval: candidate pool, output size, trade-off
MMR_CANDIDATES = 50
MMR_K = 10
#: λ and (1−λ) are SEPARATE literals on purpose: Python's 1-0.7 is
#: 0.30000000000000004, so computing the complement would diverge from
#: the SQL literal 0.3 — both engines must parse the same two doubles
MMR_LAMBDA = 0.7
MMR_ONE_MINUS_LAMBDA = 0.3


def _q6_py(x: float) -> float:
    """Driver-side FLOOR(x·1e6 + 0.5)/1e6 — the module's quantization,
    bit-identical to the DuckDB expression on the same input double."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def _cos_py(a: list[float], b: list[float]) -> float:
    """Left-to-right cosine — the same accumulation order as _dot's fold
    and DuckDB's list_dot_product, so all three agree bitwise."""
    import math

    dot = n_a = n_b = 0.0
    for x, y in zip(a, b):
        dot += x * y
        n_a += x * x
        n_b += y * y
    return dot / (math.sqrt(n_a) * math.sqrt(n_b))


def q_sim_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance retrieval (Carbonell & Goldstein,
    SIGIR 1998): greedily pick MMR_K results from the MMR_CANDIDATES
    most query-relevant vectors, each step maximizing
    λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) — the diversified
    re-rank every RAG/retrieval stack runs so the context window isn't
    ten paraphrases of one document.

    Split of labor: candidate generation is the DISTRIBUTED part (the
    exact-cosine TakeOrderedAndProject plan of q_sim_topk, cut at
    MMR_CANDIDATES — at 100 TB this is the scan-bound stage and the
    only one that touches the corpus); the greedy re-rank runs
    driver-side on the collected O(C·d) candidate block (C²·d = 160k
    mults at C=50 — a query-time constant, same driver-compute budget
    as q_sim_ivf's Lloyd step; C is a query parameter, never
    corpus-sized). Determinism: relevance and pairwise sims are
    FLOOR-quantized to 6 dp BEFORE selection (round-then-select, the
    module convention), every accumulation is left-to-right (bitwise
    equal to DuckDB's list_dot_product), score arithmetic uses the two
    literals λ=0.7 / 0.3 verbatim on both engines, ties break on
    vec_id — so the unrolled DuckDB greedy (a generated K-step CTE
    chain, the q_bpe_train_k idiom) reproduces the selection exactly."""
    qv = _query_vector(spark, sf_dir)
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    emb = _embeddings_double(spark, sf_dir)
    cos = _dot(F.col("v"), qlit) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.lit(_norm_py(qv))
    )
    cand_rows = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            (F.floor(cos * 1e6 + F.lit(0.5)) / 1e6).alias("r"),
            "v",
        )
        .orderBy(F.col("r").desc(), "vec_id")
        .limit(MMR_CANDIDATES)
        .collect()
    )
    cand = [(int(row.vec_id), float(row.r), list(row.v)) for row in cand_rows]
    sims: dict[tuple[int, int], float] = {}
    for i, (ida, _, va) in enumerate(cand):
        for idb, _, vb in cand[i + 1 :]:
            s = _q6_py(_cos_py(va, vb))
            sims[(ida, idb)] = sims[(idb, ida)] = s

    selected: list[tuple[int, int, float, float]] = []  # rank, id, r, score
    remaining = {vid: r for vid, r, _ in cand}
    while remaining and len(selected) < MMR_K:
        best = None
        for vid, r in remaining.items():
            if selected:
                ms = max(sims[(vid, p[1])] for p in selected)
                score = MMR_LAMBDA * r - MMR_ONE_MINUS_LAMBDA * ms
            else:
                score = MMR_LAMBDA * r
            # argmax with vec_id ASC tie-break, mirroring the oracle's
            # ORDER BY score DESC, vec_id LIMIT 1
            if best is None or score > best[0] or (
                score == best[0] and vid < best[1]
            ):
                best = (score, vid, r)
        score, vid, r = best
        selected.append((len(selected) + 1, vid, r, score))
        del remaining[vid]

    rows = [
        (rank, vid, r, _q6_py(score)) for rank, vid, r, score in selected
    ]
    return spark.createDataFrame(
        rows, "rank int, vec_id long, relevance double, mmr_score double"
    )


# --- ANN: random-hyperplane LSH --------------------------------------------


def _hyperplanes() -> list[list[float]]:
    """LSH_PLANES deterministic pseudo-random hyperplanes in EMB_DIM dims.
    Component (p, d) = centered md5-derived value in [-1, 1)."""
    import hashlib

    planes = []
    for p in range(LSH_PLANES):
        comps = []
        for d in range(EMB_DIM):
            h = hashlib.md5(f"plane{p}:dim{d}".encode()).hexdigest()
            comps.append((int(h[:8], 16) / 0x8000_0000) - 1.0)
        planes.append(comps)
    return planes


def _bucket_expr(vec_col):
    """LSH_PLANES-bit sign bucket: bit p set iff dot(v, plane_p) >= 0."""
    bucket = F.lit(0)
    for p, plane in enumerate(_hyperplanes()):
        plane_lit = F.array(*[F.lit(c) for c in plane])
        bucket = bucket + F.when(
            _dot(vec_col, plane_lit) >= 0, F.lit(1 << p)
        ).otherwise(F.lit(0))
    return bucket


def _query_bucket(qv: list[float]) -> int:
    """Driver-side sign bucket of a query vector — the same convention as
    `_bucket_expr` (bit p set iff dot(v, plane_p) >= 0). ONE definition,
    shared by ann_topk and the q_sim_ann_recall certificate, so the
    certificate can never drift to testing a different bucket than the
    operator probes."""
    q_bucket = 0
    for p, plane in enumerate(_hyperplanes()):
        if sum(a * b for a, b in zip(qv, plane)) >= 0:
            q_bucket |= 1 << p
    return q_bucket


def ann_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
) -> DataFrame:
    """ANN top-k: hash all vectors to sign buckets, probe the query's bucket
    plus all ≤2-bit-flip neighbor buckets (multi-probe LSH), exact-cosine
    re-rank of candidates only. Same output shape as q_sim_topk.

    At scale the bucket assignment is precomputed/persisted (bucketBy on
    `bucket`), so a query reads ~37 of 256 buckets instead of the table."""
    qv = _query_vector(spark, sf_dir, query_vec_id)
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    emb = _embeddings_double(spark, sf_dir).withColumn(
        "bucket", _bucket_expr(F.col("v"))
    )

    # query bucket + multi-probe neighbors, computed driver-side (small)
    q_bucket = _query_bucket(qv)
    probes = {q_bucket}
    for p in range(LSH_PLANES):
        probes.add(q_bucket ^ (1 << p))
        for p2 in range(p + 1, LSH_PLANES):
            probes.add(q_bucket ^ (1 << p) ^ (1 << p2))

    dot = _dot(F.col("v"), qlit)
    norm_v = F.sqrt(_dot(F.col("v"), F.col("v")))
    norm_q = F.lit(_norm_py(qv))
    cos = dot / (norm_v * norm_q)
    return (
        emb.filter(F.col("bucket").isin(sorted(probes)))
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered ANN entry: default query vector, default k."""
    return ann_topk(spark, sf_dir)


#: deterministic per-dataset floors for the ANN recall certificate —
#: measured overlaps with exact top-10 are lsh 3 / ivf 9-10 / trained 9
#: at sf0.001 and sf0.01 (fixed hyperplanes + fixed data ⇒ constants,
#: not samples); floors sit under them with margin so only a genuine
#: recall regression can trip them
ANN_LSH_OVERLAP_FLOOR = 2
ANN_IVF_OVERLAP_FLOOR = 6


def q_sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked certificate for the ANN tier (the
    q_dedup_blocker_recall pattern on similarity search): bucket
    assignments are engine-side so ANN outputs can't be value-checked
    directly, but their CONTRACTS can. Rows ``(check_name, value)``:

    - ``exact_topk_rows``: size of the exact top-k — the oracle
      recomputes it from raw embeddings (anchor).
    - ``lsh_hits_outside_probe_radius``: ANN-LSH hits whose sign bucket
      is more than 2 bit-flips from the query's bucket — the multi-probe
      blocking contract, pinned 0 (a probe-set bug surfaces here).
    - ``lsh_overlap_deficit`` / ``ivf_overlap_deficit`` /
      ``ivf_trained_overlap_deficit``: how far each ANN variant's
      overlap with the exact top-k falls below its documented floor
      (0 when the floor holds). Floors are constants of this dataset —
      the blocking geometry is deterministic — so a nonzero value means
      the index construction regressed, not sampling noise.

    The kNN-join ANN variant is deliberately NOT floored here: on
    near-uniform synthetic embeddings bucket scatter makes its real-table
    overlap tiny and unstable (its hard guarantee is the planted-near-dup
    unit test, tests/test_llm_ops.py:368)."""
    exact = (
        q_sim_topk(spark, sf_dir).select("vec_id").localCheckpoint()
    )
    n_exact = exact.count()

    def overlap(df: DataFrame) -> int:
        return df.select("vec_id").join(exact, "vec_id", "left_semi").count()

    lsh_df = q_sim_ann_lsh(spark, sf_dir).localCheckpoint()
    lsh_o = overlap(lsh_df)

    q_bucket = _query_bucket(_query_vector(spark, sf_dir))
    emb_b = _embeddings_double(spark, sf_dir).select(
        "vec_id", _bucket_expr(F.col("v")).alias("bucket")
    )
    out_of_radius = (
        lsh_df.join(F.broadcast(emb_b), "vec_id")
        .filter(
            F.bit_count(
                F.col("bucket").bitwiseXOR(F.lit(q_bucket))
            )
            > F.lit(2)
        )
        .count()
    )

    ivf_o = overlap(q_sim_ivf(spark, sf_dir))
    ivft_o = overlap(q_sim_ivf_trained(spark, sf_dir))

    rows = [
        ("exact_topk_rows", n_exact),
        ("lsh_hits_outside_probe_radius", out_of_radius),
        ("lsh_overlap_deficit", max(0, ANN_LSH_OVERLAP_FLOOR - lsh_o)),
        ("ivf_overlap_deficit", max(0, ANN_IVF_OVERLAP_FLOOR - ivf_o)),
        (
            "ivf_trained_overlap_deficit",
            max(0, ANN_IVF_OVERLAP_FLOOR - ivft_o),
        ),
    ]
    return spark.createDataFrame(rows, "check_name string, value long")


KNN_K = 5


def q_sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN self-join: every vector's top-5 cosine neighbors within its
    label block (the batch "find neighbors for ALL rows" shape that powers
    near-dup clustering and retrieval eval; q_sim_topk is the one-query
    variant). Blocked pairwise + per-query window rank — at 100 TB the
    label block is replaced by LSH/IVF buckets (same plan shape, bucket
    key instead of label), keeping the pair count per block bounded.
    Ranking uses the UNROUNDED cosine (bit-identical across engines for
    the same doubles) with vec_id tiebreak, so the oracle's window agrees
    row-for-row."""
    emb = _embeddings_double(spark, sf_dir)
    dot_self = _dot(F.col("v"), F.col("v"))
    emb = emb.withColumn("norm", F.sqrt(dot_self))
    a, b = emb.alias("a"), emb.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    from pyspark.sql.window import Window

    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("query_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        F.col("a.label").alias("label"),
        cos.alias("cos_exact"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_exact").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select(
            "query_id",
            "neighbor_id",
            "label",
            F.round(F.col("cos_exact"), 6).alias("cosine"),
            "rank",
        )
    )


#: in-batch hard-negative mining batch size (the contrastive-training
#: batch the negatives are mined within)
HN_BATCH = 64


def q_sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-BATCH hard-negative mining — the contrastive-training data op
    (public from DPR, Karpukhin et al. 2020, and the in-batch negative
    literature): for every anchor vector, the MOST SIMILAR vector with
    a DIFFERENT label inside the anchor's training batch — the negative
    that most confuses the model and therefore teaches it most. Batches
    are the deterministic vec_id // HN_BATCH shards a sequential
    dataloader would form; anchors whose batch holds no other label are
    dropped (their loss has no negative term).

    Scale shape: a global "hardest negative anywhere" needs a
    label-INEQUALITY join — no equi-key, quadratic — which is exactly
    why production mines within batches (or within ANN buckets — swap
    the batch key for the LSH bucket of ann_knn_join, same plan): the
    self-join is an EQUI-join on batch_id with ≤ HN_BATCH² pairs per
    batch, and the per-anchor argmax is one window over the pair set —
    pair volume is corpus × HN_BATCH, linear in the corpus at fixed
    batch size. Ranking uses the unrounded cosine (bit-identical
    doubles) with neighbor-id tiebreak, like q_sim_knn_join; published
    cosine is FLOOR-quantized."""
    from pyspark.sql.window import Window

    emb = _embeddings_double(spark, sf_dir).withColumn(
        "batch_id", F.floor(F.col("vec_id") / F.lit(HN_BATCH)).cast("long")
    )
    emb = emb.withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    a, b = emb.alias("a"), emb.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    pairs = a.join(
        b,
        (F.col("a.batch_id") == F.col("b.batch_id"))
        & (F.col("a.label") != F.col("b.label")),
    ).select(
        F.col("a.vec_id").alias("anchor_id"),
        F.col("a.batch_id").alias("batch_id"),
        F.col("a.label").alias("anchor_label"),
        F.col("b.vec_id").alias("negative_id"),
        F.col("b.label").alias("negative_label"),
        cos.alias("cos_raw"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_raw").desc(), F.col("negative_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            "batch_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            (F.floor(F.col("cos_raw") * 1e6 + F.lit(0.5)) / 1e6).alias(
                "neg_cosine"
            ),
        )
    )


def ann_knn_join(emb: DataFrame, k: int = KNN_K) -> DataFrame:
    """Approximate kNN self-join over (vec_id, label, v) — the 100 TB
    path for the all-rows neighbor search: pairs are generated ONLY
    within shared LSH sign buckets (plus same label), then exact-cosine
    ranked per query. Bucket-join replaces the label-block cross join.
    The LSH guarantee is for GENUINELY similar vectors (small angle →
    high same-bucket probability); a unit test plants near-duplicates
    and asserts they are found. Candidate re-rank uses the Arrow
    _cosine_pandas (1.29 s vs 1.65 s for the interpreted HOF fold at
    sf0.1, identical ranking — the gap widens with candidate volume
    since the HOF cost is per element per row). On near-uniform vectors (like the
    driver's synthetic embeddings, max cosine ≈ 0.45) sign buckets
    separate everything — correctly, since nothing is actually close.
    More planes → smaller buckets → less work at lower recall;
    multi-probe (as in ann_topk) buys recall back."""
    from pyspark.sql.window import Window

    emb = emb.withColumn("bucket", _bucket_expr(F.col("v")))
    a, b = emb.alias("a"), emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("query_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        F.col("a.label").alias("label"),
        _cosine_pandas(F.col("a.v"), F.col("b.v")).alias("cos_exact"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_exact").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "label",
            F.round(F.col("cos_exact"), 6).alias("cosine"),
            "rank",
        )
    )


def q_sim_knn_join_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered ANN kNN-join entry (rows-only; see ann_knn_join)."""
    return ann_knn_join(_embeddings_double(spark, sf_dir))


# --- ANN: IVF-Flat (inverted-file coarse quantizer) --------------------------

IVF_CENTROIDS = 16
IVF_NPROBE = 4


def _ivf_centroids(emb: DataFrame) -> list[tuple[int, list[float]]]:
    """Deterministic training-free coarse quantizer: the IVF_CENTROIDS
    lowest-vec_id vectors serve as centroids. Production swaps in
    k-means||-trained centroids — the INDEX STRUCTURE (assignment column,
    bucket-pruned search) and the query plan are identical; centroid
    quality only moves recall. Centroids are a driver-side parameter
    (IVF_CENTROIDS rows), like the query vector."""
    rows = emb.orderBy("vec_id").limit(IVF_CENTROIDS).collect()
    return [(r.vec_id, list(r.v)) for r in rows]


def _ivf_assign_expr(vec_col, cents: list[tuple[int, list[float]]]):
    """Column expression: id of the nearest centroid by cosine. Scores all
    IVF_CENTROIDS centroids narrowly per row (no shuffle), argmax via
    array_sort on (score, cid) structs — ties break to the larger cid,
    deterministically."""
    norm_v = F.sqrt(_dot(vec_col, vec_col))
    scored = []
    for cid, c in cents:
        clit = F.array(*[F.lit(float(x)) for x in c])
        scored.append(
            F.struct(
                (_dot(vec_col, clit) / (norm_v * F.lit(_norm_py(c)))).alias("s"),
                F.lit(cid).alias("cid"),
            )
        )
    return F.element_at(F.array_sort(F.array(*scored)), -1)["cid"]


def _ivf_assign_pandas(cents: list[tuple[int, list[float]]]):
    """Vectorized IVF cell assignment: per Arrow batch, ONE
    (batch × dim) @ (dim × k) GEMM + row norms + argmax — versus
    ``_ivf_assign_expr``'s k interpreted HOF dot folds per row
    (k × dim lambda evaluations each). Same nearest-centroid-by-cosine
    contract, ties to the larger cid (argmax taken over the reversed
    score row, mirroring the expr's array_sort tie-break). Used on the
    REGISTERED query paths where per-row bit-parity with the decimal
    training loop is not required; training keeps the expr form so its
    bit-reproducibility contract is untouched. Measured at sf0.1 (see
    SURVEY §6): the assignment pass drops from interpreted-lambda-bound
    to Arrow-transfer-bound."""
    import numpy as np

    ordered = sorted(cents)  # cid ascending, so reversed-argmax = larger cid
    ids = np.array([cid for cid, _ in ordered], dtype=np.int64)
    C = np.stack([np.asarray(c, dtype=np.float64) for _, c in ordered])
    Cn = (C / np.linalg.norm(C, axis=1, keepdims=True)).T  # dim × k

    @F.pandas_udf(T.LongType())
    def assign(vs: pd.Series) -> pd.Series:
        V = np.stack(vs.to_numpy())
        scores = (V @ Cn) / np.linalg.norm(V, axis=1, keepdims=True)
        last_max = scores.shape[1] - 1 - np.argmax(scores[:, ::-1], axis=1)
        return pd.Series(ids[last_max])

    return assign


def _ivf_assign_margin_pandas(cents: list[tuple[int, list[float]]]):
    """q_sim_ivf_recall's cross-check variant of ``_ivf_assign_pandas``:
    same GEMM assignment, plus the top-2 cosine margin per row — the
    certificate counts GEMM-vs-HOF disagreements only where the margin
    exceeds 1e-9, because the two formulas round differently and a
    genuine near-tie may legitimately flip between them (a real bug
    disagrees at large margins)."""
    import numpy as np

    ordered = sorted(cents)
    ids = np.array([cid for cid, _ in ordered], dtype=np.int64)
    C = np.stack([np.asarray(c, dtype=np.float64) for _, c in ordered])
    Cn = (C / np.linalg.norm(C, axis=1, keepdims=True)).T

    @F.pandas_udf("cell long, margin double")
    def assign(vs: pd.Series) -> pd.DataFrame:
        V = np.stack(vs.to_numpy())
        scores = (V @ Cn) / np.linalg.norm(V, axis=1, keepdims=True)
        last_max = scores.shape[1] - 1 - np.argmax(scores[:, ::-1], axis=1)
        top2 = np.sort(scores, axis=1)[:, -2:]
        return pd.DataFrame(
            {"cell": ids[last_max], "margin": top2[:, 1] - top2[:, 0]}
        )

    return assign


def ivf_train_centroids(
    emb: DataFrame, iters: int = 3
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd refinement of the deterministic seed centroids —
    the 'k-means-trained quantizer' upgrade _ivf_centroids documents.
    Assign step: the narrow no-shuffle vectorized GEMM assignment
    (``_ivf_assign_pandas``; per-row results are independent of Arrow
    batch shape, so the assignment is as deterministic as the HOF
    expression it replaced at ~3× the speed — measured 9.8 s → ~3.5 s
    for 3 iterations at sf0.1); update step: ONE groupBy over the
    assignment computing per-cell per-dimension sums — k rows ever reach
    the driver per iteration, the data never does. Sums accumulate in
    decimal so the result is bit-identical regardless of partition/reduce
    order (IEEE double sums are order-dependent; see
    functions/numeric.py), making training fully deterministic. Empty cells keep their previous centroid. Fixed
    iteration count rather than a convergence test: each extra iteration
    is a full assign pass, and 3 rounds move seed centroids to cluster
    interiors on any data; production k-means|| adds a smarter seeding
    pass, same per-iteration plan."""
    cents = _ivf_centroids(emb)
    dim = len(cents[0][1])
    for _ in range(iters):
        assigned = emb.withColumn("_cell", _ivf_assign_pandas(cents)(F.col("v")))
        sums = [
            F.sum(
                F.element_at(F.col("v"), i + 1).cast("decimal(28,15)")
            ).alias(f"s{i}")
            for i in range(dim)
        ]
        rows = assigned.groupBy("_cell").agg(F.count("*").alias("n"), *sums)
        by_cell = {r["_cell"]: r for r in rows.collect()}
        cents = [
            (
                cid,
                [float(by_cell[cid][f"s{i}"]) / by_cell[cid]["n"] for i in range(dim)]
                if cid in by_cell and by_cell[cid]["n"] > 0
                else old,
            )
            for cid, old in cents
        ]
    return cents


def _ivf_probes(
    cents: list[tuple[int, list[float]]], query_vec: list[float], nprobe: int
) -> list[int]:
    """The nprobe centroid ids nearest the query by cosine (driver-side —
    IVF_CENTROIDS scores, like scoring the query vector itself). Shared by
    ``ivf_topk`` and the ``q_sim_ivf_recall`` certificate so the probe set
    the certificate checks against IS the one the search used."""
    norm_q = _norm_py(query_vec)

    def _cos_py(c: list[float]) -> float:
        acc = 0.0
        for a, b in zip(query_vec, c):
            acc += a * b
        return acc / (_norm_py(c) * norm_q)

    return [
        cid
        for cid, _ in sorted(cents, key=lambda t: (-_cos_py(t[1]), t[0]))[:nprobe]
    ]


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    exclude_vec_id: int | None = None,
    k: int = TOP_K,
    nprobe: int = IVF_NPROBE,
    cents: list[tuple[int, list[float]]] | None = None,
    vectorized_assign: bool = True,
) -> DataFrame:
    """IVF-Flat ANN top-k: vectors are assigned to their nearest centroid
    (the inverted file); a query scores the centroids driver-side, probes
    only the nprobe nearest lists, and exact-cosine re-ranks those
    candidates. At scale the assignment column is precomputed and the
    table is partitioned/bucketed by it, so a query reads nprobe/
    IVF_CENTROIDS of the data — the same pruning contract as the LSH
    variant but with data-adaptive cells instead of fixed hyperplanes.

    The inline assignment (this test-scale stand-in for the precomputed
    column) defaults to the vectorized pandas GEMM (``_ivf_assign_pandas``);
    ``vectorized_assign=False`` keeps the interpreted HOF expression for
    benching the two forms against each other."""
    if cents is None:
        cents = _ivf_centroids(emb)
    assign = (
        _ivf_assign_pandas(cents)(F.col("v"))
        if vectorized_assign
        else _ivf_assign_expr(F.col("v"), cents)
    )
    probes = _ivf_probes(cents, query_vec, nprobe)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    norm_q = _norm_py(query_vec)
    cos = _dot(F.col("v"), qlit) / (F.sqrt(_dot(F.col("v"), F.col("v"))) * F.lit(norm_q))
    out = emb.withColumn("_cell", assign).filter(F.col("_cell").isin(probes))
    if exclude_vec_id is not None:
        out = out.filter(F.col("vec_id") != exclude_vec_id)
    return (
        out.select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered IVF-Flat ANN entry (rows-only: pruning is approximate;
    a unit test plants near-duplicates and asserts they are found, and
    checks recall against the exact top-k)."""
    emb = _embeddings_double(spark, sf_dir)
    return ivf_topk(emb, _query_vector(spark, sf_dir), exclude_vec_id=QUERY_VEC_ID)


def q_sim_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat with Lloyd-refined centroids (``ivf_train_centroids``) —
    the trained-quantizer variant of q_sim_ivf; same probe/re-rank plan,
    data-adaptive cells. Rows-only; a unit test pins recall vs the exact
    top-k at least as high as the seeded variant's.

    r14 (optimization round 2): the embeddings frame is checkpointed
    ONCE and shared by the seed collect, all three Lloyd assign passes,
    the query-vector lookup and the final probe scan — before, every
    Lloyd iteration re-read the parquet and re-cast the 64-dim array
    (guide §1.3: materialize what an iterative loop re-reads; at scale
    the trained quantizer reads a stored narrow table, and this is the
    in-run equivalent)."""
    emb = _embeddings_double(spark, sf_dir).localCheckpoint()
    qv = list(
        emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("v").first().v
    )
    cents = ivf_train_centroids(emb)
    return ivf_topk(emb, qv, exclude_vec_id=QUERY_VEC_ID, cents=cents)


def q_sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked certificate for the IVF tier (the q_sim_ann_recall
    pattern, completing VERDICT r5 item 5): cell assignments are
    engine-side so the IVF outputs can't be value-checked directly, but
    their CONTRACTS can. Rows ``(check_name, value)``:

    - ``ivf_rows`` / ``ivf_trained_rows``: result sizes of both IVF
      variants — the oracle recomputes the expected LEAST(k, n-1) from
      the raw table (anchor; a probe set that prunes away the whole
      corpus surfaces here).
    - ``assign_gemm_expr_mismatch``: rows of the FULL table where the
      vectorized pandas-GEMM assignment (``_ivf_assign_pandas``) and the
      interpreted HOF expression (``_ivf_assign_expr``) disagree on the
      nearest centroid WHILE the GEMM top-2 cosine margin exceeds 1e-9 —
      two independent implementations of the same contract,
      cross-validated row-for-row and pinned 0. The margin gate is what
      makes the pin robust: the two formulas round differently (blocked
      numpy summation vs sequential HOF fold), so a genuine ULP-level
      near-tie may legitimately flip between them — but a tie-break or
      normalization BUG produces large-margin disagreements, which is
      exactly what the gated count still catches.
    - ``ivf_hits_outside_probe`` / ``ivf_trained_hits_outside_probe``:
      hits whose cell — re-derived through the INDEPENDENT expression
      path — is not in the probe set the search used, pinned 0 (the
      cell-prune analog of lsh_hits_outside_probe_radius).

    Overlap-with-exact floors for both variants already live in
    q_sim_ann_recall (driver-green r5); this certificate adds the
    structural checks that the pruning itself is sound."""
    emb = _embeddings_double(spark, sf_dir).localCheckpoint()
    qv = _query_vector(spark, sf_dir)

    seed = _ivf_centroids(emb)
    trained = ivf_train_centroids(emb)

    mismatch = (
        emb.withColumn("_g", _ivf_assign_margin_pandas(seed)(F.col("v")))
        .withColumn("_expr", _ivf_assign_expr(F.col("v"), seed))
        .filter(
            (F.col("_g.cell") != F.col("_expr"))
            & (F.col("_g.margin") > F.lit(1e-9))
        )
        .count()
    )

    def outside_probe(cents: list[tuple[int, list[float]]]) -> tuple[int, int]:
        hits = ivf_topk(
            emb, qv, exclude_vec_id=QUERY_VEC_ID, cents=cents
        ).localCheckpoint()
        probes = _ivf_probes(cents, qv, IVF_NPROBE)
        n_out = (
            hits.join(
                emb.select(
                    "vec_id",
                    _ivf_assign_expr(F.col("v"), cents).alias("_cell"),
                ),
                "vec_id",
            )
            .filter(~F.col("_cell").isin(probes))
            .count()
        )
        return hits.count(), n_out

    ivf_n, ivf_out = outside_probe(seed)
    ivft_n, ivft_out = outside_probe(trained)

    rows = [
        ("ivf_rows", ivf_n),
        ("ivf_trained_rows", ivft_n),
        ("assign_gemm_expr_mismatch", mismatch),
        ("ivf_hits_outside_probe", ivf_out),
        ("ivf_trained_hits_outside_probe", ivft_out),
    ]
    return spark.createDataFrame(rows, "check_name string, value long")


#: deterministic daily-shard split for the incremental index maintainer
#: (the dedup family's % 20 "daily delivery" discipline on vec_id)
IVF_SHARD_MOD = 20

#: per-cell load fraction above which the maintainer trips a re-train:
#: 3× the mean cell load (1/IVF_CENTROIDS) — the index still WORKS past
#: this (assignment stays correct), but probe pruning degrades toward a
#: scan of the hot cell, which is when production re-clusters
IVF_REBALANCE_MAX_FRAC = 3.0 / IVF_CENTROIDS


def _ivf_assign_q6(vec_col, cents: list[tuple[int, list[float]]]):
    """Quantized nearest-centroid assignment as a struct column
    ``(s = 6-dp FLOOR-quantized cosine to the winning centroid, cid)`` —
    the ``_ivf_assign_expr`` contract with the module's cross-engine
    float discipline applied BEFORE the argmax: every per-centroid
    cosine is FLOOR(x·1e6 + 0.5)/1e6-quantized (bit-identical on both
    engines: the ``_dot`` fold, ``_norm_py``, and DuckDB's sequential
    ``list_dot_product`` accumulate left-to-right), so the winning cell
    is a deterministic function of quantized values and a DuckDB oracle
    can reproduce it exactly (ties break to the larger cid, the expr
    family's rule). Used by the oracle-HASHED incremental ids; the
    unquantized expr/GEMM forms stay on the search paths."""
    norm_v = F.sqrt(_dot(vec_col, vec_col))
    scored = []
    for cid, c in cents:
        clit = F.array(*[F.lit(float(x)) for x in c])
        cos = _dot(vec_col, clit) / (norm_v * F.lit(_norm_py(c)))
        q6 = F.floor(cos * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
        scored.append(F.struct(q6.alias("s"), F.lit(cid).alias("cid")))
    return F.element_at(F.array_sort(F.array(*scored)), -1)


def q_sim_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintainer — the similarity-family analog of
    the r12 dedup cluster maintainers (VERDICT r12 item 1): a NEW
    embedding shard (vec_id % 20 == 0, the family's deterministic daily
    delivery) is assigned to the EXISTING IVF cells without re-clustering
    the corpus. The stored state is the corpus coarse quantizer
    (``_ivf_centroids`` over the corpus — at 100 TB a loaded
    IVF_CENTROIDS-row table, exactly like the dedup maintainers' stored
    cluster assignment; here derived once as the baseline); the update is
    ONE narrow no-shuffle pass over the SHARD scoring IVF_CENTROIDS
    centroids per row — per-day cost O(shard × k), the corpus is never
    touched. Appending the assigned rows to their cell partitions is the
    storage step (io/writer's dynamic partition overwrite); re-training
    is deliberately NOT part of this operator — q_sim_ivf_maintain owns
    the drift trigger, q_sim_ivf_incremental_recall certifies that
    serving the stored centroids keeps recall.

    Output: one row per shard vector — (vec_id, cell = winning stored
    centroid id, cosine = 6-dp quantized cosine to it). Oracle:
    closed-form SQL (the stored centroids are the 16 lowest-vec_id
    corpus vectors, so DuckDB re-derives cells + cosines exactly; see
    ``_ivf_assign_q6`` for the bit-parity argument). This hashed id pins
    the maintainer's TOPOLOGY and assignment semantics with the seed
    quantizer stand-in (``_ivf_centroids``'s documented role: centroid
    quality only moves recall, never the plan);
    ``q_sim_ivf_incremental_recall`` runs the same maintainer with the
    TRAINED stored quantizer and certifies its serving recall against a
    full re-train."""
    emb = _embeddings_double(spark, sf_dir)
    corpus = emb.filter(F.col("vec_id") % IVF_SHARD_MOD != 0)
    cents = _ivf_centroids(corpus)  # stored state: k rows, driver-side
    best = _ivf_assign_q6(F.col("v"), cents)
    return (
        emb.filter(F.col("vec_id") % IVF_SHARD_MOD == 0)
        .select("vec_id", best.alias("_b"))
        .select(
            "vec_id",
            F.col("_b.cid").alias("cell"),
            F.col("_b.s").alias("cosine"),
        )
    )


def q_sim_ivf_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF maintainer DRIFT/BALANCE certificate table — the monitoring
    row set that decides when q_sim_ivf_incremental's stored centroids
    must be re-trained: per stored cell, the corpus load (at scale a
    stored IVF_CENTROIDS-row stats table maintained with the index), the
    new shard's load, the post-append load and its corpus fraction, and
    the re-train trigger (post_frac > IVF_REBALANCE_MAX_FRAC = 3× the
    mean cell load — past that the hot cell's probe degrades toward a
    scan and production re-clusters; below it the day's delivery is
    absorbed with zero corpus work). Cells are keyed by the stored
    centroid ids, so empty cells publish explicit zero rows rather than
    vanishing — a cell that EMPTIES is drift signal too.

    Plan: two narrow assignment passes (corpus — the in-fixture stand-in
    for the stored stats table — and shard) → two k-row aggregates → one
    k-row join; nothing shuffles more than IVF_CENTROIDS rows. Oracle:
    fully closed-form (cells and loads re-derived in SQL from the same
    seed-centroid definition). r14: the embeddings frame is checkpointed
    once — the seed collect, both assignment passes and the total count
    read it instead of four parquet scan+cast passes (guide §1.3)."""
    emb = _embeddings_double(spark, sf_dir).localCheckpoint()
    is_shard = F.col("vec_id") % IVF_SHARD_MOD == 0
    corpus = emb.filter(~is_shard)
    cents = _ivf_centroids(corpus)
    cell_of = _ivf_assign_q6(F.col("v"), cents)["cid"]
    corpus_loads = (
        corpus.select(cell_of.alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("corpus_n"))
    )
    shard_loads = (
        emb.filter(is_shard)
        .select(cell_of.alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("shard_n"))
    )
    n_total = emb.count()  # fixed-size scalar, like the centroid collect
    cells = spark.createDataFrame(
        [(cid,) for cid, _ in cents], "cell long"
    )
    post = F.col("corpus_n") + F.col("shard_n")
    post_frac = F.floor(
        post.cast("double") / F.lit(float(n_total)) * 1e6 + F.lit(0.5)
    ) / F.lit(1e6)
    return (
        cells.join(corpus_loads, "cell", "left")
        .join(shard_loads, "cell", "left")
        .select(
            "cell",
            F.coalesce("corpus_n", F.lit(0)).alias("corpus_n"),
            F.coalesce("shard_n", F.lit(0)).alias("shard_n"),
        )
        .select(
            "cell",
            "corpus_n",
            "shard_n",
            post.alias("post_n"),
            post_frac.alias("post_frac"),
            (post_frac > F.lit(IVF_REBALANCE_MAX_FRAC))
            .cast("long")
            .alias("retrain"),
        )
    )


#: serving-recall floor for the STORED (trained-before-the-shard)
#: quantizer: measured 5/6/6 overlap@10 at sf0.001/0.01/0.1 (nprobe 4 of
#: 16 cells) — one below the fresh-train floor because the query vector
#: itself arrives with the shard, so yesterday's centroids never saw its
#: neighborhood. The certificate pins this from degrading further.
IVF_INCR_OVERLAP_FLOOR = 5

#: max overlap@10 the stored quantizer may forfeit vs a full re-train
#: before the certificate reds: measured gap 3-4 at every driver sf
#: (the price of serving yesterday's quantizer at nprobe=4);
#: q_sim_ivf_maintain's balance trigger bounds how long that price is
#: paid before a re-train is scheduled.
IVF_INCR_RETRAIN_SLACK = 5


def q_sim_ivf_incremental_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall certificate for the incremental IVF maintainer vs a FULL
    RE-TRAIN (VERDICT r12 item 1's second half): the production stored
    state is the quantizer TRAINED on the corpus before the shard
    arrived (``ivf_train_centroids(corpus)`` — the trained table
    q_sim_ivf_trained serves); the shard is absorbed by assignment only,
    and this certificate bounds what that costs against re-running Lloyd
    over corpus ∪ shard. Rows ``(check_name, value)``, every one
    oracle-pinned (the q_sim_ann_recall literal-0 pattern):

    - ``exact_topk_rows``: size of the exact top-k over the post-append
      index (oracle recomputes LEAST(k, n−1) — the anchor).
    - ``stored_overlap_deficit``: max(0, IVF_INCR_OVERLAP_FLOOR −
      |ivf_topk(stored cents) ∩ exact top-k|) — pinned 0: serving
      yesterday's quantizer keeps the measured absolute floor.
    - ``retrained_overlap_deficit``: the same deficit at the full-train
      floor ANN_IVF_OVERLAP_FLOOR for centroids re-trained on
      corpus ∪ shard — pinned 0 (the re-train baseline is itself sound).
    - ``retrain_regression_excess``: max(0, overlap_retrained −
      overlap_stored − IVF_INCR_RETRAIN_SLACK) — pinned 0: the
      stored-vs-retrained gap (measured 3-4 @ k=10 on every driver sf)
      cannot silently widen past the slack. This is the recall-vs-
      re-train bound the maintainer contract promises.
    - ``stored_hits_outside_probe``: stored-quantizer hits whose cell
      (re-derived through the independent expr path) is not in the probe
      set — pinned 0 (the structural cell-prune check).
    - ``incremental_assign_mismatch``: shard rows where the registered
      quantized assignment (``_ivf_assign_q6``) and the independent GEMM
      assignment disagree on the stored centroids while the GEMM top-2
      margin exceeds 2e-6 (wider than q_sim_ivf_recall's 1e-9 gate
      because the registered side quantizes to 6 dp before the argmax)
      — pinned 0."""
    emb = _embeddings_double(spark, sf_dir).localCheckpoint()
    qv = _query_vector(spark, sf_dir)
    corpus = emb.filter(F.col("vec_id") % IVF_SHARD_MOD != 0)
    stored = ivf_train_centroids(corpus)
    retrained = ivf_train_centroids(emb)
    exact = q_sim_topk(spark, sf_dir).select("vec_id").localCheckpoint()

    def overlap(cents: list[tuple[int, list[float]]]) -> int:
        hits = ivf_topk(emb, qv, exclude_vec_id=QUERY_VEC_ID, cents=cents)
        return hits.select("vec_id").join(exact, "vec_id", "left_semi").count()

    exact_n = exact.count()
    ov_stored = overlap(stored)
    ov_retrained = overlap(retrained)
    stored_deficit = max(0, IVF_INCR_OVERLAP_FLOOR - ov_stored)
    retrained_deficit = max(0, ANN_IVF_OVERLAP_FLOOR - ov_retrained)
    regression = max(0, ov_retrained - ov_stored - IVF_INCR_RETRAIN_SLACK)

    hits = ivf_topk(
        emb, qv, exclude_vec_id=QUERY_VEC_ID, cents=stored
    ).localCheckpoint()
    probes = _ivf_probes(stored, qv, IVF_NPROBE)
    outside = (
        hits.join(
            emb.select(
                "vec_id", _ivf_assign_expr(F.col("v"), stored).alias("_cell")
            ),
            "vec_id",
        )
        .filter(~F.col("_cell").isin(probes))
        .count()
    )

    mismatch = (
        emb.filter(F.col("vec_id") % IVF_SHARD_MOD == 0)
        .withColumn("_g", _ivf_assign_margin_pandas(stored)(F.col("v")))
        .withColumn("_q", _ivf_assign_q6(F.col("v"), stored)["cid"])
        .filter(
            (F.col("_g.cell") != F.col("_q"))
            & (F.col("_g.margin") > F.lit(2e-6))
        )
        .count()
    )

    rows = [
        ("exact_topk_rows", exact_n),
        ("stored_overlap_deficit", stored_deficit),
        ("retrained_overlap_deficit", retrained_deficit),
        ("retrain_regression_excess", regression),
        ("stored_hits_outside_probe", outside),
        ("incremental_assign_mismatch", mismatch),
    ]
    return spark.createDataFrame(rows, "check_name string, value long")


def q_embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalization summary per embedding — the preprocessing step
    every cosine-based ANN index runs first. Emits scalars (norm and the
    normalized-component sum), NOT the normalized array: array-typed
    result columns are unhashable for the driver's pandas canonicalizer
    (the q_collect_set lesson), and the two scalars pin the same float
    path bit-for-bit. Plans as scan → narrow per-row fold — no shuffle.
    unit_sum is sum(v)/norm with ONE division (not sum(v/norm)) so the
    oracle's IEEE evaluation order matches exactly; the component sum
    reuses the _dot fold against a ones-vector, which DuckDB mirrors via
    list_dot_product."""
    emb = _embeddings_double(spark, sf_dir)
    norm = F.sqrt(_dot(F.col("v"), F.col("v")))
    ones = F.transform(F.col("v"), lambda x: F.lit(1.0))
    comp_sum = _dot(F.col("v"), ones)
    return emb.select(
        "vec_id",
        F.round(norm, 6).alias("l2_norm"),
        F.round(comp_sum / norm, 6).alias("unit_sum"),
    )


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per embedding (the memory-compression
    step before an ANN index ships to serving): scale = max|x|/127,
    q_i = round-half-up(x_i/scale), plus the squared reconstruction
    error. Emits scalars only (quantized sum, error) — same
    array-unhashability rationale as q_embed_normalize.

    Determinism: rounding is FLOOR(x/scale + 0.5) on BOTH engines —
    floor/divide/add are single correctly-rounded IEEE ops, immune to the
    round-half engine conventions; folds run left-to-right in both
    engines (Spark ``aggregate`` ≡ DuckDB ``list_reduce``). Assumes a
    nonzero vector (random embeddings; an all-zero vector would yield
    NULL/NaN on both engines identically). Narrow per-row projection, no
    shuffle — pipelines into the scan at any scale."""
    emb = _embeddings_double(spark, sf_dir)
    vabs = F.transform(F.col("v"), lambda x: F.abs(x))
    amax = F.aggregate(vabs, F.lit(0.0), lambda a, x: F.greatest(a, x))
    base = emb.select("vec_id", "v", (amax / F.lit(127.0)).alias("scale"))
    qi = lambda x: F.floor(x / F.col("scale") + F.lit(0.5))  # noqa: E731
    err_term = lambda x: (x - qi(x) * F.col("scale")) * (  # noqa: E731
        x - qi(x) * F.col("scale")
    )
    return base.select(
        "vec_id",
        F.size(F.col("v")).alias("dim"),
        F.round(F.col("scale"), 6).alias("scale_r"),
        F.aggregate(
            F.col("v"), F.lit(0).cast("long"), lambda a, x: a + qi(x).cast("long")
        ).alias("q_sum"),
        F.round(
            F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + err_term(x)), 6
        ).alias("err_sq"),
    )


def q_sim_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid in long form (label, pos, centroid component) —
    step 1 of SemDeDup-style semantic dedup and the evaluation pass of
    any clustering: positional explode of the embedding, then a
    decimal-exact mean per (label, dimension).

    Plan shape: explode (narrow, 64× rows) → ONE hash aggregate keyed
    (label, pos) with map-side partials — at 100 TB the exchange carries
    only |labels|×dim partial states per task, not the exploded stream.
    The long-form output IS the scale-correct representation: a
    collect_list-per-label reassembly would funnel every component of a
    label through one task."""
    emb = _embeddings_double(spark, sf_dir)
    ex = emb.select("label", F.posexplode(F.col("v")).alias("pos", "x"))
    return ex.groupBy("label", F.col("pos").cast("int").alias("pos")).agg(
        F.count("*").alias("n_vecs"),
        decimal_avg(F.col("x"), 6).alias("centroid"),
    )


def q_sim_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector squared distance to its label centroid — SemDeDup's
    pruning signal (keep-farthest within a cluster; drop the redundant
    core). Composes q_sim_centroid's long-form mean with a positional
    explode of each vector, joined on (label, pos) and re-aggregated per
    vec_id with decimal-exact sums — aggregation order never touches the
    result, unlike a float fold over shuffled rows.

    Plan shape: the centroid table is |labels|×dim rows (KBs at ANY
    corpus size) → broadcast join onto the exploded stream; one hash
    aggregate keyed vec_id. Rounding: centroid components round to 6
    first (matching q_sim_centroid's published values), then the
    per-component squared deltas go through the same decimal-sum
    discipline."""
    emb = _embeddings_double(spark, sf_dir)
    ex = emb.select(
        "vec_id", "label", F.posexplode(F.col("v")).alias("pos", "x")
    )
    cent = ex.groupBy("label", "pos").agg(
        decimal_avg(F.col("x"), 6).alias("c")
    )
    d = F.col("x") - F.col("c")
    return (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((d * d).cast("decimal(18,6)"))
            .cast("double")
            .alias("dist_sq")
        )
    )


#: every 97th vector plays the benchmark/eval embedding set (mirrors
#: text.py's BENCHMARK_MOD convention for the token-level decontaminator)
BENCH_VEC_MOD = 97
SEMANTIC_DECON_TAU = 0.9


def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-level) benchmark decontamination: drop every
    corpus vector whose cosine to ANY benchmark vector reaches τ=0.9 —
    the modern complement to token n-gram decontamination
    (`text.py::q_decontaminate`), catching paraphrased contamination
    that shares no 3-gram. Output: surviving vectors with their max
    benchmark cosine (value-checked, so the comparison math is verified
    even when nothing crosses τ).

    Plan shape: the benchmark set is eval-suite-sized (|corpus|/97 here;
    KBs against 100 TB), so it BROADCASTS into a nested-loop pairing —
    a deliberate allowlisted NL join, corpus-linear because the inner
    side is a constant: each corpus row scans |bench| vectors once, then
    a vec-keyed max-aggregate (order-insensitive, exact) and a narrow
    filter. The cosine uses the same fold expression as q_sim_topk, so
    DuckDB's list_dot_product reproduces it bitwise."""
    emb = _embeddings_double(spark, sf_dir)
    is_bench = F.col("vec_id") % BENCH_VEC_MOD == 0
    bench = emb.filter(is_bench).select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("bv")
    )
    corpus = emb.filter(~is_bench)
    cos = _dot(F.col("v"), F.col("bv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v")))
        * F.sqrt(_dot(F.col("bv"), F.col("bv")))
    )
    scored = (
        corpus.crossJoin(F.broadcast(bench))
        .groupBy("vec_id", "label")
        .agg(F.max(cos).alias("max_cos"))
    )
    return scored.filter(F.col("max_cos") < F.lit(SEMANTIC_DECON_TAU)).select(
        "vec_id", "label", F.round(F.col("max_cos"), 6).alias("max_bench_cos")
    )


def q_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension profile of the embedding space (count, min, max,
    mean, variance) — the feature-store normalization pass that feeds
    standardization, dead-dimension detection, and quantizer range
    calibration. Complements q_sim_centroid (per-LABEL means): this is
    the global per-dimension view with spread.

    Plan shape: positional explode (narrow, 64× rows) → ONE hash
    aggregate keyed pos with map-side partials — the exchange carries
    64 partial states per task at any corpus size. min/max are exact
    (float compare); mean and E[x²] go through the decimal-sum
    discipline (`decimal_avg`), and the variance is derived from those
    two already-published doubles by a single requantized IEEE
    expression, so addend order can never move any output (SURVEY §7.3
    hard part 5)."""
    emb = _embeddings_double(spark, sf_dir)
    ex = emb.select(F.posexplode(F.col("v")).alias("pos", "x"))
    s = ex.groupBy(F.col("pos").cast("int").alias("pos")).agg(
        F.count("*").alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        decimal_avg(F.col("x"), 6).alias("mean_x"),
        decimal_avg(F.col("x") * F.col("x"), 6).alias("_ex2"),
    )
    var = F.col("_ex2") - F.col("mean_x") * F.col("mean_x")
    return s.select(
        "pos",
        "n",
        "min_x",
        "max_x",
        "mean_x",
        (F.floor(var * 1e6 + F.lit(0.5)) / 1e6).alias("var_x"),
    )


def _dim_moment_partials(emb: DataFrame) -> DataFrame:
    """Per-dimension MERGEABLE moment partials — the stored form of
    q_embed_dim_stats' aggregation state: (pos, n, min_x, max_x,
    s1 = Σ decimal-quantized x, s2 = Σ decimal-quantized x²). Decimal
    sums of per-value-quantized addends are exact, hence associative:
    partials computed over any corpus split merge by plain addition to
    the single-pass values — the property the incremental id's oracle
    pins bit-for-bit."""
    ex = emb.select(F.posexplode(F.col("v")).alias("pos", "x"))
    return ex.groupBy(F.col("pos").cast("int").alias("pos")).agg(
        F.count("*").alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.sum(F.col("x").cast("decimal(18,6)")).alias("s1"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(18,6)")).alias("s2"),
    )


def q_embed_stats_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding-space profile (r13 — the mergeable-state
    discipline on the feature-store surface): the per-dimension stats
    table is maintained from STORED moment partials (a 64-row table
    computed once over the corpus — ``_dim_moment_partials``) merged
    with the new shard's partials, instead of re-scanning the corpus per
    delivery. min/max combine by least/greatest; counts and the
    decimal-quantized Σx / Σx² add EXACTLY (per-value quantization makes
    the decimal sum associative), so the merged mean/variance are
    bit-identical to a full recompute — which is exactly what the
    oracle checks: this id registers against q_embed_dim_stats' oracle
    (one-pass recompute over corpus ∪ shard), so a hash match IS the
    mergeability proof. Per-day cost: one shard scan + a 64-row join;
    publishing divides and quantizes at read time (``decimal_avg``'s
    exact expression), never storing a rounded intermediate."""
    emb = _embeddings_double(spark, sf_dir)
    is_shard = F.col("vec_id") % IVF_SHARD_MOD == 0
    stored = _dim_moment_partials(emb.filter(~is_shard)).localCheckpoint()
    delta = _dim_moment_partials(emb.filter(is_shard))
    c, s = stored.alias("c"), delta.alias("s")
    zero = F.lit(0).cast("decimal(18,6)")
    n = F.coalesce(F.col("c.n"), F.lit(0)) + F.coalesce(F.col("s.n"), F.lit(0))
    total1 = (
        F.coalesce(F.col("c.s1"), zero) + F.coalesce(F.col("s.s1"), zero)
    ).cast("double")
    total2 = (
        F.coalesce(F.col("c.s2"), zero) + F.coalesce(F.col("s.s2"), zero)
    ).cast("double")
    p = F.lit(1e6)
    mean = F.floor(total1 / n * p + F.lit(0.5)) / p
    ex2 = F.floor(total2 / n * p + F.lit(0.5)) / p
    var = F.floor((ex2 - mean * mean) * p + F.lit(0.5)) / p
    return (
        c.join(s, "pos", "full_outer")
        .select(
            "pos",
            n.alias("n"),
            F.least(F.col("c.min_x"), F.col("s.min_x")).alias("min_x"),
            F.greatest(F.col("c.max_x"), F.col("s.max_x")).alias("max_x"),
            mean.cast("double").alias("mean_x"),
            var.alias("var_x"),
        )
    )


#: principal components kept by the PCA projection
PCA_K = 8


def _pca_cov(emb):
    """Distributed moments → driver-side covariance: mapInPandas emits
    per-Arrow-batch PARTIAL (i, j, Σ x_i·x_j) upper-triangle outer
    products plus per-dim sums and a count row, one hash aggregate sums
    them, and ~2k parameter-scale rows collect. Returns (n, mean d-vec,
    d×d covariance) as numpy."""
    import numpy as np

    def moment_partials(batches):
        for pdf in batches:
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            n, d = m.shape
            cov = m.T @ m  # d×d batch outer-product sum
            iu, ju = np.triu_indices(d)
            rows = {
                "i": np.concatenate([iu, np.arange(d), [-1]]),
                "j": np.concatenate([ju, np.full(d, -1), [-1]]),
                "s": np.concatenate([cov[iu, ju], m.sum(axis=0), [float(n)]]),
            }
            yield pd.DataFrame(rows)

    partials = emb.select("v").mapInPandas(
        moment_partials, schema="i int, j int, s double"
    )
    stats = partials.groupBy("i", "j").agg(F.sum("s").alias("s")).collect()
    d = EMB_DIM
    n_total = 0.0
    sums = np.zeros(d)
    cov = np.zeros((d, d))
    for r in stats:
        if r.i == -1:
            n_total = r.s
        elif r.j == -1:
            sums[r.i] = r.s
        else:
            cov[r.i, r.j] = r.s
            cov[r.j, r.i] = r.s
    mean = sums / n_total
    c = cov / n_total - np.outer(mean, mean)
    return n_total, mean, c


def q_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of every embedding onto the top-PCA_K principal
    components — the dimensionality-reduction pass before cheap ANN /
    clustering / visualization. Rows-only by design: eigendecomposition
    is not SQL-expressible; correctness is pinned by property tests
    (projection matches a driver-side numpy PCA up to per-component
    sign, captured variance is monotone non-increasing).

    Scale shape — the whole reduction is ONE pass plus a driver-side
    64×64 eigensolve (the only part that is not data-parallel, and it is
    O(dim³), independent of corpus size):

    1. mapInPandas emits per-Arrow-batch PARTIAL moments in long form —
       (i, j, Σ x_i·x_j) upper-triangle outer products plus (i, -1,
       Σ x_i) sums and one count row — so the shuffle carries
       O(dim²) rows per batch, never the data.
    2. One hash aggregate sums partials into the covariance matrix;
       ~2k rows collect to the driver (parameter-scale, like the IVF
       centroids at `similarity.py:330`).
    3. numpy ``eigh`` on the driver; the top-K eigenvector matrix
       broadcasts back inside a pandas UDF closure and the projection
       is one (batch×64)@(64×K) GEMM per batch — the `_ivf_assign`
       vectorization pattern.

    Components with eigenvector sign are canonicalized (largest-|w|
    coordinate made positive) so output is deterministic across runs
    and partitionings."""
    import numpy as np

    emb = _embeddings_double(spark, sf_dir)
    n_total, mean, c = _pca_cov(emb)
    eigvals, eigvecs = np.linalg.eigh(c)
    order = np.argsort(eigvals)[::-1][:PCA_K]
    w = eigvecs[:, order]  # d×K
    # canonical sign: make the largest-|coordinate| entry positive
    for k in range(w.shape[1]):
        j = int(np.argmax(np.abs(w[:, k])))
        if w[j, k] < 0:
            w[:, k] = -w[:, k]
    wb = w.copy()
    mb = mean.copy()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def project(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy()).astype(np.float64)
        proj = np.round((m - mb) @ wb, 6)
        return pd.Series(list(proj))

    return emb.select("vec_id", "label", project(F.col("v")).alias("components"))


def q_embed_pca_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable companion to q_embed_pca: eigenvectors are
    float-unstable (sign/degeneracy), but the eigendecomposition's
    INVARIANTS are scalars both engines can agree on exactly. Two kinds
    of row, all ``(check_name, value: bigint)``:

    - Moment scalars the oracle RECOMPUTES from the raw embeddings via
      the shared decimal discipline: vector count, covariance trace
      (·1e6) and squared Frobenius norm (·1e12), both assembled from
      per-cell covariances quantized to 6 dp (decimal sums → one IEEE
      division → floor-round — identical cross-engine, the
      q_embed_dim_stats pattern extended to cross moments).
    - Residual rows that must floor to ZERO at the stated tolerance,
      pinning the eigensolve against those independently-verified
      moments: |Σλ − trace| and |Σλ² − ‖C‖²_F| (the two spectral
      identities), max|VᵀV−I| (orthonormality), max|VΛVᵀ−C| (full
      reconstruction), and |float-pipeline trace − decimal-pipeline
      trace| (the bridge that ties the eigensolve's input matrix to the
      oracle-verified numbers). The oracle emits literal 0 for these —
      a broken eigensolve or mis-assembled covariance turns one of them
      nonzero and the value hash reds.

    Scale note: the decimal cross-moment path is explode×d then a
    self-join ×d (data × d² intermediate) — an AUDIT-tier query run on
    samples; the production PCA (q_embed_pca) carries only O(d²) GEMM
    partials per Arrow batch. Verification pays for exactness; the
    fitted pipeline stays cheap."""
    import numpy as np

    emb = _embeddings_double(spark, sf_dir)
    ex = emb.select("vec_id", F.posexplode("v").alias("pos", "x"))
    dims = ex.groupBy("pos").agg(decimal_avg(F.col("x"), 6).alias("mean_x"))
    a = ex.select("vec_id", F.col("pos").alias("i"), F.col("x").alias("xa"))
    b = ex.select("vec_id", F.col("pos").alias("j"), F.col("x").alias("xb"))
    cross = (
        a.join(b, "vec_id")
        .filter(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(decimal_avg(F.col("xa") * F.col("xb"), 6).alias("e_ij"))
    )
    mi = dims.select(F.col("pos").alias("i"), F.col("mean_x").alias("mean_i"))
    mj = dims.select(F.col("pos").alias("j"), F.col("mean_x").alias("mean_j"))
    cq = (
        cross.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            F.floor(
                (F.col("e_ij") - F.col("mean_i") * F.col("mean_j"))
                * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("q"),
        )
    )
    scal = cq.agg(
        F.sum(
            F.when(F.col("i") == F.col("j"), F.col("q")).otherwise(F.lit(0))
        ).alias("trace_q"),
        F.sum(
            F.col("q")
            * F.col("q")
            * F.when(F.col("i") == F.col("j"), F.lit(1)).otherwise(F.lit(2))
        ).alias("frob_q"),
    ).collect()[0]

    n_total, _mean, c = _pca_cov(emb)
    eigvals, eigvecs = np.linalg.eigh(c)
    trace_f = float(np.trace(c))
    frob_f = float((c * c).sum())
    eye_resid = float(np.abs(eigvecs.T @ eigvecs - np.eye(EMB_DIM)).max())
    recon_resid = float(
        np.abs((eigvecs * eigvals) @ eigvecs.T - c).max()
    )

    def _q(x: float, scale: float) -> int:
        return int(np.floor(abs(x) * scale))

    rows = [
        ("n_vectors", int(n_total)),
        ("trace_x1e6", int(scal.trace_q)),
        ("frob_x1e12", int(scal.frob_q)),
        ("eig_trace_resid_x1e6", _q(eigvals.sum() - trace_f, 1e6)),
        ("eig_frob_resid_x1e6", _q((eigvals**2).sum() - frob_f, 1e6)),
        ("orthonormality_resid_x1e6", _q(eye_resid, 1e6)),
        ("reconstruction_resid_x1e6", _q(recon_resid, 1e6)),
        # bridge: float-pipeline trace vs the decimal-quantized trace —
        # ≤ d·(quantization noise) ≈ 1e-4 ≪ the 1e-3 gate
        (
            "decimal_float_trace_resid_x1e3",
            _q(trace_f - scal.trace_q / 1e6, 1e3),
        ),
    ]
    return spark.createDataFrame(rows, "check_name string, value long")


#: hybrid-search parameters: lexical/dense mixing weight and result size
HYBRID_ALPHA = 0.5
HYBRID_TOP_K = 20


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — the modern RAG search topology end to end:
    BM25 (q_text_bm25, composed directly so the lexical stage IS the
    verified operator) generates the candidate set, each candidate's
    embedding is scored by exact cosine against the query vector, and
    the final ranking mixes the two signals:
    ``α·(bm25/max_bm25) + (1−α)·cosine``, top-K with a doc_id
    tie-break.

    Scale shape: candidate generation is the BM25 plan (shuffle bounded
    by query-term postings); the dense stage touches ONLY candidates —
    an equi-join of the candidate ids against the embeddings table, not
    a corpus scan — then a 1-row max broadcast normalizes and
    TakeOrderedAndProject keeps K rows per partition. This is the
    candidate-generate → re-rank cascade every production retrieval
    stack runs; at 100 TB the dense side would be the ANN index
    (q_sim_ann_lsh), exactly as the dedup tiers pair exact oracles with
    sketch twins. Determinism: the cosine uses the left-to-right fold
    (bitwise equal to DuckDB's list_dot_product), the mix is one IEEE
    expression requantized to 6 dp, and only docs WITH embeddings rank
    (inner join — the dense index's coverage is part of the contract)."""
    from breweries_case_spark.operators.text import q_text_bm25

    bm = q_text_bm25(spark, sf_dir)
    qv = _query_vector(spark, sf_dir)
    qnorm = _norm_py(qv)
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    emb = _embeddings_double(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "v"
    )
    cos = _dot(F.col("v"), qlit) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.lit(qnorm)
    )
    mx = bm.agg(F.max("bm25").alias("_max_bm25"))
    hybrid = (
        F.lit(HYBRID_ALPHA) * (F.col("bm25") / F.col("_max_bm25"))
        + F.lit(1.0 - HYBRID_ALPHA) * cos
    )
    return (
        bm.join(emb, "doc_id")
        .crossJoin(F.broadcast(mx))
        .select(
            "doc_id",
            "bm25",
            (F.floor(cos * 1e6 + F.lit(0.5)) / 1e6).alias("cosine"),
            (F.floor(hybrid * 1e6 + F.lit(0.5)) / 1e6).alias("hybrid_score"),
        )
        .orderBy(F.col("hybrid_score").desc(), "doc_id")
        .limit(HYBRID_TOP_K)
    )


QUERIES = {
    "q_embed_normalize": q_embed_normalize,
    "q_sim_topk": q_sim_topk,
    "q_sim_mmr": q_sim_mmr,
    "q_sim_ann_recall": q_sim_ann_recall,
    "q_sim_ivf_recall": q_sim_ivf_recall,
    "q_sim_ann_lsh": q_sim_ann_lsh,
    "q_sim_knn_join": q_sim_knn_join,
    "q_sim_hard_negatives": q_sim_hard_negatives,
    "q_sim_knn_join_ann": q_sim_knn_join_ann,
    "q_sim_ivf": q_sim_ivf,
    "q_sim_ivf_trained": q_sim_ivf_trained,
    "q_sim_ivf_incremental": q_sim_ivf_incremental,
    "q_sim_ivf_maintain": q_sim_ivf_maintain,
    "q_sim_ivf_incremental_recall": q_sim_ivf_incremental_recall,
    "q_embed_quantize": q_embed_quantize,
    "q_sim_centroid": q_sim_centroid,
    "q_sim_centroid_distance": q_sim_centroid_distance,
    "q_decontaminate_semantic": q_decontaminate_semantic,
    "q_embed_dim_stats": q_embed_dim_stats,
    "q_embed_stats_incremental": q_embed_stats_incremental,
    "q_embed_pca": q_embed_pca,
    "q_embed_pca_invariants": q_embed_pca_invariants,
    "q_hybrid_search": q_hybrid_search,
}


def _mmr_oracle() -> str:
    """The MMR greedy unrolled as a generated MMR_K-step CTE chain (the
    q_bpe_train_k idiom): sel_k = sel_{k-1} plus the argmax of
    λ·r − (1−λ)·max-sim-to-selected over the unpicked candidates, with
    the identical FLOOR-quantized relevance/sims and (score DESC,
    vec_id) tie order as the driver-side loop."""
    lam, oml = MMR_LAMBDA, MMR_ONE_MINUS_LAMBDA
    # every chained CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    # sel_k references sel_{k-1} three times — un-materialized, the
    # K-step chain inlines the base scan 3^K times (observed as EMFILE
    # from thousands of parquet re-opens)
    ctes = [
        f"""
        e AS MATERIALIZED (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
        q AS MATERIALIZED (
            SELECT v AS qv, sqrt(list_dot_product(v, v)) AS qn
            FROM e WHERE vec_id = {QUERY_VEC_ID}),
        cand AS MATERIALIZED (
            SELECT vec_id, v,
                   FLOOR(list_dot_product(v, q.qv)
                         / (sqrt(list_dot_product(v, v)) * q.qn)
                         * 1e6 + 0.5) / 1e6 AS r
            FROM e, q WHERE vec_id <> {QUERY_VEC_ID}
            ORDER BY r DESC, vec_id LIMIT {MMR_CANDIDATES}),
        sims AS MATERIALIZED (
            SELECT a.vec_id AS ia, b.vec_id AS ib,
                   FLOOR(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v)))
                         * 1e6 + 0.5) / 1e6 AS s
            FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
        sel1 AS MATERIALIZED (
            SELECT 1 AS rank, vec_id, r, {lam} * r AS score
            FROM cand ORDER BY {lam} * r DESC, vec_id LIMIT 1)"""
    ]
    prev = "sel1"
    for k in range(2, MMR_K + 1):
        ctes.append(
            f"""
        pick{k} AS MATERIALIZED (
            SELECT c.vec_id, c.r,
                   {lam} * c.r - {oml} * (
                       SELECT MAX(s.s) FROM sims s
                       JOIN {prev} p ON s.ia = c.vec_id
                                    AND s.ib = p.vec_id) AS score
            FROM cand c
            WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
            ORDER BY score DESC, c.vec_id LIMIT 1),
        sel{k} AS MATERIALIZED (
            SELECT * FROM {prev}
            UNION ALL
            SELECT {k}, vec_id, r, score FROM pick{k})"""
        )
        prev = f"sel{k}"
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
        SELECT CAST(rank AS INT) AS rank, vec_id, r AS relevance,
               FLOOR(score * 1e6 + 0.5) / 1e6 AS mmr_score
        FROM {prev}"""
    )


def _hybrid_oracle() -> str:
    from breweries_case_spark.operators.text import BM25_ORACLE_CTES

    return f"""
        WITH {BM25_ORACLE_CTES},
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
        e AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
        joined AS (
            SELECT bm.doc_id, bm.bm25,
                   list_dot_product(e.v, q.qv)
                       / (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(q.qv, q.qv))) AS cos
            FROM bm JOIN e USING (doc_id) CROSS JOIN q),
        mx AS (SELECT MAX(bm25) AS max_bm25 FROM bm)
        SELECT doc_id, bm25,
               FLOOR(cos * 1e6 + 0.5) / 1e6 AS cosine,
               FLOOR(({HYBRID_ALPHA} * (bm25 / max_bm25)
                      + {1.0 - HYBRID_ALPHA} * cos) * 1e6 + 0.5) / 1e6
                   AS hybrid_score
        FROM joined CROSS JOIN mx
        ORDER BY hybrid_score DESC, doc_id LIMIT {HYBRID_TOP_K}
    """


ORACLES = {
    "q_hybrid_search": _hybrid_oracle(),
    "q_sim_mmr": _mmr_oracle(),
    # hard negatives: same unrounded-cosine window-rank contract as the
    # kNN join, with the batch equi-key and label-inequality pair filter
    "q_sim_hard_negatives": f"""
        WITH e AS (
            SELECT vec_id, label,
                   CAST(vec_id // {HN_BATCH} AS BIGINT) AS batch_id,
                   CAST(embedding AS DOUBLE[]) AS v,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])))
                       AS norm
            FROM embeddings),
        pairs AS (
            SELECT a.vec_id AS anchor_id, a.batch_id,
                   a.label AS anchor_label,
                   b.vec_id AS negative_id, b.label AS negative_label,
                   list_dot_product(a.v, b.v) / (a.norm * b.norm)
                       AS cos_raw,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY list_dot_product(a.v, b.v)
                                / (a.norm * b.norm) DESC,
                                b.vec_id) AS rn
            FROM e a JOIN e b
              ON a.batch_id = b.batch_id AND a.label <> b.label)
        SELECT anchor_id, batch_id, anchor_label, negative_id,
               negative_label,
               FLOOR(cos_raw * 1e6 + 0.5) / 1e6 AS neg_cosine
        FROM pairs WHERE rn = 1
    """,
    "q_embed_quantize": """
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        s AS (
            SELECT vec_id, v,
                   list_reduce(
                       list_prepend(0.0, list_transform(v, x -> abs(x))),
                       (a, x) -> greatest(a, x)) / 127.0 AS scale
            FROM e)
        SELECT vec_id,
               CAST(len(v) AS INT) AS dim,
               ROUND(scale, 6) AS scale_r,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(v,
                           x -> CAST(FLOOR(x / scale + 0.5) AS BIGINT))),
                   (a, x) -> a + x) AS q_sum,
               ROUND(list_reduce(
                   list_prepend(0.0, list_transform(v,
                       x -> (x - FLOOR(x / scale + 0.5) * scale)
                            * (x - FLOOR(x / scale + 0.5) * scale))),
                   (a, x) -> a + x), 6) AS err_sq
        FROM s
    """,
    "q_decontaminate_semantic": f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
        bench AS (
            SELECT vec_id AS b_id, v AS bv FROM e
            WHERE vec_id % {BENCH_VEC_MOD} = 0),
        scored AS (
            SELECT c.vec_id, c.label,
                   MAX(list_dot_product(c.v, b.bv)
                       / (sqrt(list_dot_product(c.v, c.v))
                          * sqrt(list_dot_product(b.bv, b.bv)))) AS max_cos
            FROM e c, bench b
            WHERE c.vec_id % {BENCH_VEC_MOD} <> 0
            GROUP BY 1, 2)
        SELECT vec_id, label, ROUND(max_cos, 6) AS max_bench_cos
        FROM scored WHERE max_cos < {SEMANTIC_DECON_TAU}
    """,
    "q_sim_centroid_distance": """
        WITH ex AS (
            SELECT vec_id, label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings),
        cent AS (
            SELECT label, pos,
                   CAST(FLOOR(SUM(CAST(x AS DECIMAL(18,6))) / COUNT(x)
                              * 1000000.0 + 0.5) / 1000000.0
                        AS DOUBLE) AS c
            FROM ex GROUP BY 1, 2)
        SELECT ex.vec_id, ex.label,
               CAST(SUM(CAST((ex.x - cent.c) * (ex.x - cent.c)
                             AS DECIMAL(18,6))) AS DOUBLE) AS dist_sq
        FROM ex JOIN cent USING (label, pos)
        GROUP BY 1, 2
    """,
    "q_embed_dim_stats": """
        WITH ex AS (
            SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings),
        s AS (
            SELECT pos, COUNT(*) AS n, MIN(x) AS min_x, MAX(x) AS max_x,
                   CAST(FLOOR(SUM(CAST(x AS DECIMAL(18,6))) / COUNT(x)
                              * 1000000.0 + 0.5) / 1000000.0
                        AS DOUBLE) AS mean_x,
                   CAST(FLOOR(SUM(CAST(x * x AS DECIMAL(18,6))) / COUNT(x)
                              * 1000000.0 + 0.5) / 1000000.0
                        AS DOUBLE) AS ex2
            FROM ex GROUP BY 1)
        SELECT pos, n, min_x, max_x, mean_x,
               FLOOR((ex2 - mean_x * mean_x) * 1e6 + 0.5) / 1e6 AS var_x
        FROM s
    """,
    # Moment rows recomputed from raw embeddings via the shared decimal
    # discipline; residual rows are literal 0 — the Spark side must land
    # its eigensolve residuals under the stated tolerance to hash-match.
    # Outer BIGINT cast on value: the UNION ALL mixes HUGEINT SUMs with
    # integer literals, and DuckDB's HUGEINT coerces to float64 on any
    # pandas .df() bridge (the r5 driver red) — the cast keeps every row
    # int64, matching Spark's long.
    "q_embed_pca_invariants": """
        SELECT check_name, CAST(value AS BIGINT) AS value FROM (
        WITH ex AS (
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings),
        dims AS (
            SELECT pos,
                   CAST(FLOOR(SUM(CAST(x AS DECIMAL(18,6))) / COUNT(x)
                              * 1000000.0 + 0.5) / 1000000.0
                        AS DOUBLE) AS mean_x
            FROM ex GROUP BY 1),
        cross_m AS (
            SELECT a.pos AS i, b.pos AS j,
                   CAST(FLOOR(SUM(CAST(a.x * b.x AS DECIMAL(18,6)))
                              / COUNT(*) * 1000000.0 + 0.5) / 1000000.0
                        AS DOUBLE) AS e_ij
            FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.pos <= b.pos
            GROUP BY 1, 2),
        cq AS (
            SELECT i, j,
                   CAST(FLOOR((e_ij - di.mean_x * dj.mean_x) * 1000000.0
                              + 0.5) AS BIGINT) AS q
            FROM cross_m
            JOIN dims di ON di.pos = i
            JOIN dims dj ON dj.pos = j),
        agg AS (
            SELECT SUM(CASE WHEN i = j THEN q ELSE 0 END) AS trace_q,
                   SUM(q * q * CASE WHEN i = j THEN 1 ELSE 2 END) AS frob_q
            FROM cq)
        SELECT 'n_vectors' AS check_name,
               (SELECT COUNT(*) FROM embeddings) AS value
        UNION ALL SELECT 'trace_x1e6', trace_q FROM agg
        UNION ALL SELECT 'frob_x1e12', frob_q FROM agg
        UNION ALL SELECT 'eig_trace_resid_x1e6', 0
        UNION ALL SELECT 'eig_frob_resid_x1e6', 0
        UNION ALL SELECT 'orthonormality_resid_x1e6', 0
        UNION ALL SELECT 'reconstruction_resid_x1e6', 0
        UNION ALL SELECT 'decimal_float_trace_resid_x1e3', 0
        ) AS _typed
    """,
    "q_sim_centroid": """
        WITH ex AS (
            SELECT label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings)
        SELECT label, pos, COUNT(*) AS n_vecs,
               CAST(FLOOR(SUM(CAST(x AS DECIMAL(18,6))) / COUNT(x)
                          * 1000000.0 + 0.5) / 1000000.0
                    AS DOUBLE) AS centroid
        FROM ex GROUP BY 1, 2
    """,
    "q_embed_normalize": """
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT vec_id,
               ROUND(sqrt(list_dot_product(v, v)), 6) AS l2_norm,
               ROUND(list_dot_product(v, list_transform(v, x -> 1.0))
                     / sqrt(list_dot_product(v, v)), 6) AS unit_sum
        FROM e
    """,
    "q_sim_topk": f"""
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
            WHERE vec_id = {QUERY_VEC_ID})
        SELECT vec_id,
               ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), q.qv)
                     / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
        FROM embeddings, q
        WHERE vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine DESC, vec_id
        LIMIT {TOP_K}
    """,
    # q_sim_ann_lsh: rows-only (probabilistic recall); recall vs exact
    # top-k pinned by unit test AND the q_sim_ann_recall certificate.
    "q_sim_ann_recall": f"""
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
            WHERE vec_id = {QUERY_VEC_ID}),
        exact AS (
            SELECT vec_id FROM (
                SELECT vec_id,
                       ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), q.qv)
                             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                      CAST(embedding AS DOUBLE[])))
                                * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
                FROM embeddings, q
                WHERE vec_id <> {QUERY_VEC_ID}
                ORDER BY cosine DESC, vec_id
                LIMIT {TOP_K}))
        SELECT 'exact_topk_rows' AS check_name,
               CAST(COUNT(*) AS BIGINT) AS value FROM exact
        UNION ALL SELECT 'lsh_hits_outside_probe_radius', 0
        UNION ALL SELECT 'lsh_overlap_deficit', 0
        UNION ALL SELECT 'ivf_overlap_deficit', 0
        UNION ALL SELECT 'ivf_trained_overlap_deficit', 0
    """,
    # IVF structural certificate: result sizes re-derived from the raw
    # table (both variants must fill the full top-k — the probed cells
    # hold ≥ k vectors at every driver sf); the cross-implementation and
    # cell-prune violations are literal 0 — the Spark side must land a
    # row-for-row GEMM/HOF assignment agreement and probe-set containment
    # to hash-match.
    "q_sim_ivf_recall": f"""
        WITH n AS (SELECT COUNT(*) AS c FROM embeddings)
        SELECT 'ivf_rows' AS check_name,
               CAST(LEAST({TOP_K}, c - 1) AS BIGINT) AS value FROM n
        UNION ALL SELECT 'ivf_trained_rows',
               CAST(LEAST({TOP_K}, c - 1) AS BIGINT) FROM n
        UNION ALL SELECT 'assign_gemm_expr_mismatch', 0
        UNION ALL SELECT 'ivf_hits_outside_probe', 0
        UNION ALL SELECT 'ivf_trained_hits_outside_probe', 0
    """,
    # incremental IVF maintainer: the stored state (corpus seed
    # centroids = the IVF_CENTROIDS lowest-vec_id corpus vectors) is
    # SQL-derivable, so cells, quantized cosines, and loads are all
    # closed-form — full value hash on both maintainer ids
    "q_sim_ivf_incremental": f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
        cents AS (
            SELECT vec_id AS cid, v AS cv FROM e
            WHERE vec_id % {IVF_SHARD_MOD} <> 0
            ORDER BY vec_id LIMIT {IVF_CENTROIDS}),
        scored AS (
            SELECT s.vec_id, c.cid,
                   FLOOR(list_dot_product(s.v, c.cv)
                         / (sqrt(list_dot_product(s.v, s.v))
                            * sqrt(list_dot_product(c.cv, c.cv)))
                         * 1e6 + 0.5) / 1e6 AS cos
            FROM e s CROSS JOIN cents c
            WHERE s.vec_id % {IVF_SHARD_MOD} = 0)
        SELECT vec_id, cell, cosine FROM (
            SELECT vec_id, cid AS cell, cos AS cosine,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, cid DESC) AS rk
            FROM scored)
        WHERE rk = 1
    """,
    "q_sim_ivf_maintain": f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
        cents AS (
            SELECT vec_id AS cid, v AS cv FROM e
            WHERE vec_id % {IVF_SHARD_MOD} <> 0
            ORDER BY vec_id LIMIT {IVF_CENTROIDS}),
        assigned AS (
            SELECT vec_id, is_shard, cid FROM (
                SELECT s.vec_id, s.vec_id % {IVF_SHARD_MOD} = 0 AS is_shard,
                       c.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY FLOOR(list_dot_product(s.v, c.cv)
                                          / (sqrt(list_dot_product(s.v, s.v))
                                             * sqrt(list_dot_product(c.cv, c.cv)))
                                          * 1e6 + 0.5) / 1e6 DESC,
                                    c.cid DESC) AS rk
                FROM e s CROSS JOIN cents c)
            WHERE rk = 1),
        loads AS (
            SELECT c.cid AS cell,
                   CAST(COALESCE(SUM(CASE WHEN NOT a.is_shard THEN 1 END), 0)
                        AS BIGINT) AS corpus_n,
                   CAST(COALESCE(SUM(CASE WHEN a.is_shard THEN 1 END), 0)
                        AS BIGINT) AS shard_n
            FROM cents c LEFT JOIN assigned a ON a.cid = c.cid
            GROUP BY c.cid),
        tot AS (SELECT COUNT(*) AS n FROM e)
        SELECT cell, corpus_n, shard_n,
               corpus_n + shard_n AS post_n,
               FLOOR((corpus_n + shard_n) / CAST(n AS DOUBLE) * 1e6 + 0.5)
                   / 1e6 AS post_frac,
               CAST(CASE WHEN FLOOR((corpus_n + shard_n) / CAST(n AS DOUBLE)
                                    * 1e6 + 0.5) / 1e6
                              > {IVF_REBALANCE_MAX_FRAC}
                         THEN 1 ELSE 0 END AS BIGINT) AS retrain
        FROM loads CROSS JOIN tot
    """,
    # recall certificate: the anchor is closed-form; the four
    # deficit/violation counts are literal 0 — the Spark side must land
    # serving-recall floors for BOTH centroid sets, probe-set
    # containment, and quantized-vs-GEMM assignment agreement to
    # hash-match (the q_sim_ann_recall pattern)
    "q_sim_ivf_incremental_recall": f"""
        WITH n AS (SELECT COUNT(*) AS c FROM embeddings)
        SELECT 'exact_topk_rows' AS check_name,
               CAST(LEAST({TOP_K}, c - 1) AS BIGINT) AS value FROM n
        UNION ALL SELECT 'stored_overlap_deficit', 0
        UNION ALL SELECT 'retrained_overlap_deficit', 0
        UNION ALL SELECT 'retrain_regression_excess', 0
        UNION ALL SELECT 'stored_hits_outside_probe', 0
        UNION ALL SELECT 'incremental_assign_mismatch', 0
    """,
    "q_sim_knn_join": f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings),
        pairs AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   a.label AS label,
                   list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos_exact
            FROM e a JOIN e b
              ON a.label = b.label AND a.vec_id <> b.vec_id)
        SELECT query_id, neighbor_id, label,
               ROUND(cos_exact, 6) AS cosine, rank
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_exact DESC, neighbor_id) AS rank
              FROM pairs)
        WHERE rank <= {KNN_K}
    """,
}

# incremental embed stats: the merged partials must be bit-identical to
# the one-pass recompute — same oracle as the batch id IS the
# mergeability proof
ORACLES["q_embed_stats_incremental"] = ORACLES["q_embed_dim_stats"]
