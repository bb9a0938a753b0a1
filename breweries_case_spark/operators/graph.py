"""Graph analytics beyond connected components (which lives with dedup —
``operators/dedup.py::connected_components{,_star}``): weighted PageRank
over the event-type transition graph.

The graph: nodes are event types, a directed edge (src → dst) carries the
count of observed per-user transitions (the q_event_transitions matrix),
row-normalized into transition probabilities. PageRank over it ranks
event types by behavioral centrality — the same computation over a
user-interaction or document-link graph at 100 TB is the classic Spark
iterative workload.

Determinism (the iterative twist on SURVEY §7.3 hard part 5): each
iteration's rank is re-quantized with the repo's FLOOR(x·10^12 + 0.5)
rounding, and the per-node mass sum runs through decimal(18,12)
per-addend sums — so iteration k+1 starts from bit-identical inputs on
both engines, and divergence cannot compound. The oracle UNROLLS the
three iterations as chained CTEs (recursive CTEs cannot aggregate in the
recursive member).

Scale notes: each iteration is one edge-keyed join + one dst-keyed
aggregate — the standard Pregel-as-DataFrame shape. The plan grows
linearly with iterations; for big graphs / many rounds the lineage must
be cut per round (``localCheckpoint``, exactly as
``connected_components`` at ``dedup.py`` does); at 3 rounds the plan is
small enough to leave uncut so Catalyst sees the whole pipeline.
Dangling nodes (no out-edges) get no redistribution here — the event
graph is strongly connected in practice; a web-scale variant adds the
dangling-mass term as one extra scalar aggregate per round."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from breweries_case_spark.io.reader import load_table

DAMPING = 0.85
N_ITERATIONS = 3
RANK_SCALE = 1e12  # per-iteration re-quantization (FLOOR(x*1e12 + 0.5))


def _requantize(col):
    return (F.floor(col * F.lit(RANK_SCALE) + F.lit(0.5)) / F.lit(RANK_SCALE)).cast(
        "double"
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration weighted PageRank over event-type transitions."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    out_tot = counts.groupBy("src").agg(F.sum("n").alias("tot"))
    edges = counts.join(out_tot, "src").select(
        "src", "dst", (F.col("n").cast("double") / F.col("tot")).alias("w")
    )
    nodes = (
        counts.select(F.col("src").alias("node"))
        .unionByName(counts.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count("*").cast("double").alias("n_nodes"))
    base = nodes.crossJoin(n_nodes)  # 1-row broadcast scalar

    ranks = base.select(
        "node", "n_nodes", _requantize(F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(N_ITERATIONS):
        mass = (
            edges.join(ranks, edges.src == ranks.node)
            .groupBy(edges.dst.alias("node"))
            .agg(
                F.sum((F.col("rank") * F.col("w")).cast("decimal(18,12)"))
                .cast("double")
                .alias("acc")
            )
        )
        ranks = (
            base.join(mass, "node", "left")
            .select(
                "node",
                "n_nodes",
                _requantize(
                    (F.lit(1.0) - F.lit(DAMPING)) / F.col("n_nodes")
                    + F.lit(DAMPING) * F.coalesce(F.col("acc"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select(F.col("node").alias("event_type"), "rank")


def _oracle_iteration(prev: str, cur: str) -> str:
    return f"""
        {cur} AS (
            SELECT b.node, b.n_nodes,
                   FLOOR(((1.0 - {DAMPING}) / b.n_nodes
                          + {DAMPING} * COALESCE(m.acc, 0.0)) * 1e12 + 0.5)
                       / 1e12 AS rank
            FROM base b LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(SUM(CAST(p.rank * e.w AS DECIMAL(18,12)))
                            AS DOUBLE) AS acc
                FROM edges e JOIN {prev} p ON e.src = p.node
                GROUP BY e.dst) m USING (node))"""


QUERIES = {
    "q_pagerank": q_pagerank,
}

ORACLES = {
    "q_pagerank": f"""
        WITH seq AS (
            SELECT event_type AS src,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS dst
            FROM events),
        counts AS (
            SELECT src, dst, COUNT(*) AS n FROM seq
            WHERE dst IS NOT NULL GROUP BY 1, 2),
        edges AS (
            SELECT src, dst,
                   CAST(n AS DOUBLE)
                       / SUM(n) OVER (PARTITION BY src) AS w
            FROM counts),
        nodes AS (
            SELECT src AS node FROM counts
            UNION SELECT dst FROM counts),
        base AS (
            SELECT node,
                   (SELECT CAST(COUNT(*) AS DOUBLE) FROM nodes) AS n_nodes
            FROM nodes),
        it0 AS (
            SELECT node, n_nodes,
                   FLOOR((1.0 / n_nodes) * 1e12 + 0.5) / 1e12 AS rank
            FROM base),{_oracle_iteration("it0", "it1")},{_oracle_iteration("it1", "it2")},{_oracle_iteration("it2", "it3")}
        SELECT node AS event_type, rank FROM it3
    """,
}
