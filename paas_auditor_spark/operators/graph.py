"""Graph centrality over relational edge sets — PageRank.

Beyond reference parity (the reference has no graph surface); with
connected components (operators/dedup.py) this completes the graph
operator family a curation pipeline uses: CC for near-dup clustering,
PageRank for authority/quality weighting of interlinked corpora (the
Common-Crawl-style signal: rank hosts/documents by the link graph and
feed the score into the quality gate).

Scale design: each iteration is ONE join (ranks ⋈ out-edges on src) and
ONE aggregation (contributions by dst) — both shuffle on node keys with
map-side combine; the rank vector is |V| rows (node, double), never
collected.  The edge relation with out-degrees attached is computed once
and checkpointed; per-iteration ``localCheckpoint`` cuts lineage so the
plan stays O(1) deep regardless of iteration count (same discipline as
k-means / connected components).  Hot nodes (Zipf in-degree) are exactly
the skew AQE's skew-join splitting targets.

Variant implemented: the standard damped update

    r_{t+1}(v) = (1 − d)/N + d · Σ_{u→v} r_t(u) / outdeg(u)

with dangling-node mass DROPPED (ranks need not sum to 1) — the common
simplification that is exactly reproducible in plain SQL, which is what
makes the unrolled-CTE DuckDB oracle exact rather than approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges_df: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(node, rank) after ``iterations`` damped power-iteration rounds.

    Edges are deduplicated; every endpoint is a node (sinks keep
    receiving rank, sources with no in-edges decay toward (1−d)/N).
    ``checkpoint_every`` bounds plan depth: a lazy ``localCheckpoint``
    every K rounds cuts lineage while letting Catalyst fuse the rounds
    in between.
    """
    edges = (
        edges_df.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # one scalar driver action, like k-means' k
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # out-edges with degree attached: the per-iteration join's static side
    out_edges = edges.join(deg, "src").localCheckpoint(eager=False)

    base = 1.0 / n
    teleport = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(base).alias("rank"))
    for it in range(iterations):
        contribs = (
            out_edges.join(ranks, out_edges["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


__all__ = ["pagerank"]
