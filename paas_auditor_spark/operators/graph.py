"""Graph analytics over relational edge sets — PageRank, triangle counts.

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
    if n == 0:
        # empty slice: an empty (node, rank) frame, not ZeroDivisionError
        return nodes.select(
            "node", F.lit(0.0).alias("rank")
        )
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


def triangle_counts(
    edges_df: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, n_triangles) for every node that closes ≥1 triangle.

    Degree-ordered orientation (Schank–Wagner forward algorithm; the
    MapReduce form is Suri & Vassilvitskii, WWW'11): treat the edge set
    as undirected, orient every edge from the lower-ranked endpoint to
    the higher, ranking nodes by (degree, node).  The oriented
    out-degree is O(√m), so the wedge self-join generates
    Σ outdeg(v)² = O(m^1.5) candidate wedges instead of Σ deg(v)² —
    on a skewed graph the difference is the whole game: a hub with
    degree 10⁶ contributes zero wedges as a wedge CENTER because all
    its edges point INTO it.  Each triangle {a,b,c} with rank
    a<b<c appears exactly once, as wedge (b,c) centered at a closed by
    oriented edge b→c.

    Shuffle plan: two node-keyed joins to attach endpoint degrees, one
    src-keyed self-join for wedges, one (src,dst)-keyed equi-join to
    close them, one node-keyed count.  No driver collect; nothing is
    ever materialized beyond the wedge stream, which Catalyst pipelines
    into the closing join.
    """
    a, b = F.col(src_col), F.col(dst_col)
    e = (
        edges_df.select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    # rank(u) < rank(v) ⇔ (deg u, u) < (deg v, v); struct comparison is
    # lexicographic, which is exactly the total order we need
    ra = F.struct(F.col("da").alias("d"), F.col("a").alias("n"))
    rb = F.struct(F.col("db").alias("d"), F.col("b").alias("n"))
    oriented = ed.select(
        F.when(ra < rb, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(ra < rb, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(ra < rb, rb).otherwise(ra).alias("dst_rank"),
    ).localCheckpoint(eager=False)
    o1 = oriented.select(
        F.col("src").alias("ctr"),
        F.col("dst").alias("x"),
        F.col("dst_rank").alias("xr"),
    )
    o2 = oriented.select(
        F.col("src").alias("ctr"),
        F.col("dst").alias("y"),
        F.col("dst_rank").alias("yr"),
    )
    wedges = o1.join(o2, "ctr").filter(F.col("xr") < F.col("yr"))
    closed = wedges.join(
        oriented.select(
            F.col("src").alias("x"), F.col("dst").alias("y")
        ),
        ["x", "y"],
    ).select("ctr", "x", "y")
    nodes = (
        closed.select(F.col("ctr").alias("node"))
        .unionAll(closed.select(F.col("x").alias("node")))
        .unionAll(closed.select(F.col("y").alias("node")))
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


__all__ = ["pagerank", "triangle_counts"]
