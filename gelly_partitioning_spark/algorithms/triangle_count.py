"""Triangle count — relational 3-join with degree orientation.

Reference: example/TriangleCount.java:28-91 / NodeSplittingTriangleCount
(2-superstep higher-id wedge propagation). Golden:
util/TriangleCountData.java:31 = 3. SURVEY.md §3.3: only the count must
match — the idiomatic, scalable Spark form is the canonical-edge self-join.

Skew strategy — *degree orientation* instead of hub salting: orient every
undirected simple edge from the lower-(degree, id) endpoint to the higher
one. Every triangle then has exactly one wedge at its lowest-ranked vertex,
and the per-vertex wedge fan-out is bounded by the graph's degeneracy
(out-degree after orientation), not by raw hub degree — a degree-10^8 hub
generates *zero* wedges from its own adjacency because nearly all its edges
point *into* it. This subsumes what the reference's node splitting buys for
its wedge gather, with one fewer shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import canonical_edges, normalize_edges


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Canonical simple edges re-oriented low→high by (degree, id)."""
    canon = canonical_edges(edges)
    deg = (
        canon.select(F.col("src").alias("id"))
        .unionByName(canon.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    e = (
        canon.join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "sd"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "dd"), "dst")
    )
    lower_first = (F.col("sd") < F.col("dd")) | (
        (F.col("sd") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Single-row DataFrame (triangles: long) — global triangle count."""
    edges = normalize_edges(edges)
    canon = canonical_edges(edges).localCheckpoint(eager=True)
    o = oriented_edges(edges).localCheckpoint(eager=True)
    # wedges at the lowest-ranked vertex: (a→b, a→c), one unordered pair
    # per wedge via id-order b < c
    w = (
        o.alias("x")
        .join(o.alias("y"), F.col("x.lo") == F.col("y.lo"))
        .filter(F.col("x.hi") < F.col("y.hi"))
        .select(F.col("x.hi").alias("src"), F.col("y.hi").alias("dst"))
    )
    # close the wedge against the id-canonical edge set — pure equi-join on
    # (src, dst), shuffle-hash/SMJ friendly, no OR predicate
    tri = w.join(canon, ["src", "dst"], "inner")
    return tri.agg(F.count("*").cast("long").alias("triangles"))
