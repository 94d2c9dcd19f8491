"""Jaccard similarity per edge: J(a,b) = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|.

Reference: example/JaccardSimilarityMeasure.java:20-59, library/Jaccard.java
(per-vertex maps) and library/GSAJaccard.java (per-edge values). Goldens:
util/JaccardSimilarityMeasureData.java:33-40 (e.g. J(1,2)=1/3, J(7,8)=0.0).

The reference materializes neighbor HashSets per vertex and derives the
intersection arithmetically from set sizes (library/Jaccard.java:142-150:
|∩| = |A| + |B| − |A∪B|). Relational re-expression (no sets materialized —
the hub's neighbor set never lives in one task):

  common(a,b) = #common neighbors of edge (a,b) = #triangles through (a,b)
  J(a,b)      = common / (deg(a) + deg(b) − common)

restricted to actual edges (a,b); edges with no common neighbor get 0.0 via
left join + coalesce.

Because J is only needed for pairs that ARE edges, the wedge count per
pair equals the triangle count through that edge — so common() is
computed with the same degree-oriented enumeration as triangle_count
(each triangle found ONCE at its lowest-(degree,id) vertex, wedge
fan-out bounded by degeneracy², not hub²), then each triangle is
credited to its 3 edges. The naive undirected wedge self-join generates
deg(w)² rows through every hub w — the round-1 scale gap this replaces.
Per-vertex map flavor: ``jaccard_vertex`` collects the per-edge rows
into a map (reference JACCARD_VERTICES golden).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import canonical_edges, degrees, normalize_edges
from .triangle_count import oriented_edges


def edge_common_neighbors(canon: DataFrame) -> DataFrame:
    """(src, dst, common) — common-neighbor count per id-canonical edge,
    via degree-oriented triangle enumeration (triangle_count.py).

    Each triangle (v, b, c) found once (v = lowest-(degree,id) corner,
    b < c by id) contributes one common neighbor to each of its 3 edges.
    """
    # materialize the canonical set once: the orientation pass and the
    # wedge-close join below both consume it (guide §1.2 — without this
    # the upstream plan, e.g. the co-occurrence self-join + distinct, runs
    # twice), and it is already id-canonical by contract
    canon = canon.localCheckpoint(eager=True)
    o = oriented_edges(canon, already_canonical=True).localCheckpoint(eager=True)
    w = (
        o.alias("x")
        .join(o.alias("y"), F.col("x.lo") == F.col("y.lo"))
        .filter(F.col("x.hi") < F.col("y.hi"))
        .select(F.col("x.lo").alias("v"), F.col("x.hi").alias("b"), F.col("y.hi").alias("c"))
    )
    # Examined in r6: THREE consumers below (one per triangle corner)
    # and the static plan carries the wedge/close subtree thrice — but a
    # lazy checkpoint of tri measured NO warm-time change in a
    # same-window A/B (AQE's runtime stage reuse already deduplicates
    # the shuffle work), while caching a (#triangles)-row set is a real
    # memory liability at scale. Deliberately left uncached.
    tri = w.join(
        canon.select(F.col("src").alias("b"), F.col("dst").alias("c")), ["b", "c"]
    )
    per_edge = (
        tri.select(F.col("b").alias("src"), F.col("c").alias("dst"))
        .unionAll(tri.select(F.least("v", "b").alias("src"), F.greatest("v", "b").alias("dst")))
        .unionAll(tri.select(F.least("v", "c").alias("src"), F.greatest("v", "c").alias("dst")))
    )
    return per_edge.groupBy("src", "dst").agg(F.count("*").cast("long").alias("common"))


def jaccard(edges: DataFrame) -> DataFrame:
    """(src, dst, jaccard) for each canonical undirected edge."""
    edges = normalize_edges(edges)
    canon = (
        canonical_edges(edges).withColumn("w", F.lit(1.0)).localCheckpoint(eager=True)
    )
    # two consumers (the src- and dst-side degree attachments) — one
    # vertex-sized materialization instead of two full aggregations
    deg = degrees(canon).localCheckpoint(eager=False)
    common = edge_common_neighbors(canon.select("src", "dst"))

    j = (
        canon.join(common, ["src", "dst"], "left")
        .join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "sd"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "dd"), "dst")
        .withColumn("common", F.coalesce("common", F.lit(0)))
        .select(
            "src",
            "dst",
            (
                F.col("common")
                / (F.col("sd") + F.col("dd") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
    )
    return j


def jaccard_vertex(edges: DataFrame) -> DataFrame:
    """(id, neighbors: map<string,double>) — per-vertex {neighbor: J} map,
    the reference's JACCARD_VERTICES shape (library/Jaccard.java:33-37)."""
    j = jaccard(edges)
    both = j.unionByName(
        j.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "jaccard")
    )
    return (
        both.groupBy(F.col("src").alias("id"))
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct(F.col("dst"), F.col("jaccard"))))
            ).alias("neighbors")
        )
    )
