"""Jaccard similarity per edge: J(a,b) = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|.

Reference: example/JaccardSimilarityMeasure.java:20-59, library/Jaccard.java
(per-vertex maps) and library/GSAJaccard.java (per-edge values). Goldens:
util/JaccardSimilarityMeasureData.java:33-40 (e.g. J(1,2)=1/3, J(7,8)=0.0).

The reference materializes neighbor HashSets per vertex and derives the
intersection arithmetically from set sizes (library/Jaccard.java:142-150:
|∩| = |A| + |B| − |A∪B|). Relational re-expression (no sets materialized —
the hub's neighbor set never lives in one task):

  common(a,b) = #wedges a−w−b  (self-join of undirected edges on w)
  J(a,b)      = common / (deg(a) + deg(b) − common)

restricted to actual edges (a,b); edges with no common neighbor get 0.0 via
left join + coalesce. Per-vertex map flavor: ``jaccard_vertex`` collects the
per-edge rows into a map (reference JACCARD_VERTICES golden).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import canonical_edges, degrees, normalize_edges, undirected


def jaccard(edges: DataFrame) -> DataFrame:
    """(src, dst, jaccard) for each canonical undirected edge."""
    edges = normalize_edges(edges)
    canon = (
        canonical_edges(edges).withColumn("w", F.lit(1.0)).localCheckpoint(eager=True)
    )
    und = undirected(canon)
    deg = degrees(canon)

    # wedges through w: (a, b) neighbor-of-common-w pairs, canonical a<b.
    # At scale the hub's wedge fan-out is the inherent cost of exact
    # pairwise Jaccard (deg(w)^2 pairs through w) — the groupBy below is
    # sum-reducible so partial aggregation keeps the reduce side bounded.
    n1 = und.select(F.col("dst").alias("wid"), F.col("src").alias("a"))
    n2 = und.select(F.col("dst").alias("wid"), F.col("src").alias("b"))
    common = (
        n1.join(n2, "wid")
        .filter(F.col("a") < F.col("b"))
        .groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
        .agg(F.count("*").cast("long").alias("common"))
    )

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
