"""Degree count over the split graph.

Reference: library/CountDegree.java:12-59 driven by
SortDegreeNodeSplitting.java:28-97 (split path) — undirected degree per
original vertex, computed on the *split* edge set then tree-merged.
Golden fixture: util/NodeSplittingData.java:55-57.

Spark shape: per-sub-vertex partial count (groups bounded by the split) →
single ``groupBy(tag).sum`` merge. Two shuffles total, both balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import degrees, normalize_edges
from ..splitting import merge_by_tag, split_graph


def degree_count(
    edges: DataFrame,
    split: bool = True,
    threshold: int | None = 2,
    alpha: int = 2,
    level: int = 4,
    mode: str = "flat",
) -> DataFrame:
    """(id, degree): undirected degree per original vertex.

    Examined in r6 and deliberately kept as-is: pre-materializing the
    degree/undirected tables (the win for the ITERATIVE consumers, which
    re-scan them every superstep) measured 4.4 s vs 2.3 s here — a
    one-pass query pays the serialized cache write without ever
    amortizing it (guide §5: cache only what is reused enough).
    """
    edges = normalize_edges(edges)
    if not split:
        return degrees(edges)
    sg = split_graph(edges, threshold=threshold, alpha=alpha, level=level, mode=mode)
    partial = sg.edges.groupBy("src", "src_tag").agg(F.count("*").alias("pdeg"))
    merged = merge_by_tag(
        partial.select(F.col("src_tag").alias("tag"), "pdeg"),
        [F.sum("pdeg").cast("long").alias("degree")],
    )
    return merged.select(F.col("tag").alias("id"), "degree")
