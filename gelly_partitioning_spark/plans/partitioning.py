"""Degree-balanced, CSR-style edge partitioning.

North-star requirement: "edges are bucketed into degree-balanced CSR-style
partitions". ``degree_balanced_edges`` produces partitions with

- ~equal EDGE counts (no partition inherits a whole hub), and
- src-clustered layout inside each partition (CSR-ish: all edges of a
  sub-vertex are contiguous, so an Arrow batch sees whole adjacency runs).

Mechanism: split-salt the hubs first (so no single key exceeds ~threshold
edges), then ``repartitionByRange`` on the salted src — Spark's range
partitioner samples keys *by frequency*, giving near-uniform edge counts —
plus ``sortWithinPartitions`` for the CSR run layout. All declarative; the
optimizer keeps the range distribution through downstream mapInPandas /
mapInArrow stages.

``partition_histogram`` is the observability half (the reference measured
per-group straggler time via DummyGraph probes, util/DummyGraph.java:308-317;
we measure rows per partition — the superstep runner records the same
histogram per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import normalize_edges
from ..splitting import split_graph


def degree_balanced_edges(
    edges: DataFrame,
    num_partitions: int = 64,
    threshold: int = 1000,
    alpha: int = 2,
    level: int = 8,
) -> DataFrame:
    """Split-salted, range-partitioned, src-sorted edge table
    (src, dst, w, src_tag, dst_tag)."""
    edges = normalize_edges(edges)
    sg = split_graph(edges, threshold=threshold, alpha=alpha, level=level)
    return (
        sg.edges.repartitionByRange(num_partitions, F.col("src"))
        .sortWithinPartitions("src")
    )


def partition_histogram(df: DataFrame) -> list:
    """Rows per partition, ordered by partition id."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("c"))
        .orderBy("p")
        .collect()
    )
    return [r["c"] for r in rows]
