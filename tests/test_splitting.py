"""Split-Merge kernel invariants (SplitVertex.java semantics)."""

from pyspark.sql import functions as F

from gelly_partitioning_spark import degree_count, split_graph
from gelly_partitioning_spark.splitting import SEP

from .conftest import HUB_DEGREES


def test_split_preserves_edge_count(hub_graph):
    sg = split_graph(hub_graph, threshold=2, alpha=2, level=4)
    # undirected expansion doubles the 22 edges; splitting only renames
    assert sg.edges.count() == 44


def test_split_tags_recover_originals(hub_graph):
    sg = split_graph(hub_graph, threshold=2, alpha=2, level=4)
    tags = {r["tag"] for r in sg.tags().collect()}
    assert tags == {str(i) for i in range(1, 22)}


def test_hub_actually_splits(hub_graph):
    sg = split_graph(hub_graph, threshold=2, alpha=2, level=4)
    subs5 = [r["id"] for r in sg.vertices.filter(F.col("tag") == "5").collect()]
    assert len(subs5) > 1  # degree-18 hub must fan out
    assert all(s == "5" or s.startswith("5" + SEP) for s in subs5)
    # fan-out bounded by alpha^level
    assert len(subs5) <= 16


def test_unsplit_degree_bounded(hub_graph):
    """Post-split, every sub-vertex's routing degree ≲ threshold-sized
    buckets: max group ≤ ceil(18/9)+slack under hash balance (loose)."""
    sg = split_graph(hub_graph, threshold=2, alpha=2, level=4)
    per_sub = (
        sg.edges.groupBy("src").count().agg(F.max("count").alias("m")).collect()[0]["m"]
    )
    assert per_sub <= 8  # unsplit hub would be 18


def test_degree_count_split_matches_golden_flat(hub_graph):
    got = {r["id"]: r["degree"] for r in degree_count(hub_graph, split=True).collect()}
    assert got == HUB_DEGREES


def test_degree_count_split_matches_golden_tree(hub_graph):
    got = {
        r["id"]: r["degree"]
        for r in degree_count(hub_graph, split=True, mode="tree").collect()
    }
    assert got == HUB_DEGREES


def test_degree_count_plain_matches_golden(hub_graph):
    got = {r["id"]: r["degree"] for r in degree_count(hub_graph, split=False).collect()}
    assert got == HUB_DEGREES
