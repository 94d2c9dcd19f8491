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


def test_auto_threshold_from_avg_degree(hub_graph):
    """threshold=None derives xMin = ceil(avg degree) (reference
    AlphaNodeSplitting.java:82-102) — the degree-18 hub must still split,
    and degree_count must stay golden (split never changes answers)."""
    sg = split_graph(hub_graph, threshold=None, alpha=2, level=4)
    # avg undirected degree = 44/21 ≈ 2.1 → xMin 3; hub (18) splits
    assert sg.threshold >= 2
    subs5 = [r["id"] for r in sg.vertices.filter(F.col("tag") == "5").collect()]
    assert len(subs5) > 1
    got = {
        r["id"]: r["degree"]
        for r in degree_count(hub_graph, split=True, threshold=None).collect()
    }
    assert got == HUB_DEGREES


def test_split_rejects_id_with_separator(spark):
    """A to-be-split vertex id containing the reserved separator must be
    rejected (its sub-vertex ids would be ambiguous and unsplit() would
    truncate it)."""
    import pytest
    from gelly_partitioning_spark import from_pairs

    bad = from_pairs(
        spark, [("x" + SEP + "0", str(i)) for i in range(6)] + [("a", "b")]
    )
    sg = split_graph(bad, threshold=2, alpha=2, level=4)
    with pytest.raises(Exception, match="reserved separator"):
        sg.edges.count()
