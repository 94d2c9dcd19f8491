"""Graph primitives: degrees, vertices, undirected, canonical, skew."""

from pyspark.sql import functions as F

from gelly_partitioning_spark import canonical_edges, degrees, vertices
from gelly_partitioning_spark.graph import skewed_vertices

from .conftest import HUB_DEGREES


def test_degrees_golden(hub_graph):
    got = {r["id"]: r["degree"] for r in degrees(hub_graph).collect()}
    assert got == HUB_DEGREES


def test_vertices_inferred(hub_graph):
    ids = {r["id"] for r in vertices(hub_graph).collect()}
    assert ids == {str(i) for i in range(1, 22)}


def test_canonical_dedup(spark):
    from gelly_partitioning_spark import from_pairs

    e = from_pairs(spark, [(1, 2), (2, 1), (1, 2), (3, 3)])
    got = {(r["src"], r["dst"]) for r in canonical_edges(e).collect()}
    assert got == {("1", "2")}  # self-loop dropped, both orientations merged


def test_skew_detection(hub_graph):
    deg = degrees(hub_graph)
    sk = {r["id"] for r in skewed_vertices(deg, 2).collect()}
    # reference threshold 2 (util/NodeSplittingData.java:19): 2, 4, 5 exceed
    assert sk == {"2", "4", "5"}
