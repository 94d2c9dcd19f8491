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


def test_triplets(spark):
    from gelly_partitioning_spark import from_pairs, triplets

    e = from_pairs(spark, [("a", "b"), ("b", "c")])
    vv = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "id string, val int"
    )
    got = {
        (r["src"], r["dst"]): (r["src_val"], r["dst_val"])
        for r in triplets(e, vv).collect()
    }
    assert got == {("a", "b"): (1, 2), ("b", "c"): (2, 3)}


def test_entry_resume_roundtrip(spark, tmp_path, monkeypatch):
    """Driver-level resumability: entry() with SPARK_GRAFT_CHECKPOINT_DIR
    snapshots; a second entry() call resumes past the snapshot superstep
    and returns identical ranks."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as m

    ckpt = str(tmp_path / "ck")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckpt)
    first = {r["id"]: r["rank"] for r in m.entry(spark).collect()}
    manifest = json.loads((Path(ckpt) / "manifest.json").read_text())
    assert manifest["superstep"] >= 5
    assert manifest["fingerprint"].startswith("pagerank:")
    # second invocation resumes from the snapshot (not from superstep 1)
    # and must converge to the same values
    second = {r["id"]: r["rank"] for r in m.entry(spark).collect()}
    assert second == first
