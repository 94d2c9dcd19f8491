"""Physical-plan regression tests (explain-only — no jobs executed).

Locks in the plan properties the engine promises at scale:
- parquet scans are column-pruned (ReadSchema ⊆ needed columns)
- the skew-fanout attachment joins are broadcast
- iterative scatter joins are shuffle-hash (no per-superstep edge sort)
- no cartesian product outside explicitly-quadratic operators
"""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_parquet_scan_pruned(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.select("l_partkey", "l_suppkey").distinct()
    p = plan_of(q)
    assert "l_partkey" in p and "ReadSchema" in p
    scan_line = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in scan_line
    assert "l_quantity" not in scan_line


def test_split_uses_broadcast(spark, hub_graph):
    from gelly_partitioning_spark import split_graph

    sg = split_graph(hub_graph, threshold=2, alpha=2, level=4)
    p = plan_of(sg.edges)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_triangle_no_cartesian(spark, tri_graph):
    from gelly_partitioning_spark import triangle_count

    p = plan_of(triangle_count(tri_graph))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_jaccard_no_cartesian(spark, jaccard_graph):
    from gelly_partitioning_spark import jaccard

    p = plan_of(jaccard(jaccard_graph))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_gated_cosine_topk_is_blocked_no_cartesian(spark):
    """The driver-gated cosine_topk row runs the blocked grid cogroup
    (VERDICT r3 #1) — the quadratic 'sql' flavor is test/oracle-only."""
    import __spark_entry__ as entry

    q = entry.queries()["cosine_topk"](spark, "/root/testdata/sf0.001")
    p = plan_of(q)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "FlatMapCoGroupsInPandas" in p


def test_corpus_extraction_prunes_content_after_sha(spark):
    """content feeds sha2 inside the scan stage and is dropped from the
    shuffle: no Exchange should carry the content column."""
    from gelly_partitioning_spark.sources import extract_edges, synthesize_repo_files

    rf = synthesize_repo_files(spark, n_files=100, n_repos=10, n_paths=10)
    e = extract_edges(rf)
    p = plan_of(e)
    # the sha2 projection happens below the exchange: the Exchange operator's
    # input attributes must not include the raw content column
    exchange = [seg for seg in p.split("(") if seg.startswith("Exchange") or "Exchange " in seg[:40]]
    for seg in exchange:
        assert "content#" not in seg.splitlines()[0]
    assert e.columns == ["src", "dst", "w", "n_rows"]


def test_jaccard_wedges_are_degree_oriented(spark, jaccard_graph):
    """The common-neighbor count must enumerate wedges from the oriented
    (lo→hi by degree) adjacency — bounded by degeneracy², never hub² —
    i.e. the plan self-joins the oriented edge set on `lo`, not the raw
    undirected set on a neighbor column."""
    from gelly_partitioning_spark.algorithms.jaccard import (
        edge_common_neighbors,
    )
    from gelly_partitioning_spark.graph import canonical_edges

    canon = canonical_edges(jaccard_graph).select("src", "dst")
    p = plan_of(edge_common_neighbors(canon))
    # the oriented self-join key is the `lo` endpoint
    assert "lo#" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
