"""Triangle count (exact golden = 3) and Jaccard (allclose goldens)."""

import pytest

from gelly_partitioning_spark import jaccard, jaccard_vertex, skew_census, triangle_count

from .conftest import JACCARD_EDGE_GOLDEN, TRI_GOLDEN, powerlaw_graph


def test_triangle_count_golden(tri_graph):
    assert triangle_count(tri_graph).collect()[0]["triangles"] == TRI_GOLDEN


def test_triangle_count_hub(hub_graph):
    # hub graph triangles: 2-3-4 (edges 2-3,3-4,2-4? 2-4 yes,3-4 yes,2-3 yes) and 2-4-5, 4-5? edges 4-5,2-5 → 2-4-5
    got = triangle_count(hub_graph).collect()[0]["triangles"]
    # oracle by brute force
    pairs = {(r["src"], r["dst"]) for r in hub_graph.collect()}
    und = set()
    for a, b in pairs:
        und.add(frozenset((a, b)))
    verts = sorted({v for e in und for v in e})
    cnt = sum(
        1
        for i, a in enumerate(verts)
        for b in verts[i + 1:]
        for c in verts[verts.index(b) + 1:]
        if frozenset((a, b)) in und and frozenset((b, c)) in und and frozenset((a, c)) in und
    )
    assert got == cnt


def test_triangle_count_powerlaw_oracle(spark):
    g = powerlaw_graph(spark, n_edges=800, n_vertices=80)
    und = {frozenset((r["src"], r["dst"])) for r in g.collect()}
    verts = sorted({v for e in und for v in e})
    n = len(verts)
    cnt = 0
    for i in range(n):
        for j in range(i + 1, n):
            if frozenset((verts[i], verts[j])) not in und:
                continue
            for k in range(j + 1, n):
                if (
                    frozenset((verts[j], verts[k])) in und
                    and frozenset((verts[i], verts[k])) in und
                ):
                    cnt += 1
    assert triangle_count(g).collect()[0]["triangles"] == cnt


def test_jaccard_edge_golden(jaccard_graph):
    got = {(r["src"], r["dst"]): r["jaccard"] for r in jaccard(jaccard_graph).collect()}
    assert set(got) == set(JACCARD_EDGE_GOLDEN)
    for k, v in JACCARD_EDGE_GOLDEN.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_jaccard_vertex_golden(jaccard_graph):
    got = {r["id"]: r["neighbors"] for r in jaccard_vertex(jaccard_graph).collect()}
    # util/JaccardSimilarityMeasureData.java:33-36
    assert got["7"]["8"] == pytest.approx(0.0)
    assert got["1"]["2"] == pytest.approx(1 / 3)
    assert got["8"] == {"7": pytest.approx(0.0)}
    assert len(got["7"]) == 7


def test_skew_census(hub_graph):
    assert skew_census(hub_graph, threshold=2).collect()[0]["skewed_vertices"] == 3
    assert skew_census(hub_graph, threshold=1000).collect()[0]["skewed_vertices"] == 0
