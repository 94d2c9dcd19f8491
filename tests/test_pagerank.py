"""PageRank: NumPy dense power-iteration oracle, allclose 1e-6
(FIXTURES.md §2.6); plain ≡ split on every fixture."""

import numpy as np
import pytest

from gelly_partitioning_spark import pagerank

from .conftest import powerlaw_graph


def numpy_pagerank(pairs, damping=0.85, tol=1e-6, max_iter=200):
    ids = sorted({str(a) for a, b in pairs} | {str(b) for a, b in pairs})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[str(b)], idx[str(a)]] += 1.0
        A[idx[str(a)], idx[str(b)]] += 1.0
    deg = A.sum(axis=0)
    M = A / deg  # column-stochastic; every vertex has deg >= 1
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        r2 = (1 - damping) / n + damping * (M @ r)
        if np.abs(r2 - r).max() <= tol:
            r = r2
            break
        r = r2
    return {v: r[idx[v]] for v in ids}


def _pr(edges, **kw):
    return {r["id"]: r["rank"] for r in pagerank(edges, **kw).collect()}


@pytest.mark.parametrize("fixture", ["hub_graph", "jaccard_graph"])
def test_pagerank_vs_numpy(request, fixture):
    g = request.getfixturevalue(fixture)
    pairs = [(r["src"], r["dst"]) for r in g.collect()]
    oracle = numpy_pagerank(pairs)
    got = _pr(g, split=True, threshold=2, tol=1e-9)
    assert set(got) == set(oracle)
    for v in oracle:
        assert abs(got[v] - oracle[v]) < 1e-6, v


def test_pagerank_plain_equals_split(spark):
    g = powerlaw_graph(spark)
    a = _pr(g, split=True, threshold=8, tol=1e-9)
    b = _pr(g, split=False, tol=1e-9)
    assert set(a) == set(b)
    for v in a:
        assert abs(a[v] - b[v]) < 1e-9, v


def test_pagerank_mass_conserved(hub_graph):
    got = _pr(hub_graph, split=True, threshold=2)
    assert abs(sum(got.values()) - 1.0) < 1e-6
