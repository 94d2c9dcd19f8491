"""CC: golden fixture (exact), plain ≡ split, power-law equivalence."""

from gelly_partitioning_spark import connected_components

from .conftest import CC_GOLDEN, powerlaw_graph


def _cc(edges, **kw):
    return {
        r["id"]: r["component"]
        for r in connected_components(edges, max_iterations=20, **kw).collect()
    }


def test_cc_split_golden(cc_graph):
    assert _cc(cc_graph, split=True, threshold=2) == CC_GOLDEN


def test_cc_plain_golden(cc_graph):
    assert _cc(cc_graph, split=False) == CC_GOLDEN


def test_cc_tree_mode_golden(cc_graph):
    assert _cc(cc_graph, split=True, threshold=2, mode="tree") == CC_GOLDEN


def test_cc_hub_graph_single_component(hub_graph):
    got = _cc(hub_graph, split=True, threshold=2)
    assert set(got.values()) == {"1"}
    assert len(got) == 21


def test_cc_plain_equals_split_powerlaw(spark):
    g = powerlaw_graph(spark)
    assert _cc(g, split=True, threshold=8) == _cc(g, split=False)


def test_cc_oracle_powerlaw(spark):
    """Cross-check against a pure-Python union-find oracle."""
    g = powerlaw_graph(spark)
    edges = [(r["src"], r["dst"]) for r in g.collect()]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for v in list(parent):
        root = find(v)
        comps[v] = min(comps.get(root, root), root)
    # min string id per component
    group_min = {}
    for v in parent:
        group_min.setdefault(find(v), []).append(v)
    oracle = {}
    for root, members in group_min.items():
        m = min(members)
        for v in members:
            oracle[v] = m
    assert _cc(g, split=True, threshold=8) == oracle


def test_cc_workset_shrinks(spark):
    """Delta iteration: the active set (vertices re-scattering next
    superstep) must shrink on a high-diameter graph — late supersteps move
    o(|V|) labels, matching the reference's iterateDelta contract
    (NodeSplittingConnectedComponents.java:55-83)."""
    from gelly_partitioning_spark import from_pairs
    from gelly_partitioning_spark.superstep import SuperstepRunner

    # path graph 0-1-2-...-19: diameter 19, min-id propagation takes many
    # supersteps and the frontier is 1-2 vertices near the end
    path = from_pairs(spark, [(i, i + 1) for i in range(20)])
    runner = SuperstepRunner(spark)
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            path, split=False, max_iterations=40, runner=runner
        ).collect()
    }
    assert set(got.values()) == {"0"}
    assert runner.converged
    changed = [m.changed for m in runner.metrics]
    # first superstep touches many vertices, the tail touches almost none
    assert changed[0] > 5
    assert changed[-1] == 0
    late = changed[-4:-1]
    assert all(c <= 3 for c in late), changed
