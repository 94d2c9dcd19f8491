"""Round-6 (optimization round) focused tests: the internals that changed
must keep their contracts — see OPTIMIZATION_r06.md for the measurements
each change is justified by."""

import pytest

from pyspark.sql import functions as F


def test_ppm_maxval_zero_rejected():
    # ADVICE r5: 'maxval 0' passed decode_ppm's checks and produced
    # inf/nan features via the maxval normalization
    from gelly_partitioning_spark.functions.multimodal import decode_ppm

    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P5\n2 2\n0\n" + bytes([0, 0, 0, 0]))


def test_observe_batch_fits_fixed_plus_marginal(spark):
    # the r6 auto-K estimator: wall = a + b*k; with a=1.2, b=0.2 and
    # target 3.0 the old per-superstep-average formula pinned K at 2
    # (3.0 / 1.4); the model chooses (3.0 - a) / b = 9
    from gelly_partitioning_spark.superstep import SuperstepRunner

    r = SuperstepRunner(spark)
    r.observe_batch(1, 1.4)  # bootstrap (single k): old formula, K = 2
    assert r._auto_k == 2
    r.observe_batch(2, 1.6)  # two ks: fit b = 0.2, a = 1.2 -> K = (3-1.2)/0.2
    assert r._auto_k in (8, 9)  # 9 up to float truncation in the floor
    # prediction drift (environment shift) resets the observation pool
    r.observe_batch(9, 30.0)
    assert r._fit is None


def test_observe_batch_slow_supersteps_stay_unbatched(spark):
    from gelly_partitioning_spark.superstep import SuperstepRunner

    r = SuperstepRunner(spark)
    r.observe_batch(1, 5.0)
    assert r._auto_k == 1
    r.observe_batch(1, 5.2)
    assert r._auto_k == 1


def test_static_scan_partitions_scales_with_bytes(spark):
    from gelly_partitioning_spark.superstep import static_scan_partitions

    schema = "dst_tag long, tag long, deg double"
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema)
    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # small input: the floor (min(4, shuffle.partitions))
    assert static_scan_partitions(1000, st, spark) == min(4, sp)
    # big input: scales with bytes but capped at 4x shuffle partitions
    big = static_scan_partitions(10**9, st, spark)
    assert big == min(10**9 * 48 // (16 << 20) + 1, 4 * sp)


def test_triangle_assume_canonical_matches(spark, tri_graph):
    from gelly_partitioning_spark import triangle_count
    from gelly_partitioning_spark.graph import canonical_edges, normalize_edges

    want = triangle_count(tri_graph).collect()[0]["triangles"]
    canon = canonical_edges(normalize_edges(tri_graph)).withColumn("w", F.lit(1.0))
    got = triangle_count(canon, assume_canonical=True).collect()[0]["triangles"]
    assert got == want


def test_pagerank_broadcast_equals_salted(spark, hub_graph):
    # the r6 broadcast-mode fast path (no split, self-row single-reference
    # superstep) must agree with the salted split path to float noise
    from gelly_partitioning_spark import pagerank

    fast = {
        r["id"]: r["rank"]
        for r in pagerank(hub_graph, fixed_iterations=12, threshold=2).collect()
    }
    salted = {
        r["id"]: r["rank"]
        for r in pagerank(
            hub_graph, fixed_iterations=12, threshold=2, broadcast_threshold_vertices=0
        ).collect()
    }
    assert set(fast) == set(salted)
    for v in fast:
        assert abs(fast[v] - salted[v]) < 1e-12, v


def test_cc_broadcast_equals_salted(spark, cc_graph):
    from gelly_partitioning_spark import connected_components

    fast = {
        r["id"]: r["component"]
        for r in connected_components(cc_graph, threshold=2).collect()
    }
    salted = {
        r["id"]: r["component"]
        for r in connected_components(
            cc_graph, threshold=2, broadcast_threshold_vertices=0
        ).collect()
    }
    assert fast == salted


def test_pagerank_single_task_matches_distributed(spark, hub_graph):
    # the r6 single-task tier (engaged by default on tiny graphs) vs the
    # distributed loop (tier disabled): identical to float noise, same
    # fixed-iteration trajectory
    from gelly_partitioning_spark import pagerank

    local = {
        r["id"]: r["rank"]
        for r in pagerank(hub_graph, fixed_iterations=12, threshold=2).collect()
    }
    dist = {
        r["id"]: r["rank"]
        for r in pagerank(
            hub_graph, fixed_iterations=12, threshold=2, single_task_budget_bytes=0
        ).collect()
    }
    assert set(local) == set(dist)
    for v in local:
        assert abs(local[v] - dist[v]) < 1e-12, v


def test_cc_single_task_matches_distributed(spark, cc_graph):
    from gelly_partitioning_spark import connected_components

    local = {
        r["id"]: r["component"]
        for r in connected_components(cc_graph, threshold=2).collect()
    }
    dist = {
        r["id"]: r["component"]
        for r in connected_components(
            cc_graph, threshold=2, single_task_budget_bytes=0
        ).collect()
    }
    assert local == dist


@pytest.mark.parametrize("numeric", [False, True])
def test_cc_single_task_numeric_ids(spark, numeric):
    # numeric order and lexicographic order disagree on these ids
    # (min(7,10,3) = 3 numerically; min("10","3","7") = "10" as strings),
    # so this pins the tier's order-rank construction for both flavors
    from gelly_partitioning_spark import connected_components, from_pairs

    g = from_pairs(spark, [(10, 7), (7, 3), (100, 20)])
    local = {
        r["id"]: r["component"]
        for r in connected_components(g, split=False, numeric_ids=numeric).collect()
    }
    dist = {
        r["id"]: r["component"]
        for r in connected_components(
            g, split=False, numeric_ids=numeric, single_task_budget_bytes=0
        ).collect()
    }
    assert local == dist
    assert local["7"] == ("3" if numeric else "10")
    assert local["100"] == ("20" if numeric else "100")


def test_cc_auto_batching_matches_unbatched(spark, cc_graph):
    from gelly_partitioning_spark import connected_components

    batched = {
        r["id"]: r["component"]
        for r in connected_components(cc_graph, threshold=2, superstep_batch=0).collect()
    }
    unbatched = {
        r["id"]: r["component"]
        for r in connected_components(cc_graph, threshold=2, superstep_batch=1).collect()
    }
    assert batched == unbatched


def test_degree_single_task_matches_distributed(spark, hub_graph):
    # the r6 single-task tier for degree_count (exact value_counts in one
    # task) vs the split pipeline (tier disabled): identical rows — and
    # the distributed path itself now builds its fan-out from ONE shared
    # degree aggregation (both BroadcastExchanges read the lazily
    # checkpointed table, itself derived from the shared lazily
    # checkpointed undirected expansion)
    from gelly_partitioning_spark import degree_count

    local = {
        (r["id"], r["degree"])
        for r in degree_count(hub_graph, threshold=2).collect()
    }
    dist = {
        (r["id"], r["degree"])
        for r in degree_count(
            hub_graph, threshold=2, single_task_budget_bytes=0
        ).collect()
    }
    assert local == dist


def test_triangle_single_task_matches_distributed(spark, tri_graph):
    # the r6 single-task tier for triangle_count (numpy orient/wedge/
    # bitmap-close in one task) vs the distributed wedge/close joins
    # (tier disabled): identical exact count — including with duplicate /
    # reversed / self-loop raw edges, which normalize away upstream
    from gelly_partitioning_spark import from_pairs, triangle_count

    for g in (
        tri_graph,
        from_pairs(spark, [(1, 2), (2, 1), (1, 1), (2, 3), (3, 1), (3, 3), (2, 3)]),
    ):
        tier = triangle_count(g).collect()[0]["triangles"]
        dist = triangle_count(g, single_task_budget_bytes=0).collect()[0][
            "triangles"
        ]
        assert tier == dist


def test_single_task_collision_marker_falls_back(spark, hub_graph, monkeypatch):
    # r6.1: the tier's injectivity check moved INSIDE the task (the
    # driver-side countDistinct probe was a third of the sf0.1 query) —
    # a surfaced collision marker must fall back to the distributed path
    import importlib

    from gelly_partitioning_spark.superstep import COLLISION_MARKER

    # the package re-exports the FUNCTION under the same name, so address
    # the module through importlib
    prmod = importlib.import_module("gelly_partitioning_spark.algorithms.pagerank")

    def boom(*a, **k):
        raise ValueError(COLLISION_MARKER)

    baseline = {
        r["id"]: r["rank"]
        for r in prmod.pagerank(
            hub_graph, fixed_iterations=5, threshold=2, single_task_budget_bytes=0
        ).collect()
    }
    monkeypatch.setattr(prmod, "_single_task_pagerank", boom)
    got = {
        r["id"]: r["rank"]
        for r in prmod.pagerank(hub_graph, fixed_iterations=5, threshold=2).collect()
    }
    assert got.keys() == baseline.keys()
    for v in got:
        assert abs(got[v] - baseline[v]) < 1e-12
    # a NON-marker error must still surface, not be swallowed
    def other(*a, **k):
        raise RuntimeError("unrelated failure")

    monkeypatch.setattr(prmod, "_single_task_pagerank", other)
    with pytest.raises(RuntimeError, match="unrelated"):
        prmod.pagerank(hub_graph, fixed_iterations=5, threshold=2)


def test_single_task_in_task_collision_check_raises(spark):
    # craft an inconsistent (hash, string) pairing — two different
    # strings on the same hash key — and pin that the in-task check
    # raises the marker (through the surfaced Python exception)
    from gelly_partitioning_spark.algorithms.pagerank import _single_task_pagerank

    df = spark.createDataFrame(
        [(1, 2, "a"), (1, 2, "b"), (2, 1, "x"), (2, 1, "x")],
        "s long, d long, s_str string",
    )
    with pytest.raises(Exception, match="xxhash64 collision"):
        _single_task_pagerank(df, 0.85, 1e-6, 5, None).collect()


def test_triangle_long_pairs_matches_generic(spark):
    # r6.1: the raw long-pair tier (in-task canonicalize/dedup, used by
    # the declared triangle query) vs the generic stringified pipeline —
    # duplicates, self-loops, reversed orientation and negative ids all
    # normalize identically
    from gelly_partitioning_spark import triangle_count_long_pairs

    raw = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (2, 3), (2, 3), (3, 4), (3, 3), (5, 3),
         (4, 5), (5, 1), (1, 1)],
        "s long, d long",
    )
    neg = spark.createDataFrame(
        [(-5, -2), (-2, -7), (-7, -5), (-5, 8), (8, -2)], "s long, d long"
    )
    for df, want in ((raw, 3), (neg, 2)):
        tier = triangle_count_long_pairs(df).collect()[0]["triangles"]
        dist = triangle_count_long_pairs(df, single_task_budget_bytes=0).collect()[
            0
        ]["triangles"]
        assert tier == dist == want


def test_triangle_core_close_methods_agree(monkeypatch):
    # the in-task close picks bitmap vs searchsorted from the exact
    # vertex count; both must count identically (monkeypatching the cap
    # works here because the core runs in-process, not on a worker)
    import importlib

    import numpy as np

    tcm = importlib.import_module(
        "gelly_partitioning_spark.algorithms.triangle_count"
    )
    rng = np.random.default_rng(7)
    s = rng.integers(0, 500, 20000)
    d = rng.integers(0, 500, 20000)
    lo, hi = np.minimum(s, d), np.maximum(s, d)
    keep = lo != hi
    lo, hi = lo[keep], hi[keep]
    o = np.lexsort((hi, lo))
    lo, hi = lo[o], hi[o]
    f = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
    lo, hi = lo[f].astype(np.int64), hi[f].astype(np.int64)
    bitmap = tcm._count_canonical_pairs(np, lo, hi)
    monkeypatch.setattr(tcm, "_BITMAP_CAP_BYTES", 0)
    searchsorted = tcm._count_canonical_pairs(np, lo, hi)
    assert bitmap == searchsorted > 0
