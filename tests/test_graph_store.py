"""Bucketed persisted split-graph layout: restart-path correctness + the
no-initial-exchange plan guarantee (VERDICT r2 #7)."""

import pytest
from pyspark.sql import functions as F

from gelly_partitioning_spark import connected_components, label_propagation, pagerank
from gelly_partitioning_spark.sources import load_prepared_graph, save_prepared_graph

from .test_plans import plan_of


@pytest.fixture(scope="module")
def prepared(spark, hub_graph, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("store"))
    return save_prepared_graph(
        hub_graph, name="hubpg", base_path=base, threshold=2, alpha=2, level=4, buckets=4
    )


@pytest.fixture(scope="module")
def prepared_str(spark, hub_graph, tmp_path_factory):
    """String (unencoded) layout — required by CC/LP, whose semantics are
    defined on original ids."""
    base = str(tmp_path_factory.mktemp("store_str"))
    return save_prepared_graph(
        hub_graph, name="hubpg_str", base_path=base, threshold=2, alpha=2,
        level=4, buckets=4, use_long_ids=False,
    )


def test_prepared_pagerank_matches_cold_path(spark, hub_graph, prepared):
    want = {r["id"]: r["rank"] for r in pagerank(hub_graph, fixed_iterations=8, threshold=2).collect()}
    got = {r["id"]: r["rank"] for r in pagerank(None, fixed_iterations=8, prepared=prepared).collect()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_prepared_reload_by_name(spark, prepared):
    pg = load_prepared_graph(spark, "hubpg")
    assert pg.edges.columns == ["src", "dst_tag", "w"]
    assert set(pg.sub_deg.columns) == {"src", "tag", "deg"}
    got = {r["id"]: r["rank"] for r in pagerank(None, fixed_iterations=3, prepared=pg).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_prepared_cc_matches_cold_path(spark, hub_graph, prepared_str):
    want = {
        r["id"]: r["component"]
        for r in connected_components(hub_graph, split=True, threshold=2).collect()
    }
    got = {
        r["id"]: r["component"]
        for r in connected_components(None, prepared=prepared_str).collect()
    }
    assert got == want


def test_prepared_lp_matches_cold_path(spark, hub_graph, prepared_str):
    want = {
        r["id"]: r["label"]
        for r in label_propagation(
            hub_graph, split=True, threshold=2, max_iterations=8,
            broadcast_threshold_vertices=0,  # salted path, like prepared
        ).collect()
    }
    got = {
        r["id"]: r["label"]
        for r in label_propagation(None, max_iterations=8, prepared=prepared_str).collect()
    }
    assert got == want


def test_prepared_cc_lp_reject_encoded_layout(spark, prepared):
    with pytest.raises(ValueError, match="string prepared layout"):
        connected_components(None, prepared=prepared)
    with pytest.raises(ValueError, match="string prepared layout"):
        label_propagation(None, prepared=prepared)


def test_prepared_scatter_has_no_edge_side_exchange(spark, prepared):
    """The restart-path guarantee: the scatter join consumes the bucketed
    edge scan directly — zero Exchange on the 2|E| side, cold start
    included (the shuffle-hash build side is the only exchange)."""
    rank_side = prepared.sub_deg.select("src", (F.col("deg") * 0 + 1.0).alias("contrib"))
    scatter = prepared.edges.join(rank_side.hint("shuffle_hash"), "src")
    p = plan_of(scatter)
    # the edges scan is bucketed…
    assert "Bucketed: true" in p
    # …and the plan has NO Exchange at all: edges AND sub_deg share the
    # same bucketing on src, so the scatter join is fully co-located
    # (in the live loop only the vertex-sized rank state shuffles)
    n_exchanges = sum(
        1 for line in p.splitlines() if line.strip().split(" ", 2)[1:2] == ["Exchange"]
    )
    assert n_exchanges == 0, p
