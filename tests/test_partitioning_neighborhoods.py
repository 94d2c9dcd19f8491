"""Degree-balanced partitioning + neighborhood ops (A5/A8)."""

import pandas as pd
from pyspark.sql import functions as F

from gelly_partitioning_spark.algorithms.neighborhoods import (
    aggregate_neighborhoods,
    neighbor_sets,
)
from gelly_partitioning_spark.plans import degree_balanced_edges, partition_histogram

from .conftest import powerlaw_graph


def test_neighbor_sets_split_equals_plain(spark, hub_graph):
    a = {r["id"]: r["neighbors"] for r in neighbor_sets(hub_graph, split=True, threshold=2, level=4).collect()}
    b = {r["id"]: r["neighbors"] for r in neighbor_sets(hub_graph, split=False).collect()}
    assert a == b
    assert a["5"] == sorted({"2", "4"} | {str(i) for i in range(6, 22)})
    assert a["1"] == ["2"]


def test_degree_balanced_no_hub_partition(spark):
    g = powerlaw_graph(spark, n_edges=3000, n_vertices=200)
    bal = degree_balanced_edges(g, num_partitions=8, threshold=16, level=6)
    hist = partition_histogram(bal)
    total = sum(hist)
    assert total == bal.count()
    # balance: no partition holds more than 3x the mean edge count
    mean = total / len([h for h in hist if h])
    assert max(hist) <= 3 * mean, hist


def test_aggregate_neighborhoods_custom_combiner(spark, hub_graph):
    """Weighted degree via the pandas extension point equals builtin sum."""

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"tag": [pdf["tag"].iloc[0]], "wdeg": [pdf["w"].sum()]})

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"tag": [pdf["tag"].iloc[0]], "wdeg": [pdf["wdeg"].sum()]})

    got = {
        r["tag"]: r["wdeg"]
        for r in aggregate_neighborhoods(
            hub_graph, combine, "tag string, wdeg double", merge=merge,
            threshold=2, level=4,
        ).collect()
    }
    from gelly_partitioning_spark import degree_count

    want = {r["id"]: float(r["degree"]) for r in degree_count(hub_graph).collect()}
    assert got == want
