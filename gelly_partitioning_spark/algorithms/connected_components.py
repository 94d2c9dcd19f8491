"""Connected components: min-id label propagation to fixpoint.

Reference: example/NodeSplittingConnectedComponents.java:24-104 (split
path), library/ConnectedComponentsAlgorithm.java:22-71 (plain). Golden:
util/ConnectedComponentsData.java:27 — exact match required.

Superstep (relational gather-scatter, SURVEY.md §3.2):
  scatter: split-edges ⋈ sub-vertex state on the *salted* src id
           (balanced join — the hub key never concentrates),
  gather : groupBy(dst_tag).min  (map-side partial agg bounds the hub),
  apply  : least(old, msg); changed-count drives convergence,
  merge/propagate: state lives at tag level and is re-attached to
           sub-vertices each superstep (Split-Merge, SplitVertex.java:186-225,
           402-428). "No message keeps the old value" is the left-join +
           coalesce (util/DummyGraph.java:599-610 — SURVEY §7.4 Hard #3).

Component id = min *string* id by default (engine semantics, matches the
DuckDB oracle); ``numeric_ids=True`` compares ids as longs for reference
fixture parity (example/NodeSplittingGSAConnectedComponents.java:172-191
parses Long).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import normalize_edges
from ..splitting import split_graph
from ..superstep import CHANGED, SuperstepRunner


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    split: bool = True,
    threshold: int = 2,
    alpha: int = 2,
    level: int = 4,
    mode: str = "flat",
    numeric_ids: bool = False,
    broadcast_threshold_vertices: int = 10_000_000,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(id, component) at convergence (or max_iterations)."""
    edges = normalize_edges(edges)
    spark = edges.sparkSession
    sg = split_graph(
        edges,
        threshold=threshold if split else 2**62,
        alpha=alpha,
        level=level,
        mode=mode,
    )
    sub = sg.vertices.localCheckpoint(eager=True)  # static (id, tag)

    comp_t = "long" if numeric_ids else "string"
    init = sub.select("tag").distinct().withColumn("component", F.col("tag").cast(comp_t))
    init = init.localCheckpoint(eager=True)
    n = init.count()

    # broadcast-state scatter when the component table fits (see
    # pagerank.py — same two-strategy rationale)
    use_broadcast = n <= broadcast_threshold_vertices
    if use_broadcast:
        e = (
            sg.edges.select("src_tag", "dst_tag")
            .localCheckpoint(eager=True)
        )
    else:
        e = (
            sg.edges.select("src", "dst_tag")
            .repartition(F.col("src"))  # reused by every superstep's scatter join
            .localCheckpoint(eager=True)
        )

    def step(state: DataFrame, i: int):
        if use_broadcast:
            msgs = (
                e.join(F.broadcast(state), e["src_tag"] == state["tag"])
                .groupBy(F.col("dst_tag").alias("tag"))
                .agg(F.min("component").alias("msg"))
            )
        else:
            sub_state = sub.join(state.hint("shuffle_hash"), "tag").select(
                F.col("id").alias("src"), "component"
            )
            msgs = (
                e.join(sub_state.hint("shuffle_hash"), "src")
                .groupBy(F.col("dst_tag").alias("tag"))
                .agg(F.min("component").alias("msg"))
            )
        return state.join(msgs.hint("shuffle_hash"), "tag", "left").select(
            "tag",
            F.least(F.col("component"), F.coalesce("msg", "component")).alias("component"),
            (F.col("msg") < F.col("component")).alias(CHANGED),
        )

    runner = runner or SuperstepRunner(spark)
    final = runner.run(init, step, max_iterations)
    return final.select(F.col("tag").alias("id"), F.col("component").cast("string"))
