"""Connected components: min-id label propagation to fixpoint, with a
shrinking workset (delta iteration).

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

Workset semantics (the reference's delta iteration,
NodeSplittingConnectedComponents.java:55-83 ``iterateDelta(...,
closeWith(updated, updated))``): only vertices whose component *changed
last superstep* scatter this superstep. Correct for min-propagation —
an unchanged vertex's previous message is already folded into every
neighbor's running minimum, so resending is a no-op. On high-diameter
graphs late supersteps move a handful of labels; the full-scatter variant
still pays a 2|E| join for them, the workset variant pays
O(|E(changed)|) — the `_active` column filters the scatter side before
the join (and before the per-superstep broadcast on the broadcast path).

Component id = min *string* id by default (engine semantics, matches the
DuckDB oracle); ``numeric_ids=True`` compares ids as longs for reference
fixture parity (example/NodeSplittingGSAConnectedComponents.java:172-191
parses Long).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import normalize_edges
from ..splitting import split_graph
from ..superstep import (
    CHANGED,
    DEFAULT_BROADCAST_STATE_BUDGET,
    SuperstepRunner,
    checkpoint_static,
    data_fingerprint,
    fits_broadcast_budget,
    maybe_promote_static,
)

ACTIVE = "_active"


def connected_components(
    edges: DataFrame | None,
    max_iterations: int = 50,
    split: bool = True,
    threshold: int | None = 2,
    alpha: int = 2,
    level: int = 4,
    mode: str = "flat",
    numeric_ids: bool = False,
    broadcast_threshold_vertices: int | None = None,
    broadcast_state_budget_bytes: int = DEFAULT_BROADCAST_STATE_BUDGET,
    prepared=None,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(id, component) at convergence (or max_iterations).

    ``prepared`` (a ``sources.graph_store.PreparedGraph``) is the restart
    path: the persisted bucketed layout replaces split + the initial edge
    repartition (the bucketed scan already carries HashPartitioning(src)).
    It must be a STRING layout (``use_long_ids=False``): the component id
    is the *minimum original id*, and min over xxhash64-encoded longs
    would elect a different representative. Always uses the salted-shuffle
    scatter — the path the bucketed layout exists for.
    """
    if prepared is not None:
        if prepared.tag_dict is not None:
            raise ValueError(
                "connected_components needs a string prepared layout "
                "(save_prepared_graph(..., use_long_ids=False)): min-id "
                "component semantics are defined on original ids, not "
                "xxhash64 encodings"
            )
        spark = prepared.edges.sparkSession
        sub = prepared.sub_deg.select(F.col("src").alias("id"), "tag").cache()
        e = prepared.edges.select("src", "dst_tag").cache()
    else:
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
    init = (
        sub.select("tag")
        .distinct()
        .select("tag", F.col("tag").cast(comp_t).alias("component"), F.lit(True).alias(ACTIVE))
    )
    init = init.localCheckpoint(eager=True)
    n = init.count()

    # broadcast-state scatter when the state fits a per-superstep broadcast
    # BYTE budget (row counts are the wrong unit — see superstep.py); the
    # workset shrinks what is actually broadcast each superstep further.
    if prepared is not None:
        use_broadcast = False
    elif broadcast_threshold_vertices is not None:
        use_broadcast = n <= broadcast_threshold_vertices
    else:
        use_broadcast = fits_broadcast_budget(
            n, init.schema, broadcast_state_budget_bytes
        )
    if prepared is not None:
        pass  # e already set: bucketed scan, no repartition needed
    elif use_broadcast:
        e = checkpoint_static(sg.edges.select("src_tag", "dst_tag"))
    else:
        # repartition(src): reused by every superstep's scatter join
        e = checkpoint_static(sg.edges.select("src", "dst_tag").repartition(F.col("src")))
    if prepared is None:
        # mid-regime storage promotion (one cheap count over the cached
        # blocks; see maybe_promote_static) — the scatter side is scanned
        # every superstep
        e = maybe_promote_static(e, e.count(), spark)

    def step(state: DataFrame, i: int):
        act = state.filter(F.col(ACTIVE)).select("tag", "component")
        if use_broadcast:
            msgs = (
                e.join(F.broadcast(act), e["src_tag"] == act["tag"])
                .groupBy(F.col("dst_tag").alias("tag"))
                .agg(F.min("component").alias("msg"))
            )
        else:
            sub_state = sub.join(act.hint("shuffle_hash"), "tag").select(
                F.col("id").alias("src"), "component"
            )
            msgs = (
                e.join(sub_state.hint("shuffle_hash"), "src")
                .groupBy(F.col("dst_tag").alias("tag"))
                .agg(F.min("component").alias("msg"))
            )
        improved = F.col("msg") < F.col("component")  # null-safe: null ⇒ no-op
        return state.join(msgs.hint("shuffle_hash"), "tag", "left").select(
            "tag",
            F.least(F.col("component"), F.coalesce("msg", "component")).alias("component"),
            F.coalesce(improved, F.lit(False)).alias(ACTIVE),
            improved.alias(CHANGED),
        )

    runner = runner or SuperstepRunner(spark)
    if runner.fingerprint is None:
        fp = (
            f"connected_components:v2:split={split}:threshold={threshold}:"
            f"alpha={alpha}:level={level}:mode={mode}:numeric={numeric_ids}"
        )
        if runner.checkpoint_dir:
            fp += f":data[{data_fingerprint(e, *e.columns)}]"
        runner.fingerprint = fp
    final = runner.run(init, step, max_iterations)
    return final.select(F.col("tag").alias("id"), F.col("component").cast("string"))
