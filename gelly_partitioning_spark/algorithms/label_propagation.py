"""Community detection via weighted label propagation with score decay.

Reference: library/CommunityDetection.java:29-141 (plain),
example/NodeSplittingCommunityDetection.java:31-144 (split). Exact
per-superstep semantics reproduced (SURVEY §7.4 Hard #4):

  init: label = own id (long), score = 1.0
  superstep i ≥ 1, per vertex v receiving messages (label, score*w) along
  every in-edge of the undirected graph:
    sum_s(l)  = Σ scores of label l          (TreeMap add,   :72-80)
    max_s(l)  = max single score of label l  (TreeMap max,    :82-92)
    best      = argmax_l sum_s(l), ties → smallest label
                (ascending TreeMap iteration + strict '>',    :96-104)
    new_score = max_s(best) − (best ≠ old_label ? delta/i : 0)   (:106-111)
    no messages → value unchanged                       (:95 guard)
  stop when no vertex's (label, score) changed, or max_iterations
  ("not guaranteed to converge", util/CommunityDetectionData.java:12).

Split-merge: both combiners (sum per label, max per label) are associative,
so the gather runs as groupBy(dst_tag, label) with map-side partials; the
argmax is one more groupBy with a struct-max — no windows, no UDFs. The
smallest-label tie-break rides in the struct as ``-label``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import normalize_edges
from ..splitting import split_graph
from ..superstep import (
    CHANGED,
    DEFAULT_BROADCAST_STATE_BUDGET,
    SuperstepRunner,
    fits_broadcast_budget,
)


def label_propagation(
    edges: DataFrame,
    delta: float = 0.5,
    max_iterations: int = 30,
    split: bool = True,
    threshold: int | None = 6,
    alpha: int = 2,
    level: int = 4,
    mode: str = "flat",
    broadcast_threshold_vertices: int | None = None,
    broadcast_state_budget_bytes: int = DEFAULT_BROADCAST_STATE_BUDGET,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(id, label) — community label per vertex. Labels are the numeric
    value of the id when castable, else a stable 64-bit hash (reference
    labels are Long vertex ids, CommunityDetection.java:135-140)."""
    edges = normalize_edges(edges)
    spark = edges.sparkSession
    sg = split_graph(
        edges,
        threshold=threshold if split else 2**62,
        alpha=alpha,
        level=level,
        mode=mode,
    )
    sub = sg.vertices.localCheckpoint(eager=True)

    label0 = F.coalesce(F.col("tag").cast("long"), F.xxhash64("tag"))
    init = (
        sub.select("tag")
        .distinct()
        .select("tag", label0.alias("label"), F.lit(1.0).alias("score"))
        .localCheckpoint(eager=True)
    )
    n = init.count()

    if broadcast_threshold_vertices is not None:
        use_broadcast = n <= broadcast_threshold_vertices
    else:
        use_broadcast = fits_broadcast_budget(
            n, init.schema, broadcast_state_budget_bytes
        )
    if use_broadcast:
        e = sg.edges.select("src_tag", "dst_tag", "w").localCheckpoint(eager=True)
    else:
        e = (
            sg.edges.select("src", "dst_tag", "w")
            .repartition(F.col("src"))  # reused by every superstep's scatter join
            .localCheckpoint(eager=True)
        )

    def step(state: DataFrame, i: int):
        if use_broadcast:
            msgs = e.join(
                F.broadcast(state), e["src_tag"] == state["tag"]
            ).select(
                F.col("dst_tag").alias("tag"),
                "label",
                (F.col("score") * F.col("w")).alias("ms"),
            )
        else:
            sub_state = sub.join(state.hint("shuffle_hash"), "tag").select(
                F.col("id").alias("src"), "label", "score"
            )
            msgs = e.join(sub_state.hint("shuffle_hash"), "src").select(
                F.col("dst_tag").alias("tag"), "label", (F.col("score") * F.col("w")).alias("ms")
            )
        per_label = msgs.groupBy("tag", "label").agg(
            F.sum("ms").alias("sum_s"), F.max("ms").alias("max_s")
        )
        # argmax(sum_s) with smallest-label tie-break; max_s rides along
        # ((sum_s, -label) is unique per group so max_s never compares)
        best = per_label.groupBy("tag").agg(
            F.max(F.struct(F.col("sum_s"), (-F.col("label")).alias("nl"), F.col("max_s"))).alias("b")
        ).select(
            "tag",
            (-F.col("b.nl")).alias("new_label"),
            F.col("b.max_s").alias("new_max"),
        )
        return (
            state.join(best.hint("shuffle_hash"), "tag", "left")
            .select(
                "tag",
                F.coalesce("new_label", "label").alias("_lbl"),
                F.when(F.col("new_label").isNull(), F.col("score"))
                .when(F.col("new_label") != F.col("label"), F.col("new_max") - delta / i)
                .otherwise(F.col("new_max"))
                .alias("_scr"),
                F.col("label").alias("_old_lbl"),
                F.col("score").alias("_old_scr"),
            )
            .select(
                "tag",
                F.col("_lbl").alias("label"),
                F.col("_scr").alias("score"),
                ((F.col("_lbl") != F.col("_old_lbl")) | (F.col("_scr") != F.col("_old_scr"))).alias(CHANGED),
            )
        )

    runner = runner or SuperstepRunner(spark)
    if runner.fingerprint is None:
        runner.fingerprint = (
            f"label_propagation:v2:delta={delta}:split={split}:"
            f"threshold={threshold}:alpha={alpha}:level={level}:mode={mode}"
        )
    final = runner.run(init, step, max_iterations)
    return final.select(F.col("tag").alias("id"), "label")
