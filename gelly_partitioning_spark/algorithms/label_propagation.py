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

Workset / delta iteration (the reference's ``iterateDelta`` contract,
example/NodeSplittingCommunityDetection.java:70-103): unlike monotone
min-propagation, an *unchanged* sender still contributes to the receiver's
argmax, so senders cannot simply drop out. The exact delta scheme instead
recomputes only the vertices whose inputs could have changed:

    frontier  = vertices whose (label, score) changed last superstep
    affected  = frontier ∪ N(frontier)
    gather    = ALL senders, but only along edges INTO affected vertices

A vertex outside ``affected`` has byte-identical messages AND own-state
versus the previous superstep, so recomputing it would reproduce its
current value exactly (the frontier itself must stay in ``affected``: a
vertex that just paid the delta/i label-change decay flips back to the
undecayed max when its label is re-confirmed). Late supersteps on a
converging graph gather O(|E(affected)|) messages instead of 2|E|; the
full-scatter path is kept for early supersteps where the frontier is the
whole graph (``workset_ratio`` picks the crossover from the runner's
changed-count metric — no extra job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import normalize_edges, undirected
from ..splitting import split_graph
from ..superstep import (
    CHANGED,
    DEFAULT_BROADCAST_STATE_BUDGET,
    SuperstepRunner,
    checkpoint_static,
    checkpoint_static_sized,
    data_fingerprint,
    fits_broadcast_budget,
    static_scan_partitions,
)


ACTIVE = "_active"


def label_propagation(
    edges: DataFrame | None,
    delta: float = 0.5,
    max_iterations: int = 30,
    split: bool = True,
    threshold: int | None = 6,
    alpha: int = 2,
    level: int = 4,
    mode: str = "flat",
    workset: bool = True,
    workset_ratio: float = 0.25,
    broadcast_threshold_vertices: int | None = None,
    broadcast_state_budget_bytes: int = DEFAULT_BROADCAST_STATE_BUDGET,
    superstep_batch: int = 1,
    prepared=None,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(id, label) — community label per vertex. Labels are the numeric
    value of the id when castable, else a stable 64-bit hash (reference
    labels are Long vertex ids, CommunityDetection.java:135-140).

    ``prepared`` (a ``sources.graph_store.PreparedGraph``) is the restart
    path: the persisted bucketed layout replaces split + the initial edge
    repartition. It must be a STRING layout (``use_long_ids=False``):
    initial labels derive from the *original* ids (numeric value or their
    hash) — an xxhash64-encoded layout would mint different labels and
    different tie-breaks. Always uses the salted-shuffle scatter.

    ``superstep_batch`` chains K supersteps per materializing action
    (identical results) — compatible with the workset since r4: the
    runner drops to k=1 exactly while the delta crossover is engaged
    (``batch_size_fn`` below); 0 = auto-choose from the first superstep's
    wall."""
    # try_cast: non-numeric ids fall back to a stable 64-bit hash (a plain
    # cast throws under ANSI instead of returning NULL)
    label0 = F.coalesce(F.expr("try_cast(tag as long)"), F.xxhash64("tag"))
    init_cols = [
        "tag",
        label0.alias("label"),
        F.lit(1.0).alias("score"),
        F.lit(True).alias(ACTIVE),
    ]
    if prepared is not None:
        if prepared.tag_dict is not None:
            raise ValueError(
                "label_propagation needs a string prepared layout "
                "(save_prepared_graph(..., use_long_ids=False)): initial "
                "labels derive from original ids, not xxhash64 encodings"
            )
        spark = prepared.edges.sparkSession
        sub = prepared.sub_deg.select(F.col("src").alias("id"), "tag").cache()
        init = sub.select("tag").distinct().select(*init_cols).localCheckpoint(eager=True)
        n = init.count()
        use_broadcast = False
        e = prepared.edges.cache()  # (src, dst_tag, w), bucketed by src
        # 2|E_sub| rows — drives the delta-path affected-set budget guard
        e_rows = e.count()
    else:
        edges = normalize_edges(edges)
        spark = edges.sparkSession
        # one pass over the DIRECTED edges (out+in ≡ the undirected
        # groupBy): vertex/degree table shared by init, the broadcast
        # decision, the split fan-out and the storage-level sizing
        # (guide §1.2/§2.4) — no serialized cache of the 2|E| expansion
        # just to aggregate it (guide §5)
        deg_str = (
            edges.select(F.explode(F.array("src", "dst")).alias("tag"))
            .groupBy("tag")
            .agg(F.count("*").cast("long").alias("degree"))
            .localCheckpoint(eager=True)
        )
        row = deg_str.agg(F.count("*").alias("n"), F.sum("degree").alias("er")).first()
        n, e_rows = int(row["n"]), int(row["er"] or 0)
        init = deg_str.select(*init_cols)

        if broadcast_threshold_vertices is not None:
            use_broadcast = n <= broadcast_threshold_vertices
        else:
            use_broadcast = fits_broadcast_budget(
                n, init.schema, broadcast_state_budget_bytes
            )
        if use_broadcast:
            # Fast path (guide §2.4): broadcast-mode LP scatters on the
            # ORIGINAL src tag and gathers by the original dst tag, so
            # sub-vertex routing is physically irrelevant — the scatter
            # table is the undirected edge set itself, built in one pass
            # with zero shuffles at a byte-sized partition count.
            # plain plan: the expansion is consumed exactly once here
            und = undirected(edges)
            e_raw = und.select(
                F.col("src").alias("src_tag"), F.col("dst").alias("dst_tag"), "w"
            )
            e = checkpoint_static_sized(
                e_raw.coalesce(static_scan_partitions(e_rows, e_raw.schema, spark)),
                e_rows,
                spark,
            )
        else:
            # salted path: the expansion feeds the split rewrite AND the
            # sub-vertex derivation — share one lazy cache
            und = checkpoint_static(undirected(edges), eager=False)
            sg = split_graph(
                edges,
                threshold=threshold if split else 2**62,
                alpha=alpha,
                level=level,
                mode=mode,
                degree_df=deg_str.select(F.col("tag").alias("id"), "degree"),
                und_df=und,
            )
            sub = sg.vertices.localCheckpoint(eager=True)
            # repartition(src): reused by every superstep's scatter join;
            # storage level decided once from the known row count
            e = checkpoint_static_sized(
                sg.edges.select("src", "dst_tag", "w").repartition(F.col("src")),
                e_rows,
                spark,
            )
    avg_deg = max(1.0, e_rows / max(n, 1))

    def _messages(state: DataFrame, frontier: DataFrame | None) -> DataFrame:
        """(tag, label, ms) gather messages. ``frontier=None`` → full
        scatter; else restricted to edges INTO affected = frontier ∪
        N(frontier) — ALL senders to an affected vertex still scatter
        (argmax needs the complete per-label sums), but edges into
        untouched vertices are skipped map-side (broadcast semi-join on
        dst_tag: the partition-stationary edge side never re-shuffles)."""
        ee = e
        if use_broadcast:
            if frontier is not None:
                nbrs = e.join(
                    F.broadcast(frontier), e["src_tag"] == frontier["tag"]
                ).select(F.col("dst_tag").alias("tag"))
                affected = frontier.union(nbrs).distinct()
                ee = e.join(
                    F.broadcast(affected), e["dst_tag"] == affected["tag"], "left_semi"
                )
            return ee.join(
                F.broadcast(state), ee["src_tag"] == state["tag"]
            ).select(
                F.col("dst_tag").alias("tag"),
                "label",
                (F.col("score") * F.col("w")).alias("ms"),
            )
        if frontier is not None:
            f_subs = sub.join(frontier.hint("shuffle_hash"), "tag").select(
                F.col("id").alias("src")
            )
            nbrs = e.join(f_subs.hint("shuffle_hash"), "src").select(
                F.col("dst_tag").alias("tag")
            )
            affected = frontier.union(nbrs).distinct()
            ee = e.join(
                F.broadcast(affected), e["dst_tag"] == affected["tag"], "left_semi"
            )
        sub_state = sub.join(state.hint("shuffle_hash"), "tag").select(
            F.col("id").alias("src"), "label", "score"
        )
        return ee.join(sub_state.hint("shuffle_hash"), "src").select(
            F.col("dst_tag").alias("tag"), "label", (F.col("score") * F.col("w")).alias("ms")
        )

    def _delta_now() -> bool:
        # crossover to the delta path once the frontier is small: the
        # runner already counted last superstep's changed rows — reuse it
        # (no extra job); the byte guard keeps the affected-set broadcast
        # within budget (changed × avg_deg over-estimates |affected|)
        last = runner.metrics[-1] if runner.metrics else None
        return (
            workset
            and last is not None
            and last.changed is not None
            and 0 < last.changed <= workset_ratio * n
            and last.changed * avg_deg * 64 <= broadcast_state_budget_bytes
        )

    def step(state: DataFrame, i: int):
        use_delta = _delta_now()
        frontier = state.filter(F.col(ACTIVE)).select("tag") if use_delta else None
        msgs = _messages(state, frontier)
        per_label = msgs.groupBy("tag", "label").agg(
            F.sum("ms").alias("sum_s"), F.max("ms").alias("max_s")
        )
        # argmax(sum_s) with smallest-label tie-break; max_s rides along
        # ((sum_s, -label) is unique per group so max_s never compares).
        # The comparison key is the dec6-rounded sum: float64 partial-agg
        # order is nondeterministic across engines/runs, and a raw-double
        # argmax would flip discrete labels on near-tied sums — rounding to
        # 6 decimals (HALF_UP decimal cast, the engine-wide convention)
        # makes the argmax order-robust; the DuckDB oracle ranks on the
        # token-identical key. Scores compound multiplicatively with edge
        # weights (new_score = max(score·w)), so sums can outgrow ANY
        # decimal width — try_cast falls back to the raw double there
        # (absolute 1e-6 rounding is meaningless above ~1e32 anyway), and
        # TRY_CAST has the same NULL-on-overflow semantics in DuckDB.
        sum_key = F.coalesce(
            F.expr("try_cast(sum_s as decimal(38,6))").cast("double"),
            F.col("sum_s"),
        )
        best = per_label.groupBy("tag").agg(
            F.max(F.struct(sum_key.alias("sum_s"), (-F.col("label")).alias("nl"), F.col("max_s"))).alias("b")
        ).select(
            "tag",
            (-F.col("b.nl")).alias("new_label"),
            F.col("b.max_s").alias("new_max"),
        )
        changed = (F.col("_lbl") != F.col("_old_lbl")) | (F.col("_scr") != F.col("_old_scr"))
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
                changed.alias(ACTIVE),  # next superstep's frontier
                changed.alias(CHANGED),
            )
        )

    runner = runner or SuperstepRunner(spark)
    if superstep_batch != 1 and runner.batch_size == 1:
        runner.batch_size = superstep_batch
    # the LP step references its input state twice in BOTH modes (scatter +
    # keep-old-value join): chained batches need per-intermediate lineage
    # truncation or the composed plan doubles per superstep (the r6 auto-K
    # model legitimately picks K up to 16 on fixed-cost-dominated graphs,
    # and 2^16 plan copies hang Catalyst's single-threaded planner)
    runner.chain_checkpoint = True
    if workset:
        # micro-batching × delta iteration (VERDICT r3 #5): full-scatter
        # supersteps batch freely (the decision is frozen per batch —
        # every chained step sees the same metrics the boundary saw, so
        # all k steps agree on full mode), but the moment the crossover
        # condition holds at a boundary the runner drops to k=1: delta
        # supersteps need FRESH changed counts for the frontier gate and
        # the affected-set broadcast byte budget (ADVICE r3: a stale
        # count could bypass the budget guard — results stay exact, the
        # broadcast could blow up). batch_size may be AUTO_BATCH; the
        # runner resolves it after measuring the first superstep.
        runner.batch_size_fn = lambda: 1 if _delta_now() else runner.batch_size
    if runner.fingerprint is None:
        fp = (
            f"label_propagation:v3:delta={delta}:split={split}:"
            f"threshold={threshold}:alpha={alpha}:level={level}:mode={mode}"
        )
        if runner.checkpoint_dir:
            fp += f":data[{data_fingerprint(e, *e.columns)}]"
        runner.fingerprint = fp
    final = runner.run(init, step, max_iterations)
    return final.select(F.col("tag").alias("id"), "label")
