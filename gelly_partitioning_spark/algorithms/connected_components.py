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

import time

from pyspark.sql import DataFrame, functions as F

from ..graph import normalize_edges, undirected
from ..splitting import split_graph
from ..superstep import (
    CHANGED,
    COLLISION_MARKER,
    DEFAULT_BROADCAST_STATE_BUDGET,
    SuperstepMetrics,
    SuperstepRunner,
    checkpoint_static,
    checkpoint_static_sized,
    data_fingerprint,
    fits_broadcast_budget,
    plan_size_hint_bytes,
    static_scan_partitions,
)

ACTIVE = "_active"

# Single-task scatter budget (the third strategy, r6 — see pagerank.py):
# when the whole undirected routing table fits one task's memory, the
# entire min-propagation loop runs executor-side inside one mapInPandas
# task. Pure integer/rank arithmetic — the result is EXACTLY the min
# original id per component, no float involved. ~56 bytes/row (two int64
# key columns + the string id column + index vectors).
DEFAULT_SINGLE_TASK_BUDGET = 256 << 20
_SINGLE_TASK_ROW_BYTES = 56


def _single_task_cc(und_keys: DataFrame, max_iterations: int, numeric_ids: bool):
    """(id, component, _iters, _conv) — the whole fixpoint in one task.

    Ranks the vertex set by the SAME comparison order the distributed
    path minimizes over (string order, or numeric order under
    ``numeric_ids``), min-propagates ranks to fixpoint with a sorted
    reduceat (no per-row Python), and decodes ranks back to original ids
    — including the numeric path's long→string normalization, so the
    output is bit-identical to the distributed result.
    """

    def run(pdfs):
        import numpy as np
        import pandas as pd

        chunks = [c for c in pdfs]
        if not chunks:
            return
        s = np.concatenate([c["s"].to_numpy() for c in chunks])
        d = np.concatenate([c["d"].to_numpy() for c in chunks])
        s_str = np.concatenate([c["s_str"].to_numpy() for c in chunks])
        ids, first = np.unique(s, return_index=True)
        si = np.searchsorted(ids, s)
        di = np.searchsorted(ids, d)
        n = len(ids)
        strs = s_str[first]
        # exact in-task injectivity check (see superstep.COLLISION_MARKER):
        # a collision = some row's string disagrees with its hash's
        # representative; the driver catches the marker and falls back to
        # the probed distributed paths
        if not (s_str == strs[si]).all():
            raise ValueError(COLLISION_MARKER)
        if numeric_ids:
            keyorder = np.argsort(strs.astype(np.int64), kind="stable")
        else:
            keyorder = np.argsort(strs.astype(object), kind="stable")
        rank = np.empty(n, dtype=np.int64)
        rank[keyorder] = np.arange(n)
        # group the gather side once; per superstep one reduceat min
        order = np.argsort(di, kind="stable")
        di_sorted = di[order]
        si_sorted = si[order]
        starts = np.flatnonzero(np.r_[True, di_sorted[1:] != di_sorted[:-1]])
        groups = di_sorted[starts]
        comp = rank.copy()
        done, conv = 0, False
        for _ in range(max_iterations):
            msgs = np.minimum.reduceat(comp[si_sorted], starts)
            new = comp.copy()
            new[groups] = np.minimum(new[groups], msgs)
            done += 1
            if np.array_equal(new, comp):
                conv = True  # the observed changed==0 superstep
                break
            comp = new
        sorted_strs = strs[keyorder]
        out_comp = sorted_strs[comp]
        if numeric_ids:
            # same normalization as the distributed cast chain
            # (string → long → string)
            out_comp = out_comp.astype(np.int64).astype(str).astype(object)
        yield pd.DataFrame(
            {
                "id": strs,
                "component": out_comp,
                "_iters": np.full(n, done, dtype=np.int32),
                "_conv": np.full(n, conv),
            }
        )

    return und_keys.coalesce(1).mapInPandas(
        run, "id string, component string, _iters int, _conv boolean"
    )


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
    superstep_batch: int = 0,
    single_task_budget_bytes: int = DEFAULT_SINGLE_TASK_BUDGET,
    prepared=None,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(id, component) at convergence (or max_iterations).

    ``superstep_batch`` chains K supersteps per materializing action
    (0 = AUTO; see pagerank's docstring — results identical, min-
    propagation no-ops any overshoot supersteps past the fixpoint).
    Applied only to the internally-created runner: a caller-supplied
    runner keeps its own batch_size (per-superstep metrics intact).

    ``prepared`` (a ``sources.graph_store.PreparedGraph``) is the restart
    path: the persisted bucketed layout replaces split + the initial edge
    repartition (the bucketed scan already carries HashPartitioning(src)).
    It must be a STRING layout (``use_long_ids=False``): the component id
    is the *minimum original id*, and min over xxhash64-encoded longs
    would elect a different representative. Always uses the salted-shuffle
    scatter — the path the bucketed layout exists for.
    """
    comp_t = "long" if numeric_ids else "string"
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
        init = (
            sub.select("tag")
            .distinct()
            .select(
                "tag", F.col("tag").cast(comp_t).alias("component"), F.lit(True).alias(ACTIVE)
            )
            .localCheckpoint(eager=True)
        )
        n = init.count()
        use_broadcast = False  # the bucketed layout IS the salted-scatter path
    else:
        edges = normalize_edges(edges)
        spark = edges.sparkSession

        if (
            runner is None  # callers that pass a runner want per-superstep metrics
            and broadcast_threshold_vertices is None
            and single_task_budget_bytes
        ):
            # third scatter strategy (see _single_task_cc / pagerank.py).
            # Gated on a bare count — the xxhash64 injectivity check runs
            # vectorized INSIDE the task (the r6.0 driver-side
            # countDistinct probe cost ~1 s at sf0.1; guide §1.2); a
            # collision surfaces as the marker and falls through to the
            # probed distributed paths below. The jobless Catalyst-stats
            # hint skips the tier AND its count for obviously-oversized
            # inputs (at scale that count is a full scan).
            hint = plan_size_hint_bytes(edges)
            e_rows = (
                0
                if hint is not None and hint > 8 * single_task_budget_bytes
                else 2 * edges.count()
            )
            if 0 < e_rows * _SINGLE_TASK_ROW_BYTES <= single_task_budget_bytes:
                t0 = time.time()
                und_keys = edges.select(
                    F.xxhash64("src").alias("s"),
                    F.xxhash64("dst").alias("d"),
                    F.col("src").alias("s_str"),
                ).unionByName(
                    edges.select(
                        F.xxhash64("dst").alias("s"),
                        F.xxhash64("src").alias("d"),
                        F.col("dst").alias("s_str"),
                    )
                )
                try:
                    out = _single_task_cc(
                        und_keys, max_iterations, numeric_ids
                    ).localCheckpoint(eager=True)
                    meta = out.select(
                        F.max("_iters").alias("i"),
                        F.max(F.col("_conv").cast("int")).alias("c"),
                        F.count("*").alias("n"),
                    ).first()
                except Exception as exc:  # noqa: BLE001 — marker-matched
                    if COLLISION_MARKER not in str(exc):
                        raise
                else:
                    runner = SuperstepRunner(spark)
                    runner.metrics.append(
                        SuperstepMetrics(
                            superstep=int(meta["i"]),
                            rows=int(meta["n"]),
                            changed=0 if meta["c"] else None,
                            wall_sec=time.time() - t0,
                        )
                    )
                    runner.converged = bool(meta["c"])
                    return out.select("id", "component")

        # one probe job over the DIRECTED edges: routing-table row count
        # and vertex count (feeds the broadcast-vs-salted decision; CC's
        # distributed paths never hash-key vertices — min-id semantics
        # live on original ids — so no injectivity column is needed here
        # since the in-task tier check above took that role)
        probe = (
            edges.select(F.explode(F.array("src", "dst")).alias("tag"))
            .agg(
                F.count("*").alias("er"),
                F.countDistinct("tag").alias("nt"),
            )
            .first()
        )
        n, e_rows = int(probe["nt"]), int(probe["er"])

        # vertex table + degrees (for sizing and, on the salted path, the
        # split fan-out) without materializing a serialized cache of the
        # 2|E| expansion just to aggregate it (guide §5)
        deg_str = (
            edges.select(F.explode(F.array("src", "dst")).alias("tag"))
            .groupBy("tag")
            .agg(F.count("*").cast("long").alias("degree"))
            .localCheckpoint(eager=True)
        )
        init = deg_str.select(
            "tag", F.col("tag").cast(comp_t).alias("component"), F.lit(True).alias(ACTIVE)
        )

        # broadcast-state scatter when the state fits a per-superstep
        # broadcast BYTE budget (row counts are the wrong unit — see
        # superstep.py)
        if broadcast_threshold_vertices is not None:
            use_broadcast = n <= broadcast_threshold_vertices
        else:
            use_broadcast = fits_broadcast_budget(
                n, init.schema, broadcast_state_budget_bytes
            )
        if use_broadcast:
            # Fast path (guide §2.4): broadcast-mode CC scatters on the
            # ORIGINAL src tag and gathers by the original dst tag, so
            # sub-vertex routing is physically irrelevant — the scatter
            # table is the undirected edge set itself plus one SELF row
            # per vertex. The self row carries the vertex's own old
            # component through the same join+aggregation that gathers
            # its messages, so the state is referenced exactly ONCE per
            # superstep (no second vertex-sized join; see pagerank.py).
            #
            # Order-preserving dense-rank encoding (guide §2.3: narrower
            # types): min over ranks ≡ min over the original component
            # order, so the per-superstep min-agg, broadcast hash and
            # probes all run on 8-byte longs instead of strings (measured
            # ~0.6 → ~0.35 s/superstep at sf0.1). The rank dictionary is
            # VERTEX-sized — broadcast mode by definition means the
            # vertex set is small, so the single window sort is cheap —
            # and results decode through it at the end, so the emitted
            # components are the original ids, bit-identical.
            from pyspark.sql import Window

            order_col = F.col("tag").cast("long") if numeric_ids else F.col("tag")
            rank_dict = deg_str.select(
                "tag",
                F.row_number().over(Window.orderBy(order_col)).cast("long").alias("r"),
            ).localCheckpoint(eager=True)
            # coalesce: byte-sized partitions for the per-superstep scan
            # (guide §2.2; see static_scan_partitions).
            # plain plan: the expansion is consumed exactly once here
            und = undirected(edges)
            e_raw = (
                und.join(
                    F.broadcast(
                        rank_dict.select(F.col("tag").alias("src"), F.col("r").alias("rs"))
                    ),
                    "src",
                )
                .join(
                    F.broadcast(
                        rank_dict.select(F.col("tag").alias("dst"), F.col("r").alias("rd"))
                    ),
                    "dst",
                )
                .select(
                    F.col("rs").alias("src_tag"),
                    F.col("rd").alias("dst_tag"),
                    F.lit(False).alias("self"),
                )
                .unionByName(
                    rank_dict.select(
                        F.col("r").alias("src_tag"),
                        F.col("r").alias("dst_tag"),
                        F.lit(True).alias("self"),
                    )
                )
            )
            e = checkpoint_static_sized(
                e_raw.coalesce(static_scan_partitions(e_rows + n, e_raw.schema, spark)),
                e_rows + n,
                spark,
            )
            init = rank_dict.select(
                F.col("r").alias("tag"),
                F.col("r").alias("component"),
                F.lit(True).alias(ACTIVE),
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
            sub = sg.vertices.localCheckpoint(eager=True)  # static (id, tag)
            # repartition(src): reused by every superstep's scatter join;
            # storage level decided once from the known row count
            e = checkpoint_static_sized(
                sg.edges.select("src", "dst_tag").repartition(F.col("src")),
                e_rows,
                spark,
            )

    def step(state: DataFrame, i: int):
        if use_broadcast:
            g = (
                e.join(F.broadcast(state), e["src_tag"] == state["tag"])
                .groupBy(F.col("dst_tag").alias("tag"))
                .agg(
                    F.min(
                        F.when(~F.col("self") & F.col(ACTIVE), F.col("component"))
                    ).alias("msg"),
                    F.max(F.when(F.col("self"), F.col("component"))).alias("old"),
                )
            )
            improved = F.col("msg") < F.col("old")  # null-safe: null ⇒ no-op
            return g.select(
                "tag",
                F.least(F.col("old"), F.coalesce("msg", "old")).alias("component"),
                F.coalesce(improved, F.lit(False)).alias(ACTIVE),
                improved.alias(CHANGED),
            )
        act = state.filter(F.col(ACTIVE)).select("tag", "component")
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

    if runner is None:
        runner = SuperstepRunner(spark)
        runner.batch_size = superstep_batch
    if not use_broadcast:
        # the salted step references its input state twice (scatter +
        # old-value join): chained batches need per-intermediate lineage
        # truncation or the composed plan doubles per superstep
        runner.chain_checkpoint = True
    if runner.fingerprint is None:
        fp = (
            f"connected_components:v2:split={split}:threshold={threshold}:"
            f"alpha={alpha}:level={level}:mode={mode}:numeric={numeric_ids}"
        )
        if runner.checkpoint_dir:
            fp += f":data[{data_fingerprint(e, *e.columns)}]"
        runner.fingerprint = fp
    final = runner.run(init, step, max_iterations)
    if use_broadcast:
        # decode the rank encoding: two vertex-sized broadcast joins, then
        # the same comp_t→string cast chain as the unencoded path (so e.g.
        # numeric_ids still normalizes the component string identically)
        return (
            final.join(
                F.broadcast(
                    rank_dict.select(F.col("r").alias("tag"), F.col("tag").alias("_id"))
                ),
                "tag",
            )
            .join(
                F.broadcast(
                    rank_dict.select(
                        F.col("r").alias("component"), F.col("tag").alias("_comp")
                    )
                ),
                "component",
            )
            .select(
                F.col("_id").alias("id"),
                F.col("_comp").cast(comp_t).cast("string").alias("component"),
            )
        )
    return final.select(F.col("tag").alias("id"), F.col("component").cast("string"))
