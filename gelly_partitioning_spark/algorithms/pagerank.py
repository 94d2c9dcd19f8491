"""PageRank over the split graph (engine-only; BASELINE.json north rule —
absent from the reference, implemented with the identical Split-Merge
superstep; SURVEY.md §2.11 last row).

Semantics (matches the NumPy oracle in tests and the unrolled SQL oracle):
  r_0(v)   = 1/N
  r_{k+1}(v) = (1-d)/N + d * Σ_{u→v} r_k(u)/deg(u)
over the undirected-expanded edge set; every inferred vertex has degree ≥ 1
so there is no dangling mass (SURVEY §8 Hard #6: deg/N are per *original*
vertex — the tag is the true identity everywhere except edge routing).

Scale notes:
- scatter join keyed on the *salted* src sub-vertex id — balanced;
- rank/deg contributions summed with groupBy(dst_tag): sum is reducible so
  map-side partial aggregation bounds the hub's reduce fan-in;
- iterative hot path runs on xxhash64-encoded LONG keys (collision-checked,
  see encoding.py) — 8-byte keys cut shuffle bytes and hash cost ~3-4x vs
  the raw string ids; results decode through the tag dictionary at the end;
- shuffle_hash join hints: every build side is vertex-sized, and sort-merge
  would re-sort the 2|E| edge side per superstep;
- convergence = L∞(new-old) ≤ tol, folded into the same superstep action
  via the runner's ``_changed`` flag (no second pass).

PageRank values are invariant under the id encoding (ranks attach to tags;
only join keys change), so the NumPy-oracle and plain≡split tests cover
both paths; ``use_long_ids=False`` forces the string path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..encoding import IdCollisionError, decode, encode_split_graph
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


def pagerank(
    edges: DataFrame | None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iterations: int = 100,
    fixed_iterations: int | None = None,
    split: bool = True,
    threshold: int | None = 2,
    alpha: int = 2,
    level: int = 4,
    mode: str = "flat",
    use_long_ids: bool = True,
    broadcast_threshold_vertices: int | None = None,
    broadcast_state_budget_bytes: int = DEFAULT_BROADCAST_STATE_BUDGET,
    superstep_batch: int = 1,
    prepared=None,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(id, rank). ``fixed_iterations`` disables the tolerance check (used
    by the SQL-oracle query, which unrolls exactly that many steps).

    ``superstep_batch=K`` chains K supersteps per materializing action —
    identical results (the chain is the same plan, composed lazily), but
    the per-job driver overhead amortizes K-fold. Worth it on small graphs
    where a superstep's compute is sub-second; convergence is then only
    observed every K steps (≤ K−1 overshoot supersteps after the fixpoint).

    ``prepared`` (a ``sources.graph_store.PreparedGraph``) is the restart
    path: the split/encode/bucketed layout was persisted by an earlier run,
    so this call skips the split AND the initial repartition — the bucketed
    scan already carries HashPartitioning(src), so the edge side never
    exchanges, cold start included. ``split/threshold/alpha/level/mode/
    use_long_ids`` are baked into the persisted layout and ignored here.
    """
    if prepared is not None:
        spark = prepared.edges.sparkSession
        # bucketed tables: the scan's HashPartitioning(src) replaces the
        # repartition+localCheckpoint below; cache keeps re-scans in memory
        # (InMemoryRelation preserves the bucketed partitioning)
        e = prepared.edges.select("src", "dst_tag").cache()
        sub_deg = prepared.sub_deg.cache()
        tag_dict = prepared.tag_dict
        deg = prepared.degrees().localCheckpoint(eager=True)
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

        tag_dict = None
        if use_long_ids:
            try:
                eg = encode_split_graph(sg)
                sub_raw, e_raw, tag_dict = eg.vertices, eg.edges, eg.tag_dict
            except IdCollisionError:
                use_long_ids = False
        if not use_long_ids:
            sub_raw, e_raw = sg.vertices, sg.edges.select("src", "dst_tag", "w")

        # Static per-superstep inputs. Pre-hash-partition the routing edges
        # by the scatter-join key and localCheckpoint: LogicalRDD preserves
        # the partitioning, so every superstep's edge-side exchange is
        # elided — only the (vertex-sized) rank table shuffles per
        # iteration.
        sub = sub_raw.localCheckpoint(eager=True)
        e = checkpoint_static(
            e_raw.select("src", "dst_tag").repartition(F.col("src"))
        )

        # Undirected degree per original vertex: on the undirected-expanded
        # set the in-rows of a tag equal its out-rows, so groupBy(dst_tag)
        # works on both the encoded and string representations.
        deg = (
            e.groupBy(F.col("dst_tag").alias("tag"))
            .agg(F.count("*").cast("double").alias("deg"))
            .localCheckpoint(eager=True)
        )
        # contribution weight rank/deg travels with each sub-vertex
        sub_deg = (
            sub.join(deg.withColumnRenamed("tag", "t"), sub["tag"] == F.col("t"))
            .select(F.col("id").alias("src"), "tag", "deg")
            .localCheckpoint(eager=True)
        )

    n = deg.count()
    base = (1.0 - damping) / n
    init = deg.select("tag", F.lit(1.0 / n).alias("rank"))

    check_conv = fixed_iterations is None
    iters = fixed_iterations if fixed_iterations is not None else max_iterations

    # Two scatter strategies:
    # - broadcast-state (V ≤ threshold): the rank table (~16 B/vertex) is
    #   broadcast and map-joined against a static (dst_tag, tag, deg) edge
    #   table — the 2|E| side never shuffles; the only shuffle per
    #   superstep is the V-sized gather partials. Local/medium clusters.
    # - salted shuffle (V > threshold): state too big to broadcast —
    #   sub-vertex routing (the reference's Split-Merge) with shuffle_hash
    #   hints (build sides are vertex-sized; SMJ would re-sort the edge
    #   side each superstep — measured 2-3x slower in superstep_tune.py).
    if broadcast_threshold_vertices is not None:
        use_broadcast = n <= broadcast_threshold_vertices
    else:
        # byte budget, not row count: the state is re-broadcast EVERY
        # superstep, so it must be a small fraction of driver/executor
        # memory (VERDICT r1 #6)
        use_broadcast = fits_broadcast_budget(
            n, init.schema, broadcast_state_budget_bytes
        )
    if use_broadcast:
        e2 = checkpoint_static(
            e.join(sub_deg.hint("shuffle_hash"), "src").select("dst_tag", "tag", "deg")
        )
    # mid-regime storage promotion: the routing table was checkpointed
    # serialized (safe at-scale default); now that sum(deg) gives its row
    # count for free, convert the per-superstep scan side to the
    # deserialized layout when it comfortably fits storage memory —
    # measured 1.4-1.6x per superstep (see maybe_promote_static)
    if prepared is None:
        e_rows = int(deg.agg(F.sum("deg")).first()[0] or 0)
        if use_broadcast:
            e2 = maybe_promote_static(e2, e_rows, spark)
        else:
            e = maybe_promote_static(e, e_rows, spark)

    def step(state: DataFrame, i: int):
        if use_broadcast:
            msgs = (
                e2.join(F.broadcast(state), "tag")
                .groupBy(F.col("dst_tag").alias("tag"))
                .agg(F.sum(F.col("rank") / F.col("deg")).alias("mass"))
            )
        else:
            sub_rank = sub_deg.join(state.hint("shuffle_hash"), "tag").select(
                "src", (F.col("rank") / F.col("deg")).alias("contrib")
            )
            msgs = (
                e.join(sub_rank.hint("shuffle_hash"), "src")
                .groupBy(F.col("dst_tag").alias("tag"))
                .agg(F.sum("contrib").alias("mass"))
            )
        new_rank = F.lit(base) + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
        cols = ["tag", new_rank.alias("rank")]
        if check_conv:
            # F.col('rank') here is the *input* (old) rank — the alias above
            # only names the output column.
            cols.append((F.abs(new_rank - F.col("rank")) > tol).alias(CHANGED))
        return state.join(msgs.hint("shuffle_hash"), "tag", "left").select(*cols)

    runner = runner or SuperstepRunner(spark)
    # superstep_batch=AUTO_BATCH (0) → the runner measures superstep 1 and
    # picks K itself (choose_batch_size)
    if superstep_batch != 1 and runner.batch_size == 1:
        runner.batch_size = superstep_batch
    if runner.fingerprint is None:
        fp = (
            f"pagerank:v2:damping={damping}:tol={tol}:fixed={fixed_iterations}:"
            f"split={split}:threshold={threshold}:alpha={alpha}:level={level}:mode={mode}"
        )
        if runner.checkpoint_dir:
            # input identity: resuming this dir against a different edge
            # table must start fresh, not load matching-schema stale state
            fp += f":data[{data_fingerprint(e, 'src', 'dst_tag')}]"
        runner.fingerprint = fp
    final = runner.run(init, step, iters)
    if tag_dict is not None:
        final = decode(final, tag_dict, col="tag")
    return final.select(F.col("tag").alias("id"), "rank")
