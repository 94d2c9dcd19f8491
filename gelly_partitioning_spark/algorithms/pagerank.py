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
- convergence = L∞(new-old) ≤ tol, folded into the same superstep action
  via the runner's ``_changed`` flag (no second pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import normalize_edges
from ..splitting import split_graph
from ..superstep import CHANGED, SuperstepRunner


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iterations: int = 100,
    fixed_iterations: int | None = None,
    split: bool = True,
    threshold: int = 2,
    alpha: int = 2,
    level: int = 4,
    mode: str = "flat",
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(id, rank). ``fixed_iterations`` disables the tolerance check (used
    by the SQL-oracle query, which unrolls exactly that many steps)."""
    edges = normalize_edges(edges)
    spark = edges.sparkSession
    sg = split_graph(
        edges,
        threshold=threshold if split else 2**62,
        alpha=alpha,
        level=level,
        mode=mode,
    )
    # Static per-superstep inputs. Pre-hash-partition the routing edges by
    # the scatter-join key and localCheckpoint: LogicalRDD preserves the
    # partitioning, so every superstep's edge-side exchange is elided —
    # only the (vertex-sized) rank table shuffles per iteration.
    sub = sg.vertices.localCheckpoint(eager=True)
    e = (
        sg.edges.select("src", "dst_tag")
        .repartition(F.col("src"))
        .localCheckpoint(eager=True)
    )

    # Undirected degree per original vertex = #rows with src_tag == tag.
    deg = (
        sg.edges.groupBy(F.col("src_tag").alias("tag"))
        .agg(F.count("*").cast("double").alias("deg"))
        .localCheckpoint(eager=True)
    )
    n = deg.count()
    base = (1.0 - damping) / n

    init = deg.select("tag", F.lit(1.0 / n).alias("rank"))
    # contribution weight rank/deg travels with each sub-vertex
    sub_deg = (
        sub.join(deg, "tag")
        .select(F.col("id").alias("src"), "tag", "deg")
        .localCheckpoint(eager=True)
    )

    check_conv = fixed_iterations is None
    iters = fixed_iterations if fixed_iterations is not None else max_iterations

    def step(state: DataFrame, i: int):
        sub_rank = sub_deg.join(state, "tag").select(
            "src", (F.col("rank") / F.col("deg")).alias("contrib")
        )
        msgs = (
            e.join(sub_rank, "src")
            .groupBy(F.col("dst_tag").alias("tag"))
            .agg(F.sum("contrib").alias("mass"))
        )
        new_rank = F.lit(base) + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
        cols = ["tag", new_rank.alias("rank")]
        if check_conv:
            # F.col('rank') here is the *input* (old) rank — the alias above
            # only names the output column.
            cols.append((F.abs(new_rank - F.col("rank")) > tol).alias(CHANGED))
        return state.join(msgs, "tag", "left").select(*cols)

    runner = runner or SuperstepRunner(spark)
    final = runner.run(init, step, iters)
    return final.select(F.col("tag").alias("id"), "rank")
