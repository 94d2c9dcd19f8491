"""Degree count over the split graph.

Reference: library/CountDegree.java:12-59 driven by
SortDegreeNodeSplitting.java:28-97 (split path) — undirected degree per
original vertex, computed on the *split* edge set then tree-merged.
Golden fixture: util/NodeSplittingData.java:55-57.

Spark shape: per-sub-vertex partial count (groups bounded by the split) →
single ``groupBy(tag).sum`` merge. Two shuffles total, both balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import degrees, normalize_edges, undirected
from ..splitting import merge_by_tag, split_graph
from ..superstep import checkpoint_static, plan_size_hint_bytes

# Single-task budget (the same fourth rung pagerank/cc/triangle got in
# r6): when the exploded endpoint column fits one task's memory, the
# whole count runs as ONE vectorized value_counts inside a mapInPandas
# task — no shuffle, no broadcast build, no per-stage scheduling. ~64
# bytes per exploded row (the id string + hash-table working set), two
# rows per edge. 0 disables the tier.
DEFAULT_SINGLE_TASK_BUDGET = 256 << 20
_SINGLE_TASK_ROW_BYTES = 64


def _single_task_degree(edges: DataFrame) -> DataFrame:
    """(id, degree) in one task — exact hash-based counts, no sort.

    Identical results by construction: degree = multiplicity of the id in
    the exploded (src ∪ dst) multiset, which IS the undirected degree
    (``undirected`` is a plain union, no dedup), and the id strings pass
    through Arrow untouched.
    """
    ids = edges.select(F.explode(F.array("src", "dst")).alias("id"))

    def run(pdfs):
        import pandas as pd

        chunks = [c for c in pdfs]
        if not chunks:
            return
        vc = pd.concat([c["id"] for c in chunks], ignore_index=True).value_counts(
            sort=False
        )
        yield pd.DataFrame(
            {"id": vc.index.to_numpy(), "degree": vc.to_numpy().astype("int64")}
        )

    return ids.coalesce(1).mapInPandas(run, "id string, degree long")


def degree_count(
    edges: DataFrame,
    split: bool = True,
    threshold: int | None = 2,
    alpha: int = 2,
    level: int = 4,
    mode: str = "flat",
    single_task_budget_bytes: int = DEFAULT_SINGLE_TASK_BUDGET,
) -> DataFrame:
    """(id, degree): undirected degree per original vertex.

    r6 restructure (guide §1.2 no duplicate passes): the round-start
    shape derived the split fan-out table from the shared undirected
    cache in a way that made BOTH broadcast fan-out builds re-run the
    full degree aggregation (the two BroadcastExchange subtrees each
    carried their own groupBy in the plan). The distributed path now
    derives ONE lazily-checkpointed degree table from the same lazily-
    checkpointed undirected expansion — each is computed exactly once
    (und on the first fan-out build, deg alongside it; the second fan-out
    broadcast and the rewrite join read the caches). Below
    ``single_task_budget_bytes`` the whole count instead runs as one
    vectorized value_counts task (``_single_task_degree``) — the same
    budget-gated smallest-regime rung pagerank/cc grew this round.
    (Eagerly pre-materializing degree+und the way the ITERATIVE consumers
    do measured 4.4 s vs 2.3 s here — that direction stays rejected.)
    """
    edges = normalize_edges(edges)
    if single_task_budget_bytes:
        # one cheap probe job (count on the — usually cached — edge set);
        # the split/distributed pipeline below is the >budget path, same
        # tiering as pagerank/cc (physical strategy only, identical
        # rows). The jobless Catalyst-stats hint skips the tier AND its
        # count for obviously-oversized inputs (at scale that count is a
        # full scan).
        hint = plan_size_hint_bytes(edges)
        e_rows = (
            0
            if hint is not None and hint > 8 * single_task_budget_bytes
            else edges.count()
        )
        if 0 < 2 * e_rows * _SINGLE_TASK_ROW_BYTES <= single_task_budget_bytes:
            return _single_task_degree(edges)
    if not split:
        return degrees(edges)
    und = checkpoint_static(undirected(edges), eager=False)
    deg = (
        und.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").cast("long").alias("degree"))
        .localCheckpoint(eager=False)
    )
    sg = split_graph(
        edges,
        threshold=threshold,
        alpha=alpha,
        level=level,
        mode=mode,
        degree_df=deg,
        und_df=und,
    )
    partial = sg.edges.groupBy("src", "src_tag").agg(F.count("*").alias("pdeg"))
    merged = merge_by_tag(
        partial.select(F.col("src_tag").alias("tag"), "pdeg"),
        [F.sum("pdeg").cast("long").alias("degree")],
    )
    return merged.select(F.col("tag").alias("id"), "degree")
