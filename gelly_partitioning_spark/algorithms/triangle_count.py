"""Triangle count — relational 3-join with degree orientation.

Reference: example/TriangleCount.java:28-91 / NodeSplittingTriangleCount
(2-superstep higher-id wedge propagation). Golden:
util/TriangleCountData.java:31 = 3. SURVEY.md §3.3: only the count must
match — the idiomatic, scalable Spark form is the canonical-edge self-join.

Skew strategy — *degree orientation* instead of hub salting: orient every
undirected simple edge from the lower-(degree, id) endpoint to the higher
one. Every triangle then has exactly one wedge at its lowest-ranked vertex,
and the per-vertex wedge fan-out is bounded by the graph's degeneracy
(out-degree after orientation), not by raw hub degree — a degree-10^8 hub
generates *zero* wedges from its own adjacency because nearly all its edges
point *into* it. This subsumes what the reference's node splitting buys for
its wedge gather, with one fewer shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import canonical_edges, normalize_edges
from ..superstep import (
    estimate_row_bytes,
    fits_broadcast_budget,
    session_broadcast_threshold,
)


def oriented_edges(edges: DataFrame, already_canonical: bool = False) -> DataFrame:
    """Canonical simple edges re-oriented low→high by (degree, id).

    ``already_canonical=True`` skips the canonicalization pass when the
    caller hands in an (id-canonical, distinct) edge set it has already
    materialized — re-running canonical_edges would pay a second distinct
    shuffle for nothing (guide §2.4).

    The degree table is materialized once (it is consumed by BOTH
    attachment joins — unmaterialized it would be computed twice) and
    explicitly broadcast when its measured size fits the session's
    broadcast budget: checkpointed inputs carry no stats, so Catalyst
    would otherwise plan two full sort-merge shuffles of the edge set
    just to attach two small integer columns (guide §3.1). Vertex tables
    above the budget fall back to plain shuffle joins.
    """
    canon = edges if already_canonical else canonical_edges(edges)
    spark = canon.sparkSession
    deg = (
        canon.select(F.col("src").alias("id"))
        .unionByName(canon.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
        .localCheckpoint(eager=True)
    )
    nv = deg.count()
    budget = session_broadcast_threshold(spark)
    bcast = fits_broadcast_budget(nv, deg.schema, budget)
    sd = deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "sd")
    dd = deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "dd")
    if bcast:
        sd, dd = F.broadcast(sd), F.broadcast(dd)
    e = canon.join(sd, "src").join(dd, "dst")
    lower_first = (F.col("sd") < F.col("dd")) | (
        (F.col("sd") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    )


def triangle_count(edges: DataFrame, assume_canonical: bool = False) -> DataFrame:
    """Single-row DataFrame (triangles: long) — global triangle count.

    ``assume_canonical=True``: the caller guarantees ``edges`` is already
    an id-canonical (src < dst), self-loop-free, distinct simple edge set
    (e.g. the co-occurrence builder emits exactly that), so the
    canonicalization pass — a full distinct shuffle — is skipped. Results
    are identical by construction; canonical_edges is idempotent on such
    input.

    The canonical edge set is materialized ONCE and both the orientation
    pass and the wedge-close join derive from it (r5 recomputed the whole
    upstream plan — e.g. the co-occurrence self-join + distinct — twice,
    once per localCheckpoint; guide §1.2). The wedge/close joins run on
    xxhash64-encoded 8-byte keys when the hash is injective on the vertex
    set (one vertex-sized agg verifies; fall back to strings otherwise —
    the count only needs SOME total order and pair identity, never the id
    strings themselves; see encoding.py for the collision policy).
    """
    edges = normalize_edges(edges)
    canon = (
        edges.select("src", "dst") if assume_canonical else canonical_edges(edges)
    ).localCheckpoint(eager=True)
    c = canon.select(F.explode(F.array("src", "dst")).alias("id")).agg(
        F.countDistinct("id").alias("ids"),
        F.countDistinct(F.xxhash64("id")).alias("hids"),
    ).first()
    if c["ids"] == c["hids"]:
        # re-canonicalize the (distinct) pairs in hash space: least/
        # greatest is a narrow reorientation, no second distinct needed
        hs, hd = F.xxhash64("src"), F.xxhash64("dst")
        canon = canon.select(
            F.least(hs, hd).alias("src"), F.greatest(hs, hd).alias("dst")
        )
    o = oriented_edges(canon, already_canonical=True).localCheckpoint(eager=True)
    # The wedge table (Σ C(outdeg, 2) rows) is the LARGEST relation in
    # this query — orders of magnitude bigger than the edge set. When the
    # EDGE set fits the session broadcast budget, broadcast it on both
    # sides so the wedges are generated and closed inside one map-side
    # pass and never shuffled at all (guide §2.3: shuffle keys/metadata,
    # not the biggest table; §3.1). Above the budget: plain equi-joins,
    # which shuffle wedges — unavoidable when |E| itself is huge.
    n_e = canon.count()  # cached by the checkpoint — metadata-cheap
    small = fits_broadcast_budget(
        n_e, canon.schema, session_broadcast_threshold(canon.sparkSession)
    )
    # wedges at the lowest-ranked vertex: (a→b, a→c), one unordered pair
    # per wedge via id-order b < c
    oy = F.broadcast(o.alias("y")) if small else o.alias("y")
    w = (
        o.alias("x")
        .join(oy, F.col("x.lo") == F.col("y.lo"))
        .filter(F.col("x.hi") < F.col("y.hi"))
        .select(F.col("x.hi").alias("src"), F.col("y.hi").alias("dst"))
    )
    # close the wedge against the id-canonical edge set — pure equi-join on
    # (src, dst), shuffle-hash/SMJ friendly, no OR predicate
    tri = w.join(F.broadcast(canon) if small else canon, ["src", "dst"], "inner")
    return tri.agg(F.count("*").cast("long").alias("triangles"))
