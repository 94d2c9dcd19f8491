"""Internal long-id encoding for the iterative hot path.

String vertex ids ('r:repo-1234', 'p:src/.../mod.rs') cost 3-4x the
shuffle bytes and hash/compare time of a fixed 8-byte key. The iterative
algorithms therefore run on ``xxhash64``-encoded long keys internally and
join back to strings only at the output boundary.

Collision policy: xxhash64 over |V| distinct ids collides with probability
~|V|^2 / 2^65 (≈4e-8 at 1.2M, ≈2.7% at 1e9). ``encode_split_graph``
VERIFIES injectivity with one distinct-count job and raises if a collision
exists — at which point the caller falls back to the exact string path
(correctness is never probabilistic; the hash is an optimization with a
checked precondition). A dense dictionary (zipWithIndex-style) is the
future path for 1e9+ vertex graphs where collisions become likely.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .splitting import SplitGraph


class IdCollisionError(RuntimeError):
    pass


@dataclass
class EncodedGraph:
    """Long-keyed split graph + tag dictionary.

    edges:    (src: long, dst_tag: long, w: double)
    vertices: (id: long, tag: long)
    tag_dict: (tag: long, tag_str: string) — for decoding results
    """

    edges: DataFrame
    vertices: DataFrame
    tag_dict: DataFrame


def encode_split_graph(sg: SplitGraph, check: bool = True) -> EncodedGraph:
    edges = sg.edges.select(
        F.xxhash64("src").alias("src"),
        F.xxhash64("dst_tag").alias("dst_tag"),
        "w",
    )
    vertices = sg.vertices.select(
        F.xxhash64("id").alias("id"), F.xxhash64("tag").alias("tag")
    )
    tag_dict = (
        sg.vertices.select("tag")
        .distinct()
        .select(F.xxhash64("tag").alias("tag"), F.col("tag").alias("tag_str"))
        .localCheckpoint(eager=False)
    )
    if check:
        counts = sg.vertices.agg(
            F.countDistinct("id").alias("ids"),
            F.countDistinct(F.xxhash64("id")).alias("hids"),
            F.countDistinct("tag").alias("tags"),
            F.countDistinct(F.xxhash64("tag")).alias("htags"),
        ).collect()[0]
        if counts["ids"] != counts["hids"] or counts["tags"] != counts["htags"]:
            raise IdCollisionError(
                f"xxhash64 id collision: {counts} — use the string path"
            )
    return EncodedGraph(edges=edges, vertices=vertices, tag_dict=tag_dict)


def decode(df: DataFrame, tag_dict: DataFrame, col: str = "tag") -> DataFrame:
    """Replace the long ``col`` with its original string via the dictionary."""
    out_cols = [c for c in df.columns if c != col]
    return (
        df.join(tag_dict, df[col] == tag_dict["tag"], "inner")
        .select(F.col("tag_str").alias(col), *out_cols)
    )
