"""Persisted, cell-bucketed IVF index — the similarity-tier restart path.

The ``PreparedGraph`` analog for ANN (VERDICT r4 #2 / SCALE.md Remaining):
``ivf_topk`` recomputing the coarse-quantizer assignment on every call is
one broadcast argmax over the whole corpus — cheap once, wrong to repeat
for every query batch at 10^9 vectors. This module runs the quantizer ONCE
and persists:

- ``<name>_ivf_assign``: ``(cell, rid, rv)`` — every corpus vector, its
  unit-normalized embedding, and its nearest-centroid cell, written as a
  Spark **bucketed table** (``bucketBy(n, 'cell')`` + ``sortBy('cell')``):
  the on-disk layout IS the hash partitioning the probe join needs, so the
  corpus side of ``probes ⋈ assign ON cell`` never exchanges (only the
  query-sized probe side shuffles to the bucket count). ``sortBy('cell')``
  additionally gives every parquet row group tight cell min/max stats, so
  a ``cell IN (<probed>)`` pushdown skips non-probed row groups — the
  "read only nprobe buckets" behavior (the probed-cell set is bounded by
  ``n_centroids``, so deriving it is one tiny job).
- ``<name>_ivf_centroids``: the ``(cid, cv)`` table — ``n_centroids``
  rows, broadcast at probe time.

Same determinism contract as ``ivf_topk``: centroids are the
``n_centroids`` corpus vectors with smallest ``md5(id)`` (portable, no
RNG), assignment is the dec6-rounded argmax cosine with smallest-cid
tie-break — so a search through the prepared index returns bit-identical
results to the recompute-everything path (and the same DuckDB oracle).

At 100 TB: the assignment table is the corpus (unit vectors dominate
bytes); bucketing it by cell is the one-time full shuffle this index
exists to amortize. Iceberg's ``bucket(n, cell)`` partition transform is
the same layout for a real lakehouse deployment.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class PreparedIndex:
    """Handle over the persisted IVF layout.

    assign:    (cell, rid, rv) — bucketed by cell (the probe-join side).
    centroids: (cid, cv) — n_centroids rows, broadcast at probe time.
    """

    assign: DataFrame
    centroids: DataFrame
    name: str


def _table(name: str, suffix: str) -> str:
    return f"{name}_ivf_{suffix}"


def save_prepared_index(
    df: DataFrame,
    name: str,
    base_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    refine_iterations: int = 0,
    buckets: int = 16,
) -> PreparedIndex:
    """Quantize ``df`` once; persist the cell-bucketed assignment.

    ``n_centroids`` / ``refine_iterations`` are baked into the layout — a
    different quantizer means re-preparing, exactly like re-bucketing.
    """
    from ..functions.similarity import _quantize

    spark = df.sparkSession
    cent, ranked = _quantize(df, vec_col, id_col, n_centroids, refine_iterations)
    assign = ranked.filter(F.col("crk") == 1).select(
        F.col("cid").alias("cell"), F.col("id").alias("rid"), F.col("_unit").alias("rv")
    )

    tbl = _table(name, "assign")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        assign.select("cell", "rid", "rv")
        .write.mode("overwrite")
        .bucketBy(buckets, "cell")
        .sortBy("cell")
        .option("path", f"{base_path}/assign")
        .format("parquet")
        .saveAsTable(tbl)
    )
    ctbl = _table(name, "centroids")
    spark.sql(f"DROP TABLE IF EXISTS {ctbl}")
    cent.write.mode("overwrite").option("path", f"{base_path}/centroids").format(
        "parquet"
    ).saveAsTable(ctbl)
    return load_prepared_index(spark, name)


def load_prepared_index(spark: SparkSession, name: str) -> PreparedIndex:
    """Reopen a persisted IVF layout by name (same metastore/warehouse)."""
    return PreparedIndex(
        assign=spark.table(_table(name, "assign")),
        centroids=spark.table(_table(name, "centroids")),
        name=name,
    )
