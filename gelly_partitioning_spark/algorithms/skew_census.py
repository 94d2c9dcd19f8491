"""Skew census: count vertices with degree above a threshold.

Reference: util/CountSkewedVertices.java:20-51 (threshold 1000 at :34).
One grouped count + one filter + one global count — all reducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import degrees, normalize_edges


def skew_census(edges: DataFrame, threshold: int = 1000) -> DataFrame:
    """Single-row (skewed_vertices: long)."""
    deg = degrees(normalize_edges(edges))
    return deg.filter(F.col("degree") > threshold).agg(
        F.count("*").cast("long").alias("skewed_vertices")
    )
