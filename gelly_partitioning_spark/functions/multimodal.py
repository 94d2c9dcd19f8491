"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partitioning, Arrow batch shape, mapInPandas
signatures) is real and tested, while the codec step is stubbed — the
sandbox has no image/audio libraries, so ``decode_image`` raises
``NotImplementedError`` unless ``fake=True`` supplies the deterministic
test decoder (content-hash-derived "pixels").

At scale: binary payloads dominate bytes — the schema keeps metadata in
separate top-level columns so metadata-only queries never read the blob
(parquet column pruning), and ``mapInPandas`` processes Arrow batches so
the Python boundary is amortized per-batch, never per-row.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms long, payload binary"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<double>"


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a deterministic binary payload column from text content
    (test/bench stand-in for real blobs; sha-derived, stable)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/x-fake").alias("mime"),
        (F.pmod(F.xxhash64(F.col(text_col)), F.lit(64)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.col(text_col), F.lit(1)), F.lit(64)) + 16).cast("int").alias("height"),
        F.lit(0).cast("long").alias("duration_ms"),
        F.encode(F.sha2(F.col(text_col), 256), "utf-8").alias("payload"),
    )


def _fake_decode(payload: bytes, n: int = 8) -> list:
    """Deterministic stand-in decoder: n pseudo-pixels from the payload."""
    h = hashlib.sha256(payload).digest()
    return [h[i] / 255.0 for i in range(n)]


def extract_features(media: DataFrame, fake: bool = True, feature_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    Real deployments swap ``_fake_decode`` for an actual codec; the batch
    iteration, schema, and column pruning are production-shaped. The blob
    column is only materialized inside the UDF's input batches.
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decoding requires codec libraries not present "
            "in this environment; run with fake=True for the deterministic "
            "test decoder"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": pdf["payload"].map(lambda p: _fake_decode(bytes(p), feature_dim)),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Expand video rows into frame-sampling tasks (metadata only — the
    planner never touches payloads; ``sequence`` is JVM-side)."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )
