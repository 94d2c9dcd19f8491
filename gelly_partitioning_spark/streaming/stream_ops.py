"""Structured Streaming operators.

The reference is pure batch (SURVEY.md §2.10 — no watermarks, windows, or
state stores anywhere in the tree); this module is engine-added surface for
the continuous-ingest side of a link-graph pipeline:

- ``stream_edges_from_directory`` / ``incremental_degrees``: edges arriving
  as parquet files; degree table maintained incrementally (update-mode
  streaming aggregation). At scale this is the ingestion front of the
  engine: append-only edge log → compacted degree/skew statistics that the
  batch Split-Merge jobs read to pick thresholds.
- ``windowed_event_counts``: tumbling event-time window with watermark —
  the canonical late-data-tolerant aggregation.
- ``sessionize``: gap-based sessionization. Batch flavor uses a lag window
  (also exposed to the SQL oracle); the streaming flavor would use
  ``applyInPandasWithState`` — kept batch-first here since the reference
  has no streaming semantics to match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

EDGE_STREAM_SCHEMA = "src string, dst string, w double"


def stream_edges_from_directory(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a parquet edge directory (append-only edge log)."""
    return (
        spark.readStream.schema(EDGE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
    )


def incremental_degrees(edge_stream: DataFrame) -> DataFrame:
    """Continuously-maintained undirected degree table (update mode).

    groupBy on vertex id over the both-direction expansion; sum-reducible,
    so Spark keeps one row of state per vertex — O(V) state, never O(E).
    """
    und = edge_stream.select(F.col("src").alias("id")).unionByName(
        edge_stream.select(F.col("dst").alias("id"))
    )
    return und.groupBy("id").agg(F.count("*").cast("long").alias("degree"))


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """(window_start, event_type, n_events, sum_value) tumbling windows.

    Works identically over a static frame (batch backfill / oracle
    comparison) and a stream (late rows beyond the watermark dropped).
    """
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, session_start, session_end, n_events).

    Classic gap-based sessions: a new session starts when the user's
    inter-event gap exceeds ``gap_minutes``. Lag + cumulative-sum windows,
    fully parallel per user partition.
    """
    w_user = Window.partitionBy("user_id").orderBy("ts")
    gap = F.lag("ts").over(w_user)
    new_session = (
        F.when(gap.isNull(), F.lit(1))
        .when(
            # double-precision epoch keeps microsecond resolution (events
            # carry sub-second timestamps) and matches the SQL oracle's
            # epoch(ts) arithmetic exactly
            # TIMESTAMP_NTZ needs the intermediate cast; session tz is
            # pinned to UTC so this equals the oracle's epoch(ts)
            F.col("ts").cast("timestamp").cast("double")
            - gap.cast("timestamp").cast("double")
            > gap_minutes * 60.0,
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    with_sess = events.withColumn("new_s", new_session).withColumn(
        "session_seq", F.sum("new_s").over(w_user)
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_id"),
            "session_start",
            "session_end",
            "n_events",
        )
    )
