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
- ``sessionize``: gap-based sessionization, batch flavor (lag window; also
  exposed to the SQL oracle).
- ``sessionize_stream``: the stateful streaming flavor via
  ``applyInPandasWithState`` — O(#users) state (one open session per
  user), a session row is EMITTED when it closes (a newer event lands
  beyond the gap). The batch flavor is its oracle twin in tests; the
  reference itself has no streaming semantics to match (SURVEY §2.10).
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


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_minutes: int | None = None,
) -> DataFrame:
    """Streaming gap-sessionization with explicit state (append mode).

    Per user the state store holds ONE open session (start, end, n) —
    bounded O(#users) state, never O(#events). Each micro-batch folds its
    rows (event-time order within the batch) into the open session:

      - gap exceeded → emit the closed session, open a new one
      - otherwise    → extend (modestly late rows merge: start=min,
                       end=max — same outcome the batch flavor produces
                       when the late row belongs to the open session)
      - VERY late (older than the open session's start by more than the
        gap) → chained into its own earlier session and emitted closed
        (never silently absorbed); it merges back into the open session
        only when the chain reaches within the gap of ``start``. A late
        row whose true batch-session was already emitted closed cannot
        retro-merge — inherent to unwatermarked streaming; such rows
        surface as an extra session rather than disappearing.

    ``watermark_minutes`` bounds lateness explicitly (VERDICT r4 #6):
    a row older than ``watermark_minutes`` behind the user's maximum
    PREVIOUSLY-SEEN event time (the open session's ``end`` — monotone
    nondecreasing across batches by construction) is DROPPED, never
    sessionized. Dropped-row semantics: such a row's true batch-session
    may already have been emitted closed, so emitting it as a fresh
    session would diverge from the batch flavor anyway; with the
    watermark the divergence window is bounded — the stream output
    equals the batch flavor run on the watermark-filtered input (tested).
    Rows within the same micro-batch are never late relative to each
    other (the per-batch fold sorts first), matching Spark's own
    watermark convention of advancing on batch boundaries. ``None``
    (default) keeps the unbounded-lateness behavior: very-late rows emit
    their own session rather than disappearing.

    The final open session per user stays in state until a later event
    closes it — standard append-mode streaming semantics. Cross-checked
    against the batch ``sessionize`` oracle in tests (late rows included).
    Arrow-batched pandas throughout; state round-trips as epoch ns longs.
    """
    import pandas as pd  # noqa: F401 (vectorized batches)
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ns = int(gap_minutes) * 60 * 1_000_000_000
    wm_ns = (
        None if watermark_minutes is None else int(watermark_minutes) * 60 * 1_000_000_000
    )
    uid_type = dict(events.dtypes)["user_id"]
    out_schema = (
        f"user_id {uid_type}, session_start timestamp, "
        "session_end timestamp, n_events long"
    )
    state_schema = "start long, end long, n long"

    def fn(key, pdfs, state):
        import pandas as pd

        (user,) = key
        if state.exists:
            start, end, n = state.get
        else:
            start = end = None
            n = 0
        closed = []
        # collect ALL Arrow chunks first and sort ONCE — per-chunk sorting
        # would let cross-chunk disorder close a session early and then
        # misfold an earlier row into the newer session (ADVICE r3)
        ts_all = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["ts"])
            if getattr(ts.dt, "tz", None) is not None:
                ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
            ts_all.extend(v.value for v in ts)
        ts_all.sort()
        if wm_ns is not None and end is not None:
            # lateness bound: `end` is this user's max event time across
            # all PRIOR batches (monotone by construction); rows more than
            # the watermark behind it are dropped, never sessionized
            ts_all = [t for t in ts_all if t >= end - wm_ns]
        # chain of VERY late rows (older than the open session by more
        # than the gap): they form their own earlier session(s) instead of
        # being absorbed via start=min (ADVICE r3). Sorted order means one
        # pending chain suffices; it merges into the open session iff it
        # walks to within the gap of `start`.
        lstart = lend = None
        ln = 0

        def resolve_late():
            nonlocal start, n, lstart, lend, ln
            if lstart is None:
                return
            if lend + gap_ns >= start:
                start = min(start, lstart)
                n += ln
            else:
                closed.append((user, lstart, lend, ln))
            lstart = lend = None
            ln = 0

        for t in ts_all:
            if start is None:
                start = end = t
                n = 1
            elif t > end + gap_ns:
                resolve_late()
                closed.append((user, start, end, n))
                start = end = t
                n = 1
            elif t >= start - gap_ns:
                start = min(start, t)
                end = max(end, t)
                n += 1
            elif lstart is None:
                lstart, lend, ln = t, t, 1
            elif t > lend + gap_ns:
                closed.append((user, lstart, lend, ln))
                lstart, lend, ln = t, t, 1
            else:
                lend = max(lend, t)
                ln += 1
        if start is not None:
            resolve_late()
            state.update((start, end, n))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1]) for c in closed],
                    "session_end": [pd.Timestamp(c[2]) for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
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
