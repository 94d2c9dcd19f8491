"""Streaming surface: incremental degrees via availableNow trigger,
windowed counts batch≡stream, sessionization sanity."""

import time

from pyspark.sql import functions as F

from gelly_partitioning_spark.streaming import (
    incremental_degrees,
    sessionize,
    stream_edges_from_directory,
    windowed_event_counts,
)

from .conftest import HUB_DEGREES, HUB_EDGES

SF_DIR = "/root/testdata/sf0.001"


def test_incremental_degrees_matches_batch(spark, tmp_path, hub_graph):
    src_dir = tmp_path / "edges"
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    # write the hub graph as two separate parquet batches
    half = len(HUB_EDGES) // 2
    spark.createDataFrame(
        [(str(a), str(b), 1.0) for a, b in HUB_EDGES[:half]],
        "src string, dst string, w double",
    ).write.mode("append").parquet(str(src_dir))
    spark.createDataFrame(
        [(str(a), str(b), 1.0) for a, b in HUB_EDGES[half:]],
        "src string, dst string, w double",
    ).write.mode("append").parquet(str(src_dir))

    stream = stream_edges_from_directory(spark, str(src_dir))
    assert stream.isStreaming
    deg = incremental_degrees(stream)
    q = (
        deg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("deg_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["id"]: r["degree"]
        for r in spark.sql("select * from deg_stream").collect()
    }
    assert got == HUB_DEGREES


def test_windowed_event_counts_on_events(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = windowed_event_counts(events, window="1 hour")
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    # window starts are aligned to the hour
    assert all(r["window_start"].minute == 0 for r in rows)


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, base, "a", 1.0, "{}"),
        (1, base + dt.timedelta(minutes=10), "a", 1.0, "{}"),
        (1, base + dt.timedelta(minutes=70), "a", 1.0, "{}"),   # new session
        (2, base, "a", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        [(i + 1, ts, uid, et, v, p) for i, (uid, ts, et, v, p) in enumerate(
            [(u, t, e, v, p) for u, t, e, v, p in rows]
        )],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sess = sessionize(events, gap_minutes=30).collect()
    by_user = {}
    for r in sess:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2
    assert {r["n_events"] for r in by_user[1]} == {2, 1}
    assert len(by_user[2]) == 1


def test_sessionize_stream_matches_batch_oracle(spark, tmp_path):
    """Stateful streaming flavor (applyInPandasWithState) vs the batch
    oracle, across two micro-batches with a LATE row that merges into an
    already-open session. Emitted = every session the batch flavor closes
    (the last open session per user legitimately stays in state)."""
    import datetime as dt

    from gelly_partitioning_spark.streaming import sessionize_stream

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    batch1 = [
        (1, base, 1, "a", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=10), 1, "a", 1.0, "{}"),
        (3, base, 2, "a", 1.0, "{}"),
    ]
    batch2 = [
        (4, base + dt.timedelta(minutes=5), 1, "a", 1.0, "{}"),    # late: merges
        (5, base + dt.timedelta(minutes=120), 1, "a", 1.0, "{}"),  # closes u1 s1
        (6, base + dt.timedelta(minutes=200), 2, "a", 1.0, "{}"),  # closes u2 s1
    ]
    src = tmp_path / "events"
    ckpt = tmp_path / "ckpt"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(str(src))
    time.sleep(1.1)  # distinct mtimes → deterministic two-batch order
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sess_stream").collect()
    }

    # oracle: batch sessionize over the union; closed = all but the last
    # session per user
    allev = spark.createDataFrame(batch1 + batch2, schema)
    sess = sessionize(allev, gap_minutes=30).collect()
    by_user = {}
    for r in sess:
        by_user.setdefault(r["user_id"], []).append(r)
    want = set()
    for _, rows in by_user.items():
        rows.sort(key=lambda r: r["session_start"])
        for r in rows[:-1]:
            want.add((r["user_id"], r["session_start"], r["session_end"], r["n_events"]))
    assert got == want
    # the late row (t0+5m) must have merged: u1's closed session has 3 events
    assert any(u == 1 and n == 3 for u, _, _, n in got)
