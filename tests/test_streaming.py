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
