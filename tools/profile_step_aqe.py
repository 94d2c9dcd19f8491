"""A/B the per-superstep cost with AQE on/off (guide §1, §2.2).

Reimplements the broadcast-mode PageRank superstep inline against the
same e2 layout and times 10 chained supersteps (k=5 batches) each way.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from gelly_partitioning_spark import get_spark  # noqa: E402
from gelly_partitioning_spark.graph import normalize_edges, undirected  # noqa: E402
from gelly_partitioning_spark.superstep import CHANGED  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="gps-step-aqe", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod  # noqa: E402

edges = entry_mod.ps_edges(spark, sf_dir).cache()
edges.count()

und = undirected(normalize_edges(edges))
deg_str = (
    und.groupBy(F.col("src").alias("tag"))
    .agg(F.count("*").cast("double").alias("deg"))
    .localCheckpoint(eager=True)
)
n = deg_str.count()
deg = deg_str.select(F.xxhash64("tag").alias("tag"), "deg")
sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
e2 = (
    und.select(F.xxhash64("dst").alias("dst_tag"), F.xxhash64("src").alias("tag"))
    .join(F.broadcast(deg), "tag")
    .select("dst_tag", "tag", "deg")
    .unionByName(
        deg.select(F.col("tag").alias("dst_tag"), "tag", F.lit(None).cast("double").alias("deg"))
    )
    .coalesce(sp)
    .localCheckpoint(eager=True)
)
base = 0.15 / n
damping = 0.85


def step(state):
    g = (
        e2.join(F.broadcast(state), "tag")
        .groupBy(F.col("dst_tag").alias("tag"))
        .agg(
            F.sum(F.col("rank") / F.col("deg")).alias("mass"),
            F.max(F.when(F.col("deg").isNull(), F.col("rank"))).alias("old"),
        )
    )
    new_rank = F.lit(base) + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
    return g.select(
        "tag",
        new_rank.alias("rank"),
        (F.abs(new_rank - F.col("old")) > 1e-12).alias(CHANGED),
    )


def run_batches(label, n_batches=4, k=5):
    state = deg.select("tag", F.lit(1.0 / n).alias("rank")).localCheckpoint(eager=True)
    walls = []
    for b in range(n_batches):
        t0 = time.time()
        new_state = step(state)
        for _ in range(1, k):
            new_state = step(new_state.drop(CHANGED))
        new_state = new_state.localCheckpoint(eager=False)
        agg = new_state.agg(
            F.count("*").alias("rows"), F.sum(F.col(CHANGED).cast("long")).alias("ch")
        ).collect()[0]
        state = new_state.drop(CHANGED)
        walls.append(time.time() - t0)
    per = sum(walls[1:]) / ((n_batches - 1) * k)
    print(f"{label}: walls={[round(w,2) for w in walls]} per_superstep={per:.3f}s rows={agg['rows']}")


run_batches("warmup")
run_batches("AQE on  ")
spark.conf.set("spark.sql.adaptive.enabled", "false")
run_batches("AQE off ")
run_batches("AQE off2")
spark.conf.set("spark.sql.adaptive.enabled", "true")
run_batches("AQE on2 ")
spark.stop()
