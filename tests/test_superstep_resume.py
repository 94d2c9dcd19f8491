"""Superstep runner: checkpoint manifest, resume-equality, metrics."""

import json
import os

from pyspark.sql import functions as F

from gelly_partitioning_spark import SuperstepRunner, connected_components
from gelly_partitioning_spark.superstep import CHANGED


def _inc_step(state, i):
    return state.select(
        "id",
        (F.col("v") + 1).alias("v"),
        (F.col("v") < 5).alias(CHANGED),  # stop once all v >= 5
    )


def test_runner_converges_and_metrics(spark, tmp_path):
    init = spark.createDataFrame([(i, 0) for i in range(4)], "id long, v long")
    r = SuperstepRunner(spark, checkpoint_dir=str(tmp_path), checkpoint_every=2)
    final = r.run(init, _inc_step, max_iterations=20)
    vals = {row["v"] for row in final.collect()}
    assert vals == {6}  # converged one step after v hits 5
    assert r.converged
    assert [m.superstep for m in r.metrics] == list(range(1, 7))
    assert os.path.exists(os.path.join(str(tmp_path), "manifest.json"))


def test_resume_from_manifest_identical(spark, tmp_path):
    """Kill after superstep k, rerun with same checkpoint dir → identical
    final state and continued superstep numbering (north-rule resume)."""
    init = spark.createDataFrame([(i, 0) for i in range(4)], "id long, v long")

    # run only 3 supersteps (snapshot lands at 2), as if the driver died
    r1 = SuperstepRunner(spark, checkpoint_dir=str(tmp_path), checkpoint_every=2)
    r1.run(init, _inc_step, max_iterations=3)

    # fresh runner, same dir → resumes at superstep 3 (post-snapshot)
    r2 = SuperstepRunner(spark, checkpoint_dir=str(tmp_path), checkpoint_every=2)
    final = r2.run(init, _inc_step, max_iterations=20)
    assert {row["v"] for row in final.collect()} == {6}
    # the resumed run must not have redone supersteps 1-2
    with open(os.path.join(str(tmp_path), "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["superstep"] >= 4
    assert r2.metrics[0].superstep == 1  # history restored from manifest
    assert r2.converged


def test_cc_resume_equals_uninterrupted(spark, cc_graph, tmp_path):
    base = connected_components(cc_graph, split=False, max_iterations=20)
    want = {(r["id"], r["component"]) for r in base.collect()}

    ckpt = str(tmp_path / "cc")
    r1 = SuperstepRunner(spark, checkpoint_dir=ckpt, checkpoint_every=1)
    connected_components(cc_graph, split=False, max_iterations=1, runner=r1)

    r2 = SuperstepRunner(spark, checkpoint_dir=ckpt, checkpoint_every=1)
    resumed = connected_components(cc_graph, split=False, max_iterations=20, runner=r2)
    assert {(r["id"], r["component"]) for r in resumed.collect()} == want


def test_partition_metrics_histogram(spark):
    init = spark.createDataFrame([(i, 0) for i in range(16)], "id long, v long")
    r = SuperstepRunner(spark, collect_partition_metrics=True)
    r.run(init, _inc_step, max_iterations=2)
    assert r.metrics[0].partition_rows is not None
    assert sum(r.metrics[0].partition_rows) == 16
