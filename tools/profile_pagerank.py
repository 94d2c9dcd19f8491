"""One-off profiling of the bench PageRank path (guide §1: measure first).

Times the setup phase (split/encode/checkpoint) separately from the
superstep loop, and dumps the runner's per-batch metrics (wall, K) so we
can see whether driver/planning overhead or compute dominates.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from gelly_partitioning_spark import get_spark, pagerank  # noqa: E402
from gelly_partitioning_spark.superstep import SuperstepRunner  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="gps-profile-pr", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod  # noqa: E402

edges = entry_mod.ps_edges(spark, sf_dir).cache()
edges.count()

for attempt in range(2):
    runner = SuperstepRunner(spark)
    t0 = time.time()
    pr = pagerank(
        edges, tol=1e-6, max_iterations=100, split=True, threshold=256,
        alpha=2, level=6, superstep_batch=0, runner=runner,
    )
    pr.count()
    total = time.time() - t0
    batches = [
        {"end": m.superstep, "wall": round(m.wall_sec, 3)} for m in runner.metrics
    ]
    loop = sum(m.wall_sec for m in runner.metrics)
    print(json.dumps({
        "attempt": attempt,
        "total_sec": round(total, 2),
        "loop_sec": round(loop, 2),
        "setup_and_decode_sec": round(total - loop, 2),
        "supersteps": runner.metrics[-1].superstep,
        "n_batches": len(batches),
        "batches": batches,
    }))
spark.stop()
