"""Degree-count warm-up trajectory probe (r6 follow-up).

BENCH_r05's degree_count min was 1.10 s; end-of-round readings sit at
1.7-1.9 s. Hypothesis: in r5 the query ran after 40+ s of JVM-heavy
PageRank supersteps (deep JIT warm-up of the shuffle/agg codegen), while
the optimized PageRank finishes in ~3 s of mostly-Python work, so the
bench's best-of-2 degree samples are both semi-cold. This script mimics
the bench session shape (pagerank first) then runs degree_count N times
and prints the full trajectory — if run 3+ converges to ~1.0 s the gap
is warm-up, not a regression.

Usage: python tools/profile_degree_r06.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from gelly_partitioning_spark import degree_count, get_spark, pagerank  # noqa: E402
from gelly_partitioning_spark.superstep import SuperstepRunner  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="gps-profile-degree", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    edges = entry_mod.ps_edges(spark, sf_dir).cache()
    edges.count()

    runner = SuperstepRunner(spark)
    t0 = time.time()
    pagerank(
        edges, tol=1e-6, max_iterations=100, split=True, threshold=256,
        alpha=2, level=6, superstep_batch=0, runner=runner,
    ).count()
    print(f"pagerank_1e6: {time.time() - t0:.3f}s", flush=True)

    samples = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"degree_count rep {i}")
        t0 = time.time()
        degree_count(edges, threshold=256).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        samples.append(round(dt, 3))
        print(f"degree_count rep {i}: {dt:.3f}s", flush=True)
    print("trajectory:", samples)
    spark.stop()


if __name__ == "__main__":
    main()
