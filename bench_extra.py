"""Supplementary benchmark: window-probed, per-query isolated readings.

`bench.py` is the frozen artifact of record; this file adds what it
cannot (VERDICT r5 #2/#3, guide §1.4/§1.5 — measured, not graded):

- a busy-loop machine probe before and after the run (the window-class
  stamp: readings within ~20% of a quiet-machine probe are comparable
  across sessions, larger deviations mean external contention),
- per-query isolation with labelled jobs and explicit best-of-N,
- the same queries/configs as bench.py, so the numbers line up.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python bench_extra.py
Prints ONE JSON line (schema: probe_before_sec, probe_after_sec,
queries{name: best_sec}, runs).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from scaling_bench import probe_machine  # noqa: E402

from gelly_partitioning_spark import (  # noqa: E402
    connected_components,
    degree_count,
    get_spark,
    pagerank,
)
from gelly_partitioning_spark.functions import (  # noqa: E402
    cosine_topk,
    minhash_lsh_candidates,
    token_count,
)
from gelly_partitioning_spark.superstep import SuperstepRunner  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    probe_before = round(probe_machine(), 3)
    spark = get_spark(app_name="gps-bench-extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    edges = entry_mod.ps_edges(spark, sf_dir).cache()
    edges.count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    emb.count()

    runs = int(os.environ.get("GPS_BENCH_EXTRA_RUNS", "2"))
    timings: dict[str, float] = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best = None
        for _ in range(runs):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)

    def pr():
        runner = SuperstepRunner(spark)
        pagerank(
            edges, tol=1e-6, max_iterations=100, split=True, threshold=256,
            alpha=2, level=6, superstep_batch=0, runner=runner,
        ).write.format("noop").mode("overwrite").save()

    timed("pagerank_1e6", pr)
    timed(
        "degree_count",
        lambda: degree_count(edges, threshold=256)
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "connected_components",
        lambda: connected_components(edges, threshold=256, max_iterations=60)
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "triangle_count",
        lambda: entry_mod._q_triangle(spark, sf_dir)
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "token_count",
        lambda: token_count(docs).write.format("noop").mode("overwrite").save(),
    )
    timed(
        "minhash_lsh",
        lambda: minhash_lsh_candidates(docs)
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "cosine_topk",
        lambda: cosine_topk(emb, k=3, implementation="blocked")
        .write.format("noop").mode("overwrite").save(),
    )
    spark.stop()
    probe_after = round(probe_machine(), 3)
    print(
        json.dumps(
            {
                "metric": "bench_extra_isolated_best_sec",
                "probe_before_sec": probe_before,
                "probe_after_sec": probe_after,
                "queries": timings,
                "total": round(sum(timings.values()), 3),
                "runs": runs,
                "sf_dir": sf_dir,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
