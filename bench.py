"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

plus (stderr) per-query detail including PageRank iterations/min — the
north-rule headline number. Scaling-efficiency evidence (same job at two
parallelism levels) lives in tools/scaling_bench.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from gelly_partitioning_spark import (  # noqa: E402
    connected_components,
    degree_count,
    get_spark,
    pagerank,
    triangle_count,
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
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark(app_name="gps-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    edges = entry_mod.ps_edges(spark, sf_dir).cache()
    n_edges = edges.count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    emb.count()

    timings: dict[str, float] = {}
    detail: dict[str, object] = {"n_edges": n_edges, "cpus": cpus}

    def timed(name, fn, runs: int = 2):
        # best-of-N: the sandbox shows bursty external interference (same
        # query 4s vs 224s across runs); min over two runs reports the
        # engine's cost, not the neighbor's
        best = None
        for _ in range(runs):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # -- PageRank to 1e-6 convergence: the north-rule metric ---------------
    # best-of-2 like every other query (single runs swing 2-3x under the
    # sandbox's bursty external load); the headline is the engine's cost
    best = None
    for _ in range(2):
        runner = SuperstepRunner(spark)
        t0 = time.time()
        # superstep_batch=AUTO (0): the runner measures superstep 1 and
        # picks K = target/wall supersteps per materializing action —
        # identical results (same plan, composed lazily; convergence
        # checked at batch boundaries, ≤K−1 overshoot supersteps past the
        # fixpoint); batching cut the fixed per-action driver cost 2.3x
        # in the r3 A/B, and the chooser replaces the r3 hardcoded K=4
        pr = pagerank(
            edges, tol=1e-6, max_iterations=100, split=True, threshold=256,
            alpha=2, level=6, superstep_batch=0, runner=runner,
        )
        pr_rows = pr.count()
        pr_sec = time.time() - t0
        n_steps = runner.metrics[-1].superstep if runner.metrics else 0
        if best is None or pr_sec < best[0]:
            best = (pr_sec, n_steps, runner.converged, pr_rows)
    pr_sec, iters, conv, pr_rows = best
    timings["pagerank_1e6"] = round(pr_sec, 3)
    detail["pagerank_iterations"] = iters
    detail["pagerank_converged"] = conv
    detail["pagerank_vertices"] = pr_rows
    detail["pagerank_iters_per_min"] = round(iters / (pr_sec / 60.0), 2)

    timed("degree_count", lambda: degree_count(edges, threshold=256).count())
    timed(
        "connected_components",
        lambda: connected_components(edges, threshold=256, max_iterations=60).count(),
    )
    timed("triangle_count", lambda: entry_mod._q_triangle(spark, sf_dir).collect())
    timed("token_count", lambda: token_count(docs).count())
    timed("minhash_lsh", lambda: minhash_lsh_candidates(docs).count())
    # headline = the gated plan (blocked grid cogroup — the scale path the
    # driver certifies; VERDICT r4 #3); the serial-shard numpy flavor stays
    # a secondary detail row (outside the headline total for cross-round
    # comparability)
    timed("cosine_topk", lambda: cosine_topk(emb, k=3, implementation="blocked").count())
    t0 = time.time()
    cosine_topk(emb, k=3, implementation="numpy").count()
    detail["cosine_topk_numpy_sec"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "detail": detail,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
