"""Superstep physical-plan tuning experiment.

Runs 5 fixed PageRank iterations on a mid-size corpus graph under several
config variants and prints sec/superstep for each. Drives the choice of
join strategy / AQE settings for the iterative path.

Usage: python tools/superstep_tune.py [n_files] [variant ...]
Variants: base, aqe_off, no_coalesce, shuffle_hash
(each runs in its own subprocess/JVM).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

VARIANTS = {
    "base": {},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "no_coalesce": {"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    "shuffle_hash": {"spark.sql.join.preferSortMergeJoin": "false"},
    "sh_nc": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    },
}


def run_variant(variant: str, n_files: int) -> dict:
    sys.path.insert(0, str(REPO))
    from gelly_partitioning_spark import get_spark, pagerank
    from gelly_partitioning_spark.sources import extract_edges, synthesize_repo_files
    from gelly_partitioning_spark.superstep import SuperstepRunner

    spark = get_spark(
        app_name=f"tune-{variant}", cores=32, extra_conf=VARIANTS[variant]
    )
    spark.sparkContext.setLogLevel("ERROR")
    rf = synthesize_repo_files(
        spark, n_files=n_files, n_repos=max(200, n_files // 1000),
        n_paths=max(1000, n_files // 100),
    )
    edges = extract_edges(rf).select("src", "dst", "w").cache()
    n_edges = edges.count()
    edges.groupBy("dst").count().count()  # warmup

    runner = SuperstepRunner(spark)
    t0 = time.time()
    pagerank(edges, fixed_iterations=12, split=True, threshold=256,
             alpha=2, level=6, runner=runner).count()
    sec = time.time() - t0
    spark.stop()
    per = [round(m.wall_sec, 2) for m in runner.metrics]
    srt = sorted(per[1:])
    return {
        "variant": variant, "n_edges": n_edges, "total_sec": round(sec, 1),
        "per_superstep": per, "min_sec": srt[0],
        "median_sec": srt[len(srt) // 2],
    }


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        print(json.dumps(run_variant(sys.argv[2], int(sys.argv[3]))))
        return
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    names = sys.argv[2:] or list(VARIANTS)
    for name in names:
        out = subprocess.run(
            [sys.executable, __file__, "--one", name, str(n_files)],
            capture_output=True, text=True,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        print(lines[-1] if lines else f"{name}: FAILED\n{out.stderr[-500:]}")


if __name__ == "__main__":
    main()
