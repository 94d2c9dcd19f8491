"""Plan audit: print formatted physical plans for the headline operators
and grep them for the properties the engine promises:

- parquet scans show PushedFilters / pruned ReadSchema (no full-width reads)
- the skewed-set / merged-values joins are BroadcastHashJoin
- hot paths sit inside WholeStageCodegen spans
- no CartesianProduct outside the explicitly-quadratic ops

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, df, expect_broadcast=False, allow_cartesian=False):
    p = plan_of(df)
    notes = []
    if "CartesianProduct" in p and not allow_cartesian:
        notes.append("!! CartesianProduct")
    if expect_broadcast and "BroadcastHashJoin" not in p:
        notes.append("!! no BroadcastHashJoin")
    n_codegen = p.count("codegen id")
    n_exchange = p.count("Exchange")
    readschema = [l.strip() for l in p.splitlines() if "ReadSchema" in l][:2]
    print(f"== {name}: exchanges={n_exchange} codegen_spans={n_codegen} {' '.join(notes)}")
    for r in readschema:
        print("   ", r[:160])
    return p


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    verbose = "-v" in sys.argv

    import __spark_entry__ as m
    from gelly_partitioning_spark import get_spark, split_graph
    from gelly_partitioning_spark.algorithms.jaccard import jaccard
    from gelly_partitioning_spark.algorithms.triangle_count import triangle_count

    spark = get_spark(app_name="explain-audit", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    edges = m.ps_edges(spark, sf_dir)
    plans = {}
    plans["ps_edges"] = audit("ps_edges (scan+distinct)", edges)
    sg = split_graph(edges, threshold=64, alpha=2, level=6)
    plans["split_edges"] = audit("split_graph.edges", sg.edges, expect_broadcast=True)
    plans["degrees"] = audit(
        "degree_count", __import__("gelly_partitioning_spark").degree_count(edges, threshold=64)
    )
    plans["triangle"] = audit("triangle_count", triangle_count(m.cooc_edges(spark, sf_dir)))
    plans["jaccard"] = audit("jaccard", jaccard(m.cooc_edges(spark, sf_dir)))
    if verbose:
        for k, v in plans.items():
            print(f"\n######## {k}\n{v}")
    spark.stop()


if __name__ == "__main__":
    main()
