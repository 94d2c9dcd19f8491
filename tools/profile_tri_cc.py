"""Phase timing for triangle_count (incl. cooc_edges) and CC (guide §1)."""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from gelly_partitioning_spark import connected_components, get_spark  # noqa: E402
from gelly_partitioning_spark.algorithms.triangle_count import oriented_edges  # noqa: E402
from gelly_partitioning_spark.graph import canonical_edges, normalize_edges  # noqa: E402
from gelly_partitioning_spark.superstep import SuperstepRunner  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="gps-profile-tri", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod  # noqa: E402

t = time.time()


def mark(name):
    global t
    now = time.time()
    print(f"{name}: {now - t:.2f}s", flush=True)
    t = now


# -- triangle ---------------------------------------------------------------
cooc = entry_mod.cooc_edges(spark, sf_dir)
n_cooc = cooc.count()
mark(f"cooc_edges count ({n_cooc})")
cooc2 = entry_mod.cooc_edges(spark, sf_dir)
e_norm = normalize_edges(cooc2)
canon = canonical_edges(e_norm).localCheckpoint(eager=True)
mark("canon checkpoint")
o = oriented_edges(e_norm).localCheckpoint(eager=True)
mark("oriented checkpoint")
w = (
    o.alias("x")
    .join(o.alias("y"), F.col("x.lo") == F.col("y.lo"))
    .filter(F.col("x.hi") < F.col("y.hi"))
    .select(F.col("x.hi").alias("src"), F.col("y.hi").alias("dst"))
)
tri = w.join(canon, ["src", "dst"], "inner")
print("triangles:", tri.agg(F.count("*")).first()[0])
mark("wedge+close")

# -- cc ---------------------------------------------------------------------
edges = entry_mod.ps_edges(spark, sf_dir).cache()
edges.count()
mark("ps_edges cache")
runner = SuperstepRunner(spark)
cc = connected_components(edges, threshold=256, max_iterations=60, runner=runner)
cc.count()
mark("cc total")
print("cc batches:", [(m.superstep, round(m.wall_sec, 2)) for m in runner.metrics])
spark.stop()
