"""Phase-by-phase timing of the PageRank setup path (guide §1)."""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from gelly_partitioning_spark import get_spark  # noqa: E402
from gelly_partitioning_spark.encoding import encode_split_graph  # noqa: E402
from gelly_partitioning_spark.splitting import split_graph  # noqa: E402
from gelly_partitioning_spark.superstep import checkpoint_static, maybe_promote_static  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="gps-profile-setup", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod  # noqa: E402

edges = entry_mod.ps_edges(spark, sf_dir).cache()
edges.count()

t = time.time()


def mark(name):
    global t
    now = time.time()
    print(f"{name}: {now - t:.2f}s", flush=True)
    t = now


from gelly_partitioning_spark.graph import normalize_edges  # noqa: E402

e_norm = normalize_edges(edges)
sg = split_graph(e_norm, threshold=256, alpha=2, level=6)
mark("split_graph (lazy)")
eg = encode_split_graph(sg)
mark("encode_split_graph (collision check agg)")
sub = eg.vertices.localCheckpoint(eager=True)
mark("sub localCheckpoint")
e = checkpoint_static(eg.edges.select("src", "dst_tag").repartition(F.col("src")))
mark("e repartition+checkpoint")
deg = (
    e.groupBy(F.col("dst_tag").alias("tag"))
    .agg(F.count("*").cast("double").alias("deg"))
    .localCheckpoint(eager=True)
)
mark("deg")
sub_deg = (
    sub.join(deg.withColumnRenamed("tag", "t"), sub["tag"] == F.col("t"))
    .select(F.col("id").alias("src"), "tag", "deg")
    .localCheckpoint(eager=True)
)
mark("sub_deg")
n = deg.count()
mark("n = deg.count()")
e2 = checkpoint_static(
    e.join(sub_deg.hint("shuffle_hash"), "src").select("dst_tag", "tag", "deg")
)
mark("e2 build+checkpoint")
e_rows = int(deg.agg(F.sum("deg")).first()[0] or 0)
mark("e_rows agg")
e2 = maybe_promote_static(e2, e_rows, spark)
mark("promote e2")
print(f"n={n} e_rows={e_rows}")
spark.stop()
