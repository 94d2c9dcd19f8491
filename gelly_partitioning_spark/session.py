"""SparkSession factory for the engine.

Defaults are tuned for the sandbox (single-JVM ``local[N]``) but every
knob is the one you would set on a real multi-executor cluster:

- AQE on (skew-join splitting + partition coalescing are the runtime
  complement to our *explicit* split-merge skew handling, which covers
  the single-key groupBy/join skew AQE cannot fix).
- Arrow enabled for the vectorized pandas-UDF surface (no per-row
  Python UDFs anywhere in the engine).
- ``spark.sql.shuffle.partitions`` sized from the core count; on a
  1000-executor cluster you would set this to ~2-3x total cores and the
  engine's own ``repartition`` calls scale with it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gelly-partitioning-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``cores`` defaults to $SPARK_GRAFT_CPUS, then ``*``.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(8, 2 * int(cores))
        except (TypeError, ValueError):
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
