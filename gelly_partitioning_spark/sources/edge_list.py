"""Edge-list scan/sink — reference parity for S1/S4 (SURVEY.md §2.1).

Tab-delimited two-column edge list, '#' comment lines skipped, ids read as
strings (AlphaNodeSplitting.java:256-273). The sink mirrors
``writeAsCsv(path, "\\n", ",")`` (e.g. AlphaNodeSplitting.java:64-68).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_edge_list(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    df = spark.read.csv(
        path, sep=sep, comment="#", schema="src string, dst string"
    )
    return df.withColumn("w", F.lit(1.0))


def write_edge_list(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).csv(path)
