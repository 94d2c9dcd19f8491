"""Engine-native input: the repo-files table and edge extraction.

BASELINE.json input_hint: the engine's production input is an Iceberg-style
table ``repo_files(repo, path, commit, lang, content)`` at 10^12-file scale;
the link graph is *derived* from it as repo–path co-occurrence edges, with
the per-row invariant ``sha256(content)`` preserved through extraction
(``F.sha2`` — JVM-side, codegen'd; no Python touches content bytes).

The reference has no counterpart (it reads edge lists directly,
AlphaNodeSplitting.java:256-273); this module is the scale-path front door.
At 10^12 files the only columns ever read from the scan are
(repo, path, content-for-sha) — column pruning reaches the parquet/Iceberg
reader because everything is declarative ``select``.

``synthesize_repo_files`` builds a deterministic power-law corpus with
``spark.range`` + seeded xxhash64 arithmetic — no driver-side data, no RNG
state, same rows at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ["py", "java", "c", "go", "rs", "js", "rb", "scala"]


def _u(col, salt: int):
    """Deterministic uniform [0,1) from a column (seeded xxhash64)."""
    return (F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1_000_000)) / 1_000_000.0)


def synthesize_repo_files(
    spark: SparkSession,
    n_files: int = 10_000,
    n_repos: int = 500,
    n_paths: int = 2_000,
    seed: int = 42,
) -> DataFrame:
    """Deterministic synthetic repo_files table.

    Repo assignment is log-uniform (Zipf-like: repo 0 is a hub holding
    ~1/ln(n_repos) of all files), so the derived graph is heavily skewed —
    exactly the regime node splitting exists for. Fully distributed: one
    ``spark.range`` scan, all columns derived arithmetically.
    """
    fid = F.col("id")
    repo_idx = F.floor(
        F.pow(F.lit(float(n_repos)), _u(fid, seed + 1))
    ).cast("long") % n_repos
    path_idx = F.floor(
        F.pow(F.lit(float(n_paths)), _u(fid, seed + 2))
    ).cast("long") % n_paths
    lang = F.element_at(
        F.array(*[F.lit(l) for l in LANGS]),
        (F.pmod(F.xxhash64(fid, F.lit(seed + 3)), F.lit(len(LANGS))) + 1).cast("int"),
    )
    return spark.range(n_files).select(
        F.concat(F.lit("repo-"), repo_idx.cast("string")).alias("repo"),
        F.concat(
            F.lit("src/"), lang, F.lit("/mod_"), path_idx.cast("string"),
            F.lit("."), lang,
        ).alias("path"),
        F.substring(F.sha2(F.concat(F.lit("commit:"), fid.cast("string"), F.lit(f":{seed}")), 256), 1, 12).alias("commit"),
        lang.alias("lang"),
        F.concat(
            F.lit("// file "), fid.cast("string"),
            F.lit(" of repo "), repo_idx.cast("string"),
            F.lit("\nint main_"), fid.cast("string"),
            F.lit("() { return "), (fid % 97).cast("string"), F.lit("; }\n"),
        ).alias("content"),
    )


def extract_edges(repo_files: DataFrame, dedup: bool = True) -> DataFrame:
    """repo–path co-occurrence edges with the sha256 row invariant.

    Output (dedup=False): (src, dst, w, commit, content_sha) — ``commit``
    is the per-row identity the sha invariant check aligns on.
    Output (dedup=True): (src='r:'+repo, dst='p:'+path, w, n_rows)
    — two repos sharing a path are linked through the path vertex
    (bipartite projection is the algorithms' job, not the extractor's).
    ``content_sha`` = sha2(content, 256) computed IN the extraction select,
    so downstream checks can verify per-row equality against a
    recomputation from the source table (north-rule invariant).
    """
    e = repo_files.select(
        F.concat(F.lit("r:"), F.col("repo")).alias("src"),
        F.concat(F.lit("p:"), F.col("path")).alias("dst"),
        F.lit(1.0).alias("w"),
        F.col("commit"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )
    if dedup:
        # one edge per (repo, path); invariant column aggregates to the
        # set-size-preserving count so the per-row check stays possible
        # upstream of dedup via `extract_edges(df, dedup=False)`
        e = e.groupBy("src", "dst").agg(
            F.sum("w").alias("w"), F.count("content_sha").alias("n_rows")
        )
    return e
