"""Engine-native input: synthetic corpus determinism, edge extraction,
and the sha256 per-row invariant (BASELINE.json input_hint)."""

from pyspark.sql import functions as F

from gelly_partitioning_spark.sources import extract_edges, synthesize_repo_files


def test_corpus_schema_and_determinism(spark):
    df = synthesize_repo_files(spark, n_files=500, n_repos=40, n_paths=100)
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, synthesize_repo_files(spark, n_files=500, n_repos=40, n_paths=100).collect()))
    assert a == b
    assert df.count() == 500


def test_corpus_is_skewed(spark):
    df = synthesize_repo_files(spark, n_files=2000, n_repos=50, n_paths=200)
    counts = sorted(
        (r["c"] for r in df.groupBy("repo").agg(F.count("*").alias("c")).collect()),
        reverse=True,
    )
    # log-uniform repo assignment ⇒ the top repo holds far more than 1/50
    assert counts[0] > 3 * (2000 / 50)


def test_sha256_row_invariant(spark):
    """sha carried through extraction == recomputation from source rows."""
    df = synthesize_repo_files(spark, n_files=300, n_repos=30, n_paths=60)
    edges = extract_edges(df, dedup=False)
    recomputed = df.select(
        F.concat(F.lit("r:"), F.col("repo")).alias("src"),
        F.concat(F.lit("p:"), F.col("path")).alias("dst"),
        F.col("commit"),
        F.sha2(F.col("content"), 256).alias("sha_again"),
    )
    joined = edges.join(recomputed, ["src", "dst", "commit"])
    assert joined.count() >= 300
    assert joined.filter(F.col("content_sha") != F.col("sha_again")).count() == 0


def test_extract_edges_dedup_weights(spark):
    df = synthesize_repo_files(spark, n_files=400, n_repos=10, n_paths=20)
    e = extract_edges(df, dedup=True)
    assert e.columns == ["src", "dst", "w", "n_rows"]
    # weights sum to the file count
    assert e.agg(F.sum("w")).collect()[0][0] == 400
    assert e.filter(F.col("w") < 1).count() == 0


def test_extracted_graph_runs_pagerank(spark):
    from gelly_partitioning_spark import pagerank

    df = synthesize_repo_files(spark, n_files=400, n_repos=20, n_paths=50)
    e = extract_edges(df).select("src", "dst", "w")
    pr = pagerank(e, fixed_iterations=5, threshold=16)
    total = pr.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6
