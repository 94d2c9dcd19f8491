"""CLI surface: edge-list scan → split pagerank/degree → CSV/parquet sink,
resume via --checkpoint-dir. Runs in-process against the shared session
(spark-submit would provide the session in production)."""

import json
import os

from gelly_partitioning_spark.cli import main

from .conftest import HUB_DEGREES, HUB_EDGES


def _write_edge_list(path):
    with open(path, "w") as f:
        f.write("# golden hub graph\n")
        for a, b in HUB_EDGES:
            f.write(f"{a}\t{b}\n")


def test_cli_degree_count_csv(spark, tmp_path, capsys):
    elist = tmp_path / "edges.tsv"
    _write_edge_list(elist)
    out = tmp_path / "out"
    rc = main([
        "degree_count", "--edges", str(elist), "--output", str(out),
        "--format", "csv", "--threshold", "2", "--alpha", "2", "--level", "4",
    ])
    assert rc == 0
    rows = {}
    for fn in os.listdir(out):
        if fn.endswith(".csv"):
            with open(out / fn) as f:
                header = f.readline().strip().split(",")
                for line in f:
                    vals = dict(zip(header, line.strip().split(",")))
                    rows[vals["id"]] = int(vals["degree"])
    assert rows == HUB_DEGREES
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["algorithm"] == "degree_count"


def test_cli_pagerank_with_metrics(spark, tmp_path):
    elist = tmp_path / "edges.tsv"
    _write_edge_list(elist)
    out = tmp_path / "pr"
    metrics = tmp_path / "m.json"
    rc = main([
        "pagerank", "--edges", str(elist), "--output", str(out),
        "--threshold", "2", "--max-iterations", "8", "--tol", "1e-12",
        "--metrics-out", str(metrics),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    got = spark.read.parquet(str(out))
    assert got.count() == 21
    m = json.loads(metrics.read_text())
    assert len(m) == 8
    assert all("partition_rows" in mm and mm["partition_rows"] for mm in m)
    # snapshot manifest exists for resume
    assert (tmp_path / "ckpt" / "manifest.json").exists()
