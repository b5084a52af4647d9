from __future__ import annotations

from nido_spark.cli import main

SF = "/root/testdata/sf0.001"


def test_cli_end_to_end_lineitem(spark, tmp_path, capsys):
    out = str(tmp_path / "labels")
    rc = main(["-f", SF, "-b", "4", "-c", "-o", out, "--json"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "graph: nv=210" in printed
    assert "louvain: Q=" in printed
    labels = spark.read.parquet(out)
    assert labels.count() == 210
    assert set(labels.columns) == {"v", "comm"}


def test_cli_random_graph(tmp_path):
    rc = main(["--random", "300 4", "-b", "2", "-i", "50"])
    assert rc == 0


def test_cli_rejects_unknown_schema(spark, tmp_path):
    bad = str(tmp_path / "bad.parquet")
    spark.createDataFrame([(1, "x")], "a long, b string").write.parquet(bad)
    import pytest

    with pytest.raises(SystemExit):
        main(["-f", bad])
