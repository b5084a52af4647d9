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


def test_cli_algo_dispatch(tmp_path, capsys):
    """--algo runs companion algorithms end-to-end: pagerank writes a
    (v, r) parquet; sssp honors --source and its loud missing-source
    contract; louvain-refined reports the connected split."""
    import pytest

    from nido_spark.cli import main

    out = str(tmp_path / "pr")
    assert main(["--random", "300 3", "-a", "pagerank", "-o", out,
                 "--cores", "4", "-i", "10"]) == 0
    from nido_spark.session import get_spark

    spark = get_spark("cli_check", cores=4)
    pr = spark.read.parquet(out)
    assert set(pr.columns) == {"v", "r"} and pr.count() == 300
    assert abs(pr.agg({"r": "sum"}).first()[0] - 1.0) < 1e-6

    out2 = str(tmp_path / "dist")
    assert main(["--random", "300 3", "-a", "sssp", "--source", "0",
                 "-o", out2, "--cores", "4"]) == 0
    d = spark.read.parquet(out2)
    assert set(d.columns) == {"v", "dist"} and d.count() == 300

    with pytest.raises(SystemExit, match="--source"):
        main(["--random", "60 3", "-a", "sssp", "--cores", "4"])

    assert main(["--random", "200 3", "-a", "louvain-refined",
                 "--cores", "4", "-b", "4"]) == 0
    assert "refine:" in capsys.readouterr().out


def test_cli_ecg_and_gamma(tmp_path, capsys):
    """--algo ecg writes a (v, comm) labels parquet covering every vertex;
    --gamma reaches the louvain dispatch (finer partition at gamma=3 than
    the classic run on the same seeded graph)."""
    from nido_spark.cli import main
    from nido_spark.session import get_spark

    out = str(tmp_path / "ecg_labels")
    assert main(["--random", "60 3", "-a", "ecg", "-o", out,
                 "--cores", "4"]) == 0
    spark = get_spark("cli_check2", cores=4)
    lab = spark.read.parquet(out)
    assert set(lab.columns) == {"v", "comm"} and lab.count() == 60

    out1 = str(tmp_path / "lv1")
    out3 = str(tmp_path / "lv3")
    assert main(["--random", "60 3", "-a", "louvain", "-o", out1,
                 "--cores", "4"]) == 0
    assert main(["--random", "60 3", "-a", "louvain", "--gamma", "3.0",
                 "-o", out3, "--cores", "4"]) == 0
    n1 = spark.read.parquet(out1).select("comm").distinct().count()
    n3 = spark.read.parquet(out3).select("comm").distinct().count()
    assert n3 > n1
