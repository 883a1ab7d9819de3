"""CLI surface (reference parity, SURVEY §2.8): bfs subcommand output
and the results CSV append sink; catalog query runner."""

from __future__ import annotations

import pytest


@pytest.fixture(autouse=True)
def _reuse_session(spark):
    # cli.get_session -> getOrCreate reuses the test session, so these
    # run in-process without spawning a second JVM
    yield


def test_cli_bfs_tiny(capsys, tmp_path):
    from bfs_mapreduce_spark.cli import main

    results = str(tmp_path / "results_csv")
    rc = main(
        [
            "bfs",
            "-p",
            "/root/reference/datasets/tinyG.txt",
            "-w",
            "4",
            "--limit",
            "13",
            "--results",
            results,
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = {int(line.split("\t")[0]): line.split("\t") for line in out}
    assert rows[0][1] == "0" and rows[0][2] == "0"
    assert rows[3][1] == "2" and rows[3][2] == "0->5->3"  # verified reference golden
    # results sink wrote the reference's Dataset,n_Workers,Tempo row
    import glob

    files = glob.glob(results + "/*.csv")
    assert files
    content = "".join(open(f).read() for f in files)
    assert "tinyG.txt" in content


def test_cli_query_runner(capsys):
    from bfs_mapreduce_spark.cli import main

    rc = main(["query", "q_filter_project", "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"])
    assert rc == 0


def test_cli_unknown_query(capsys):
    from bfs_mapreduce_spark.cli import main

    rc = main(["query", "no_such_query"])
    assert rc == 2
    assert "available" in capsys.readouterr().err


def test_cli_explain(capsys):
    from bfs_mapreduce_spark.cli import main

    assert main(["explain", "q_filter_project"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "PushedFilters" in out


def test_cli_explain_unknown(capsys):
    from bfs_mapreduce_spark.cli import main

    assert main(["explain", "nope"]) == 2
