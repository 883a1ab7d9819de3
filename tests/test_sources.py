"""Source/sink coverage (SURVEY §2.1): edge-list text scan, CSV append
sink (the reference's only sink, BFS_map_reduce.py:155-164), JSON and
parquet round-trips."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bfs_mapreduce_spark.sources.readers import (
    load_table,
    read_edge_list,
    write_csv_append,
)


def test_edge_list_tolerates_messy_whitespace(spark, tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("0 1\n  1\t2 \n\n2   3\n")
    rows = sorted(
        (r["src"], r["dst"]) for r in read_edge_list(spark, str(p)).collect()
    )
    assert rows == [(0, 1), (1, 2), (2, 3)]


def test_csv_append_sink_accumulates(spark, tmp_path):
    out = str(tmp_path / "results")
    df1 = spark.createDataFrame([("tinyG", 4, 0.12)], "Dataset string, n_Workers int, Tempo double")
    df2 = spark.createDataFrame([("smallG", 8, 0.98)], "Dataset string, n_Workers int, Tempo double")
    write_csv_append(df1, out)
    write_csv_append(df2, out)
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 2
    assert set(back.columns) == {"Dataset", "n_Workers", "Tempo"}


def test_json_round_trip(spark, tmp_path):
    out = str(tmp_path / "events_json")
    ev = load_table(spark, os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001"), "events")
    ev.limit(100).write.mode("overwrite").json(out)
    back = spark.read.json(out)
    assert back.count() == 100
    assert "event_id" in back.columns and "props" in back.columns


def test_parquet_round_trip_preserves_schema(spark, tmp_path, sf_smoke_dir):
    out = str(tmp_path / "docs_parquet")
    docs = load_table(spark, sf_smoke_dir, "documents")
    docs.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.schema == docs.schema
    assert back.count() == docs.count()


def test_events_ts_normalized_to_ntz(spark, sf_smoke_dir):
    ev = load_table(spark, sf_smoke_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    # sanity: values are 2024 wall-clock
    years = ev.select(F.year("ts").alias("y")).distinct().collect()
    assert {r["y"] for r in years} == {2024}


def test_compaction_reduces_file_count(spark, sf_oracle_dir):
    """q_sink_compaction's operational claim: the compacted directory
    holds far fewer parquet files than the fragmented one, with row
    parity guaranteed by the oracle row."""
    import glob
    import os
    import tempfile

    from bfs_mapreduce_spark.operators.sink_queries import _PROC
    from bfs_mapreduce_spark.registry import all_queries

    all_queries()["q_sink_compaction"].build(spark, sf_oracle_dir).collect()
    root = os.path.join(
        tempfile.gettempdir(),
        "bfs_mapreduce_spark_compact",
        _PROC,
        os.path.basename(sf_oracle_dir.rstrip("/")),
    )
    n_frag = len(glob.glob(os.path.join(root, "frag", "*.parquet")))
    n_compact = len(glob.glob(os.path.join(root, "compact", "*.parquet")))
    assert n_frag == 64
    assert n_compact == 2


def test_edgelist_datasource_grammar(spark, tmp_path):
    """Custom Python DataSource: blank lines and # comments skip;
    malformed lines raise (never silently drop edges); one input
    partition per file so parallelism follows the file layout."""
    from pyspark.errors.exceptions.captured import PythonException

    from bfs_mapreduce_spark.sources.edgelist_source import register_edgelist_source

    register_edgelist_source(spark)
    register_edgelist_source(spark)  # idempotent
    d = tmp_path / "edges"
    d.mkdir()
    (d / "a.txt").write_text("# comment\n0 1\n\n1 2\n")
    (d / "b.txt").write_text("2 3\n")
    df = spark.read.format("edgelist").load(str(d))
    assert df.rdd.getNumPartitions() == 2
    assert sorted((r.src, r.dst) for r in df.collect()) == [(0, 1), (1, 2), (2, 3)]

    bad = tmp_path / "bad.txt"
    bad.write_text("0 1 2\n")
    import pytest as _pytest

    with _pytest.raises(PythonException, match="expected 2 fields"):
        spark.read.format("edgelist").load(str(bad)).collect()
