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


def test_cli_bfs_display_respects_limit(capsys):
    """The display path must pull at most --limit rows through the
    driver (a .limit() BEFORE .collect()), while the vertex total in
    the footer still reports the whole graph — the round-9 advice's
    driver-funnel fix."""
    from bfs_mapreduce_spark.cli import main

    rc = main(
        ["bfs", "-p", "/root/reference/datasets/tinyG.txt", "--limit", "3"]
    )
    assert rc == 0
    cap = capsys.readouterr()
    out = cap.out.strip().splitlines()
    assert len(out) == 3  # 13-vertex graph, only 3 rows printed
    assert "# 13 vertices" in cap.err


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


def test_cli_bench_graph_custom_shape(capsys, tmp_path):
    """bench-graph emits one JSON line per graph with per-round
    frontier instrumentation (the BASELINE.md scale-table repro)."""
    import json

    from bfs_mapreduce_spark.cli import main

    rc = main(["bench-graph", "--graph", "t:500:2000", "--out-dir", str(tmp_path)])
    assert rc == 0
    recs = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert len(recs) == 1 and recs[0]["graph"] == "t"
    assert recs[0]["reached"] == 500  # backbone keeps it connected
    assert recs[0]["round_detail"][0]["frontier"] >= 1


def test_cli_bench_dedup_linearity(capsys, tmp_path):
    """bench-dedup emits per-phase rows/sec per corpus factor; the
    planted hot cluster's star candidates must stay CONSTANT across
    factors and non-star candidates must scale ~linearly (the
    no-super-linear-phase claim recorded in BASELINE.md)."""
    import json

    from bfs_mapreduce_spark.cli import main

    rc = main(
        [
            "bench-dedup",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--factor",
            "1",
            "--factor",
            "2",
            "--out-dir",
            str(tmp_path),
        ]
    )
    assert rc == 0
    recs = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert [r["factor"] for r in recs] == [1, 2]
    by = {
        r["factor"]: {p["phase"]: p["rows"] for p in r["lsh_phases"] + r["semantic_phases"]}
        for r in recs
    }
    stars = {r["factor"]: r["lsh_star_candidates"] for r in recs}
    assert stars[1] == stars[2]  # hot cluster constant => star links constant
    nonstar = {f: by[f]["lsh_candidates"] - stars[f] for f in (1, 2)}
    assert nonstar[2] <= 2 * nonstar[1] + 16  # ~linear candidate growth
    assert by[2]["lsh_band_table"] < 2 * by[1]["lsh_band_table"]  # 2x docs + const hot
    sem = {f: by[f]["semantic_candidate_pairs"] for f in (1, 2)}
    # cost linearity: cell count scales with the corpus, cell sizes
    # stay ~constant, so in-cell pair volume must scale ~linearly
    assert sem[2] <= 2.5 * sem[1]
    # exact-substring path (round 10): gram rows — the candidate
    # volume of the heaviest shuffle-per-byte operator — must scale
    # ~linearly in corpus chars, never super-linearly
    sub = {
        r["factor"]: {p["phase"]: p["rows"] for p in r["substring_phases"]}
        for r in recs
    }
    g1, g2 = (sub[f]["substring_gram_fingerprints"] for f in (1, 2))
    assert g1 > 0 and g2 <= 2 * g1 + 16
    assert sub[2]["substring_doc_hits"] <= 2 * sub[1]["substring_doc_hits"] + 16


def test_bench_snapshot_profile(spark, sf_smoke_dir, capsys):
    """bench-snapshot emits the mask-vs-rewrite DELETE profile plus
    the round-11 upsert contrast (MoR upsert_eq vs CoW merge_into),
    with consistent row accounting throughout (upserts change values,
    never the live row count)."""
    import json

    from bfs_mapreduce_spark.benchmarks import run_snapshot_scale

    recs = list(run_snapshot_scale(spark, sf_dir=sf_smoke_dir, n_files=2, reps=1))
    steps = [r["step"] for r in recs]
    assert steps == [
        "clean_read", "delete_write", "mor_read", "compact",
        "post_compact_read", "upsert_eq_write", "post_upsert_read",
        "merge_cow_write", "post_merge_read",
    ]
    by = {r["step"]: r for r in recs}
    assert by["mor_read"]["rows"] == (
        by["clean_read"]["rows"] - by["delete_write"]["rows_masked"]
    )
    live = by["mor_read"]["rows"]
    for step in ("post_compact_read", "post_upsert_read", "post_merge_read"):
        assert by[step]["rows"] == live
    assert by["upsert_eq_write"]["rows_upserted"] > 0
    assert by["merge_cow_write"]["rows_upserted"] > 0
    assert all(r["sec"] >= 0 for r in recs)
    json.dumps(recs)  # each record is JSON-serializable


def test_cli_snapshot_vacuum_retention(spark, tmp_path, capsys):
    """Round-12 (verdict ask #7): the snapshot-vacuum CLI verb applies
    an age/count retention policy. --retain-last keeps the N newest
    versions; expired versions refuse time travel afterwards while
    retained versions (and CDC ranges inside retention) stay exact;
    policies union with --retain-hours (a generous age keeps all)."""
    import json
    import os

    import pytest

    from bfs_mapreduce_spark.cli import main
    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    v = 0
    for i in range(4):
        # replace each time so old versions have exclusive files
        files = ts.stage_files(spark.range(i * 10, i * 10 + 10).toDF("k"), root)
        v = ts.commit(root, files, base_version=v, replace=i > 0)

    # a generous age policy keeps everything (union with count absent)
    rc = main(["snapshot-vacuum", root, "--retain-hours", "24"])
    assert rc == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["n_deleted"] == 0
    assert ts.read(spark, root, 1).count() == 10  # full history intact

    # keep only the last 2 versions: without --force the round-15
    # min-retention reader guard refuses (just-superseded versions)
    with pytest.raises(ValueError, match="superseded only"):
        main(["snapshot-vacuum", root, "--retain-last", "2"])
    capsys.readouterr()
    rc = main(["snapshot-vacuum", root, "--retain-last", "2", "--force"])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["retain_from"] == 3 and out2["n_deleted"] > 0
    # retained versions exact; expired ones refuse time travel
    assert sorted(r.k for r in ts.read(spark, root, 4).collect()) == list(
        range(30, 40)
    )
    assert sorted(r.k for r in ts.read(spark, root, 3).collect()) == list(
        range(20, 30)
    )
    with pytest.raises(Exception):
        ts.read(spark, root, 1).count()

    # CDC range inside retention stays exact after vacuum
    ts.commit(
        root,
        ts.stage_files(spark.range(100, 105).toDF("k"), root),
        base_version=4,
    )
    changed = ts.read_changes(spark, root, 4, 5)
    assert sorted(r.k for r in changed.collect()) == list(range(100, 105))


def test_retention_keep_last_zero_cannot_destroy_table(spark, tmp_path, capsys):
    """Round-13 ADVICE regression: keep_last=0 (or negative) used to
    compute retain_from=latest+1, an EMPTY keep-set — vacuum would
    then delete every data file and manifest segment including the
    current version's. The cutoff must clamp to the current version:
    the most aggressive count policy degrades to "keep only the
    latest", never "keep nothing"."""
    import json
    import os

    from bfs_mapreduce_spark.cli import main
    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    v = ts.commit(
        root, ts.stage_files(spark.range(10).toDF("k"), root), base_version=0
    )
    v = ts.commit(
        root,
        ts.stage_files(spark.range(10, 20).toDF("k"), root),
        base_version=v,
    )
    assert ts.retention_cutoff(root, keep_last=0) == v
    assert ts.retention_cutoff(root, keep_last=-3) == v
    rc = main(["snapshot-vacuum", root, "--retain-last", "0", "--force"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["retain_from"] == v
    # the docstring's contract holds: the current version still reads
    assert sorted(r.k for r in ts.read(spark, root).collect()) == list(
        range(20)
    )


def test_cli_bench_cdc_admission(capsys, tmp_path):
    """bench-cdc (round 14): rate-limited CDC over a factor-staged
    multi-file commit history — per-batch admitted bytes never exceed
    cap + one file's overshoot, every staged row is delivered exactly
    once, and the stateful count's state rows stay |sources|-bounded
    (never corpus- or batch-scaled)."""
    import json

    from bfs_mapreduce_spark.cli import main

    rc = main(
        [
            "bench-cdc",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--factor",
            "1",
            "--factor",
            "2",
            "--cap-mb",
            "0.02",
            "--out-dir",
            str(tmp_path),
        ]
    )
    assert rc == 0
    recs = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert [r["factor"] for r in recs] == [1, 2]
    for r in recs:
        assert r["walk"]["over_cap_batches"] == []  # cap held per batch
        assert r["stream"]["rows_consumed"] == r["total_rows"]  # exactly once
        assert r["stream"]["sum_final_counts"] == r["total_rows"]
        assert r["stream"]["state_rows"] == r["stream"]["n_sources"]
    # batch count grows with corpus bytes at a fixed cap — and never
    # super-linearly (a super-linear count would mean per-trigger
    # planning re-reads history)
    b1, b2 = (r["walk"]["n_batches"] for r in recs)
    assert b2 >= b1
    assert b2 <= 2 * b1 + 2


def test_cli_snapshot_export_iceberg(spark, tmp_path, capsys):
    """snapshot-export-iceberg writes v2 metadata and prints the
    summary + history; the exported layout reads back."""
    import json
    import os

    from pyspark.sql import functions as F

    from bfs_mapreduce_spark.cli import main
    from bfs_mapreduce_spark.sources import table_snapshots as ts
    from bfs_mapreduce_spark.sources.iceberg_meta import read_iceberg_table

    root = str(tmp_path / "tbl")
    out = str(tmp_path / "ice")
    os.makedirs(root)
    d = spark.range(8).select(F.col("id").alias("k"))
    ts.commit(
        root, ts.stage_files(d, root), base_version=0, schema=d.schema.json()
    )
    rc = main(["snapshot-export-iceberg", root, out])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip())
    assert summary["exported"] == {"1": 1} or summary["exported"] == {1: 1}
    assert summary["history"][0]["is_current"]
    assert sorted(
        r["k"] for r in read_iceberg_table(spark, out).collect()
    ) == list(range(8))


def test_cli_bench_meta_commit_stays_o_new_files(capsys):
    """bench-meta (round 15, verdict ask #3): the append commit path
    must stay O(new files + n_segments) as the table accumulates
    files — the pre-fix behavior (full base resolution per append)
    showed tail/head ~11x at 400 commits; the structural invariants
    here (plus a generous latency-ratio bound) pin the fix."""
    import json

    from bfs_mapreduce_spark.cli import main

    rc = main(["bench-meta", "--commits", "60", "--files-per-commit", "4"])
    assert rc == 0
    recs = {
        json.loads(ln)["step"]: json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
    }
    c = recs["commits"]
    assert c["total_files"] == 240
    # generous bound (timing on shared CI): the broken path measured
    # ~2.6x at even 100 commits; the fixed one ~1.0-1.3x
    assert c["tail_over_head"] < 2.5
    assert recs["read_manifest_full"]["n_files"] == 240
    assert recs["cdc_plan_one_commit"]["n_added"] == 4
    assert recs["rewrite_manifests"]["n_segments_after"] == 1
    v = recs["vacuum"]
    assert v["n_live"] == 120 and v["n_deleted"] >= 120


def test_cli_bench_rowcdc_late_commit_is_o_commit(capsys):
    """bench-rowcdc (round 15, verdict ask #6): row-level change
    derivation is scoped to each COMMIT's files — the late one-file
    delete's batch plans exactly one partition and emits exactly its
    victims, independent of table size."""
    import json

    from bfs_mapreduce_spark.cli import main

    rc = main(
        ["bench-rowcdc", "--sf-dir", "/root/testdata/sf0.001", "--factor", "1"]
    )
    assert rc == 0
    recs = [
        json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()
    ]
    drains = [r for r in recs if r.get("step") == "capped_drain"]
    assert len(drains) == 1 and drains[0]["runs"] >= 2  # cap split the history
    by_v = {r["version"]: r for r in recs if "version" in r}
    assert by_v[1]["op"] == "append" and by_v[1]["rows_emitted"] > 0
    assert by_v[5]["op"] == "append" and by_v[5]["n_partitions"] == 1
    assert by_v[5]["rows_emitted"] == 200
    assert by_v[6]["op"] == "delete" and by_v[6]["n_partitions"] == 1
    assert by_v[6]["rows_emitted"] == 100
    # bulk deletes touch their masked files only (the staged 8)
    assert by_v[2]["n_partitions"] <= 8


def test_cli_snapshot_vacuum_dry_run(spark, tmp_path, capsys):
    """Round-15: --dry-run lists exactly what the real vacuum would
    delete, deletes nothing, and the real call then deletes exactly
    that list."""
    import json
    import os

    from bfs_mapreduce_spark.cli import main
    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    v = ts.commit(
        root, ts.stage_files(spark.range(6).toDF("k"), root), base_version=0
    )
    ts.commit(
        root,
        ts.stage_files(spark.range(6, 9).toDF("k"), root),
        base_version=v,
        replace=True,
    )
    rc = main(["snapshot-vacuum", root, "--retain-last", "1",
               "--force", "--dry-run"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    would = ts.vacuum(root, retain_from=2, dry_run=True)
    assert out["n_deleted"] == len(would) > 0
    assert all(os.path.exists(p) for p in would)  # nothing deleted
    real = ts.vacuum(root, retain_from=2)
    assert real == would
    assert not any(os.path.exists(p) for p in real)


def test_cli_snapshot_property(spark, tmp_path, capsys):
    """Round-16: the snapshot-property verb sets/lists/unsets table
    properties (JSON-typed values) and the cadence property it drives
    actually bounds segments on later appends."""
    import json
    import os

    from bfs_mapreduce_spark.cli import main
    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    d = spark.range(4).toDF("k")
    v = ts.commit(root, ts.stage_files(d, root), base_version=0,
                  schema=d.schema.json())
    rc = main(["snapshot-property", root, "--set",
               "commit.rewrite-segments-every", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 3 and isinstance(out["value"], int)
    rc = main(["snapshot-property", root, "--set", "changeFeed", "true"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip())["value"] is True
    rc = main(["snapshot-property", root, "--list"])
    assert rc == 0
    props = json.loads(capsys.readouterr().out.strip())
    assert props == {"commit.rewrite-segments-every": 3, "changeFeed": True}
    # the cadence property is live: appends stay segment-bounded
    v = ts.current_version(root)
    for i in range(1, 7):
        v = ts.commit(
            root,
            ts.stage_files(spark.range(4 * i, 4 * i + 4).toDF("k"), root),
            base_version=v,
        )
        assert len(ts.read_manifest(root)["_segments"] or []) <= 3
    rc = main(["snapshot-property", root, "--unset", "changeFeed"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["snapshot-property", root, "--list"])
    props = json.loads(capsys.readouterr().out.strip())
    assert props == {"commit.rewrite-segments-every": 3}


def test_cli_sql_end_to_end(spark, tmp_path, capsys):
    """Round 18: the `sql` verb — CTAS, UPDATE, and SELECT over a
    --table view run as shell statements; DESCRIBE HISTORY takes the
    manifest-only path (no session required)."""
    import json

    from bfs_mapreduce_spark.cli import main

    root = str(tmp_path / "tbl")
    t = f"--table=t={root}"
    rc = main(
        ["sql", "CREATE TABLE t AS SELECT id AS k, CAST(id * 2.0 AS DOUBLE)"
         " AS v FROM range(5)", t]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["operation"] == "create" and out["version"] == 1

    rc = main(["sql", "UPDATE t SET v = v + 0.5 WHERE k >= 3", t])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["operation"] == "update"

    rc = main(["sql", "SELECT k, v FROM t ORDER BY k", t])
    assert rc == 0
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert rows[3] == {"k": 3, "v": 6.5} and rows[4] == {"k": 4, "v": 8.5}
    assert rows[0] == {"k": 0, "v": 0.0}

    rc = main(["sql", "DESCRIBE HISTORY t", t])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    ops = [h["operation"] for h in out["history"]]
    assert ops[-1] == "create" and "merge" in ops
