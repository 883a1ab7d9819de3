"""Staging-hygiene contracts of tmputil: per-process isolation, the
dead-pid sweep, and survival of live siblings."""

from __future__ import annotations

import os

from bfs_mapreduce_spark import tmputil


def test_proc_dir_is_per_process_and_registered(tmp_path, monkeypatch):
    monkeypatch.setattr(tmputil.tempfile, "gettempdir", lambda: str(tmp_path))
    d = tmputil.proc_dir("fam_x")
    assert tmputil.PROC in d
    assert d in tmputil._OWNED
    assert tmputil.proc_dir("fam_x") == d  # stable within the process


def test_sweep_removes_dead_pid_dirs_keeps_live(tmp_path):
    root = tmp_path / "fam_y"
    root.mkdir()
    # a pid that cannot exist (beyond pid_max) => treated as dead
    dead = root / "p99999999_deadbeef"
    dead.mkdir()
    (dead / "junk").write_text("x")
    live = root / f"p{os.getpid()}_cafebabe"
    live.mkdir()
    not_ours = root / "results"  # no p<pid>_ shape: never touched
    not_ours.mkdir()
    tmputil._sweep_stale(str(root))
    assert not dead.exists()
    assert live.exists()
    assert not_ours.exists()


def test_atexit_cleanup_removes_owned(tmp_path, monkeypatch):
    monkeypatch.setattr(tmputil.tempfile, "gettempdir", lambda: str(tmp_path))
    d = tmputil.proc_dir("fam_z")
    os.makedirs(d, exist_ok=True)
    tmputil._cleanup()
    assert not os.path.exists(d)


def test_stage_rows_executor_token_idempotent(spark, tmp_path):
    """Round 16 (ADVICE): a two-arg writer receives a token derived
    from the task's partition id — deterministic across retries — so
    re-executing a task overwrites instead of duplicating. Pinned by
    running the SAME plan twice into one directory: file count and
    row content must not grow."""
    import os

    from bfs_mapreduce_spark.tmputil import stage_rows_executor

    out = str(tmp_path / "staged")
    os.makedirs(out)

    def write_rows(pdf, token):
        pdf.to_parquet(os.path.join(out, f"part_{token}.parquet"))

    df = spark.range(100).toDF("k").repartition(4)
    n1 = stage_rows_executor(df, write_rows)
    files1 = sorted(os.listdir(out))
    # simulated retry: the identical plan re-executes every task
    n2 = stage_rows_executor(df, write_rows)
    files2 = sorted(os.listdir(out))
    assert n1 == n2 == 100
    assert files1 == files2, "a retry must overwrite, not duplicate"
    got = spark.read.parquet(out).count()
    assert got == 100
