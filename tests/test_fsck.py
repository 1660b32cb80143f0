"""Lake fsck: metadata <-> data consistency checks, including the CLI
surface (which needs no Spark session)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F


def _small_table(spark, tiny_changelog, tmp_path):
    from gear5_spark.pipeline.runner import bootstrap_table, replay_batch

    log_dir, _ = tiny_changelog
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=4)
    replay_batch(spark, log_dir, table, checkpoint_dir=str(tmp_path / "c"))
    return table


def test_fsck_clean_table(spark, tiny_changelog, tmp_path):
    from gear5_spark.lake.fsck import fsck

    table = _small_table(spark, tiny_changelog, tmp_path)
    report = fsck(table, deep=True)
    assert report["ok"]
    assert report["checked_files"] > 0
    assert report["missing_files"] == []
    assert report["rowcount_mismatches"] == []
    assert report["version_holes"] == []


def test_fsck_detects_missing_and_mismatched_files(
    spark, tiny_changelog, tmp_path
):
    from gear5_spark.lake.fsck import fsck

    table = _small_table(spark, tiny_changelog, tmp_path)
    snap = table.snapshot()
    victim = os.path.join(table.table_dir, snap.files[0]["path"])
    os.remove(victim)
    # replace another live file with a truncated copy (1 row)
    other = os.path.join(table.table_dir, snap.files[1]["path"])
    spark.read.parquet(other).limit(1).write.mode("overwrite").parquet(
        str(tmp_path / "tiny")
    )
    part = next(
        p for p in os.listdir(tmp_path / "tiny") if p.endswith(".parquet")
    )
    os.remove(other)
    os.rename(str(tmp_path / "tiny" / part), other)
    report = fsck(table, deep=True)
    assert not report["ok"]
    assert snap.files[0]["path"] in report["missing_files"]
    assert any(
        m["path"] == snap.files[1]["path"]
        for m in report["rowcount_mismatches"]
    )


def test_fsck_reports_orphans_but_stays_ok(spark, tiny_changelog, tmp_path):
    from gear5_spark.lake.fsck import fsck
    from gear5_spark.lake.table import DATA_DIR

    table = _small_table(spark, tiny_changelog, tmp_path)
    stray_dir = os.path.join(table.table_dir, DATA_DIR, "stray-commit")
    os.makedirs(stray_dir)
    spark.range(3).write.mode("overwrite").parquet(stray_dir)
    report = fsck(table)
    assert report["ok"]  # orphans are informational
    assert any("stray-commit" in p for p in report["orphan_files"])


def test_fsck_cli_no_spark(spark, tiny_changelog, tmp_path, capsys):
    from gear5_spark.cli import main

    table = _small_table(spark, tiny_changelog, tmp_path)
    rc = main(["fsck", "--table-dir", table.table_dir, "--deep"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"]
    # break it -> nonzero exit
    os.remove(
        os.path.join(table.table_dir, table.snapshot().files[0]["path"])
    )
    rc = main(["fsck", "--table-dir", table.table_dir])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and not out["ok"]


def test_fsck_deep_reports_corrupt_not_crash(spark, tiny_changelog, tmp_path):
    from gear5_spark.lake.fsck import fsck

    table = _small_table(spark, tiny_changelog, tmp_path)
    victim = os.path.join(table.table_dir, table.snapshot().files[0]["path"])
    with open(victim, "wb") as fh:
        fh.write(b"not a parquet file at all")
    report = fsck(table, deep=True)
    assert not report["ok"]
    assert any(
        c["path"] == table.snapshot().files[0]["path"]
        for c in report["corrupt_files"]
    )


def test_fsck_detects_missing_historical_file(spark, tiny_changelog, tmp_path):
    from gear5_spark.lake.fsck import fsck
    from gear5_spark.pipeline.runner import replay_batch

    log_dir, manifest = tiny_changelog
    table = _small_table(spark, tiny_changelog, tmp_path)
    v1_paths = {f["path"] for f in table.snapshot().files}
    # second commit rewrites buckets -> some v1 files become history-only
    replay_batch(
        spark, log_dir, table, checkpoint_dir=str(tmp_path / "c2"),
        app_id="second-app",
    )
    hist_only = sorted(
        v1_paths - {f["path"] for f in table.snapshot().files}
    )
    assert hist_only, "expected rewritten files"
    os.remove(os.path.join(table.table_dir, hist_only[0]))
    report = fsck(table)
    assert not report["ok"]
    assert report["missing_files"] == []
    assert any(
        m["path"] == hist_only[0]
        for m in report["missing_historical_files"]
    )
