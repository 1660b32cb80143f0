"""The north rule's launch mode, actually exercised: package the engine,
run the pipeline under `spark-submit --py-files engine.zip` in a separate
JVM, and check the produced table from this process."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from gen_fixtures import generate_changelog

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(sys.executable), "spark-submit"
)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_replay(tmp_path):
    from scripts.package import build

    log = str(tmp_path / "log")
    manifest = generate_changelog(log, n_events=2_000, n_convs=40, chunk_rows=500)
    zip_path = build(str(tmp_path / "engine.zip"))
    cfg = {
        "changelog_dir": log,
        "table_dir": str(tmp_path / "table"),
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "mode": "bulk",
        "n_buckets": 4,
    }
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as fh:
        json.dump(cfg, fh)

    env = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_GRAFT_DRIVER_MEM="4g")
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--driver-memory", "4g",  # session conf is too late under submit
            "--py-files", zip_path,
            os.path.join(ROOT, "run_pipeline.py"),
            "--config", cfg_path,
        ],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    state_lines = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith('{"type": "STATE"')
    ]
    assert state_lines, proc.stdout[-2000:]
    assert state_lines[-1]["rows"] == manifest["final_live_keys"]

    # the submitted JVM's table is a plain lake table — verify its final
    # state from THIS session too (cross-process read path)
    from gear5_spark.lake.table import LakeTable
    from gear5_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    table = LakeTable(spark, cfg["table_dir"])
    assert table.read().count() == manifest["final_live_keys"]
