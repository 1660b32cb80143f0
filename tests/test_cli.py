"""CLI lifecycle end-to-end: spec/check/discover/read/state/compact/vacuum
(the reference's cobra command surface, protocol/root.go:71-78)."""

from __future__ import annotations

import json
import os

import pytest

from gen_fixtures import generate_changelog
from gear5_spark.cli import main


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory, spark):
    root = tmp_path_factory.mktemp("cli")
    log = str(root / "log")
    generate_changelog(log, n_events=2_000, n_convs=40, chunk_rows=500)
    cfg = {
        "changelog_dir": log,
        "table_dir": str(root / "table"),
        "checkpoint_dir": str(root / "ckpt"),
        "mode": "bulk",
        "n_buckets": 4,
    }
    cfg_path = str(root / "cfg.json")
    with open(cfg_path, "w") as fh:
        json.dump(cfg, fh)
    return cfg, cfg_path


def _run(capsys, argv) -> tuple[int, dict]:
    rc = main(argv)
    out = capsys.readouterr().out.strip()
    return rc, json.loads(out)


def test_spec(capsys):
    rc, doc = _run(capsys, ["spec"])
    assert rc == 0 and doc["type"] == "SPEC"
    assert "changelog_dir" in doc["spec"]["properties"]


def test_check_ok_and_bad_config(capsys, pipeline, tmp_path):
    cfg, cfg_path = pipeline
    rc, doc = _run(capsys, ["check", "--config", cfg_path])
    assert rc == 0 and doc["status"] == "SUCCEEDED"
    bad = dict(cfg, mode="nope")
    bad_path = str(tmp_path / "bad.json")
    with open(bad_path, "w") as fh:
        json.dump(bad, fh)
    rc, doc = _run(capsys, ["check", "--config", bad_path])
    assert rc == 1 and doc["status"] == "FAILED"


def test_discover_types_payload(capsys, pipeline):
    _, cfg_path = pipeline
    rc, doc = _run(capsys, ["discover", "--config", cfg_path, "--sample", "200"])
    assert rc == 0
    stream = doc["streams"][0]
    assert stream["source_defined_primary_key"] == ["conv_id", "turn_idx"]
    typed = stream["payload_fields_typed"]
    assert typed["role"]["type"] == "string"
    assert typed["ts"]["type"] == "epoch_seconds"  # configured schema wins


def test_read_then_state(capsys, pipeline):
    _, cfg_path = pipeline
    rc, doc = _run(capsys, ["read", "--config", cfg_path])
    assert rc == 0 and doc["type"] == "STATE" and doc["rows"] > 0
    cfg, _ = pipeline
    rc, st = _run(capsys, ["state", "--table-dir", cfg["table_dir"]])
    assert rc == 0
    assert st["snapshot_version"] >= 1
    assert st["lineage_tail"], "lineage tail must carry the commit row"
    assert st["txn"]  # the bulk app recorded its batch


def test_compact_and_vacuum(capsys, pipeline):
    cfg, _ = pipeline
    rc, doc = _run(capsys, ["compact", "--table-dir", cfg["table_dir"]])
    assert rc == 0  # CoW table: nothing to compact is a clean no-op
    assert "nothing to compact" in doc["message"]
    rc, doc = _run(
        capsys,
        ["vacuum", "--table-dir", cfg["table_dir"], "--retention-sec", "0"],
    )
    assert rc == 0 and doc["removed_commits"] == []


def test_bulk_read_respects_delete_mode_soft(capsys, spark, tmp_path):
    """Config knobs must reach the BULK applier too: delete_mode=soft
    keeps tombstones instead of silently hard-deleting."""
    import pyspark.sql.functions as F

    log = str(tmp_path / "log")
    generate_changelog(log, n_events=2_000, n_convs=40, chunk_rows=500)
    cfg = {
        "changelog_dir": log,
        "table_dir": str(tmp_path / "table"),
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "mode": "bulk",
        "n_buckets": 4,
        "delete_mode": "soft",
    }
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as fh:
        json.dump(cfg, fh)
    rc, _ = _run(capsys, ["read", "--config", cfg_path])
    assert rc == 0
    from gear5_spark.lake.table import LakeTable

    table = LakeTable(spark, cfg["table_dir"])
    n_tombstones = (
        table.read().filter(F.col("_cdc_deleted_at").isNotNull()).count()
    )
    assert n_tombstones > 0  # deletes survived as tombstones


def test_check_reports_type_error_as_failed(capsys, tmp_path):
    """A wrong-typed config value must yield a FAILED status line, not a
    traceback (dataclasses don't type-check)."""
    cfg_path = str(tmp_path / "bad.json")
    with open(cfg_path, "w") as fh:
        json.dump(
            {"changelog_dir": "x", "table_dir": "y",
             "checkpoint_dir": "z", "n_buckets": "16"},
            fh,
        )
    rc, doc = _run(capsys, ["check", "--config", cfg_path])
    assert rc == 1 and doc["status"] == "FAILED"
