"""Exactly-once semantics: restart-from-checkpoint, commit dedup, idempotent
re-apply (SURVEY.md §5.3, BASELINE restart row).

The reference only achieves at-least-once: it ACKs the LSN after emitting
records to stdout (``/root/reference/pkg/waljs/waljs.go:252-257``), so a
crash between emit and ACK duplicates records. Our engine must be strictly
stronger: checkpointed offsets + the lake table's txn ledger make a replayed
micro-batch a no-op.
"""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.base import PySparkException

from gear5_spark.pipeline.apply import TranscriptsApplier
from gear5_spark.pipeline.runner import bootstrap_table, make_applier, run_stream
from gear5_spark.sources.changelog import read_changelog
from tests.oracle import oracle_rows

COMPARE_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


class CrashingApplier(TranscriptsApplier):
    """Applies normally, then raises once batch `crash_at` is reached —
    simulating a mid-stream crash AFTER some batches committed."""

    crash_at: int = 3
    crashed: bool = False

    def __call__(self, batch, batch_id):
        if batch_id >= self.crash_at and not CrashingApplier.crashed:
            CrashingApplier.crashed = True
            raise RuntimeError(f"injected crash before applying batch {batch_id}")
        return super().__call__(batch, batch_id)


def _assert_matches_oracle(table, changelog_dir):
    got = [
        r.asDict()
        for r in table.read()
        .select(*COMPARE_COLS)
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    want = oracle_rows(changelog_dir)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for c in COMPARE_COLS:
            assert g[c] == w[c], (g, w, c)


def test_restart_from_checkpoint_no_dupes_no_losses(
    spark, tiny_changelog, tmp_path
):
    changelog_dir, manifest = tiny_changelog
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt")

    CrashingApplier.crashed = False
    applier = make_applier(table, ckpt)
    crasher = CrashingApplier(
        table=applier.table,
        app_id=applier.app_id,
        registry_path=applier.registry_path,
    )
    with pytest.raises((PySparkException, Exception)) as exc_info:
        run_stream(
            spark,
            changelog_dir,
            table,
            checkpoint_dir=ckpt,
            max_files_per_trigger=1,
            applier=crasher,
            timeout_sec=600,
        )
    assert "injected crash" in str(exc_info.value)
    committed_before = table.last_committed_batch("transcripts-cdc")
    assert committed_before is not None and committed_before >= 0
    partial = table.read().count()
    assert 0 < partial  # some state committed, stream died mid-flight

    # restart: checkpoint replays the failed batch; ledger skips committed
    resumed = make_applier(table, ckpt)
    run_stream(
        spark,
        changelog_dir,
        table,
        checkpoint_dir=ckpt,
        max_files_per_trigger=1,
        applier=resumed,
        timeout_sec=600,
    )
    _assert_matches_oracle(table, changelog_dir)
    # every event accounted for exactly once in lineage
    lineage = table.lineage_df().collect()
    assert sum(r["event_count"] for r in lineage) == manifest["n_events"]
    seen = sorted((r["lsn_min"], r["lsn_max"]) for r in lineage)
    for (a1, b1), (a2, b2) in zip(seen, seen[1:]):
        assert a2 > b1, "overlapping lsn ranges — double apply"


def test_replayed_batch_is_skipped(spark, tiny_changelog, tmp_path):
    """Crash AFTER commit but BEFORE checkpoint write: the re-delivered
    batch must be a no-op (commit-dedup via the txn ledger)."""
    changelog_dir, _ = tiny_changelog
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    applier = make_applier(table, str(tmp_path / "ckpt"))
    batch = read_changelog(spark, changelog_dir, max_lsn=999)

    snap1 = applier(batch, 0)
    assert snap1 is not None
    v1 = table.current_version()
    rows1 = table.read().count()

    snap2 = applier(batch, 0)  # re-delivery of same batch id
    assert snap2 is None
    assert applier.skipped_batches == [0]
    assert table.current_version() == v1
    assert table.read().count() == rows1


def test_atomic_commit_no_torn_state(spark, tiny_changelog, tmp_path):
    """A failed merge (simulated by writing then NOT committing) leaves the
    current snapshot untouched and its files intact; vacuum removes the
    orphan data."""
    import os

    changelog_dir, _ = tiny_changelog
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    applier = make_applier(table, str(tmp_path / "ckpt"))
    applier(read_changelog(spark, changelog_dir, max_lsn=4999), 0)
    v = table.current_version()
    rows = table.read().count()

    # simulate a writer that produced files but died before commit
    from pyspark.sql import functions as F

    orphan_df = table.read().limit(10).withColumn("_bucket", F.lit(0))
    table.write_data_files(orphan_df)
    assert table.current_version() == v
    assert table.read().count() == rows

    # default retention (1h) protects a freshly-written uncommitted dir —
    # a mid-batch writer's files must survive a concurrent vacuum
    assert table.vacuum() == []
    removed = table.vacuum(retention_sec=0)
    assert len(removed) == 1
    assert table.read().count() == rows  # live data untouched
