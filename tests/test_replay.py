"""End-to-end replay vs serial oracle (SURVEY.md §5.2, BASELINE north star).

The engine replays the change log (bulk and streaming); the final lake
table must equal the serial in-memory fold on every column, under stable
(conv_id, turn_idx) ordering, with per-turn text byte-equality.
"""

from __future__ import annotations

import pytest

from gear5_spark.pipeline.runner import bootstrap_table, replay_batch, run_stream
from tests.oracle import oracle_rows

COMPARE_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _table_rows(table) -> list[dict]:
    df = table.read().select(*COMPARE_COLS).orderBy("conv_id", "turn_idx")
    return [r.asDict() for r in df.collect()]


def _assert_matches_oracle(table, changelog_dir):
    got = _table_rows(table)
    want = oracle_rows(changelog_dir)
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    for g, w in zip(got, want):
        for c in COMPARE_COLS:
            assert g[c] == w[c], (
                f"mismatch at ({w['conv_id']},{w['turn_idx']}) col {c}: "
                f"{g[c]!r} != {w[c]!r}"
            )


def test_bulk_replay_matches_oracle(spark, tiny_changelog, tmp_path):
    changelog_dir, manifest = tiny_changelog
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    replay_batch(
        spark, changelog_dir, table, checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert table.read().count() == manifest["final_live_keys"]
    _assert_matches_oracle(table, changelog_dir)


def test_bulk_replay_pandas_normalizer(spark, tiny_changelog, tmp_path):
    changelog_dir, _ = tiny_changelog
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    replay_batch(
        spark,
        changelog_dir,
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        normalize_mode="pandas",
    )
    _assert_matches_oracle(table, changelog_dir)


def test_streaming_replay_matches_oracle(spark, tiny_changelog, tmp_path):
    changelog_dir, _ = tiny_changelog
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    run_stream(
        spark,
        changelog_dir,
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        available_now=True,
        timeout_sec=300,
    )
    _assert_matches_oracle(table, changelog_dir)
    # multiple micro-batches happened, each an atomic snapshot commit
    assert table.current_version() >= 3


def test_streaming_salted_matches_oracle(spark, tiny_changelog, tmp_path):
    changelog_dir, _ = tiny_changelog
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    applier = None
    from gear5_spark.pipeline.runner import make_applier

    applier = make_applier(
        table, str(tmp_path / "ckpt"), salt_buckets=8, delete_mode="hard"
    )
    run_stream(
        spark,
        changelog_dir,
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        applier=applier,
        timeout_sec=300,
    )
    _assert_matches_oracle(table, changelog_dir)


def test_lineage_covers_all_events(spark, tiny_changelog, tmp_path):
    changelog_dir, manifest = tiny_changelog
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    run_stream(
        spark,
        changelog_dir,
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        timeout_sec=300,
    )
    lineage = table.lineage_df().orderBy("batch_id").collect()
    assert sum(r["event_count"] for r in lineage) == manifest["n_events"]
    # lsn ranges cover the whole log without overlap between batches
    assert lineage[0]["lsn_min"] == 0
    assert lineage[-1]["lsn_max"] == manifest["n_events"] - 1
    for prev, cur in zip(lineage, lineage[1:]):
        assert cur["lsn_min"] > prev["lsn_max"]
    for r in lineage:
        assert r["snapshot_id"] is not None and r["committed_at_ms"] > 0


def test_dedup_plan_partial_matches_fused(spark, tiny_changelog, tmp_path):
    """The fused (placement-keyed, one raw shuffle) and partial
    (map-side-combined max_by) dedup plans are result-identical — the
    contract that makes dedup_plan="auto" safe to switch per batch."""
    changelog_dir, _ = tiny_changelog
    results = {}
    for plan in ("fused", "partial"):
        table = bootstrap_table(spark, str(tmp_path / plan), n_buckets=8)
        replay_batch(
            spark,
            changelog_dir,
            table,
            checkpoint_dir=str(tmp_path / f"ckpt-{plan}"),
            dedup_plan=plan,
        )
        _assert_matches_oracle(table, changelog_dir)
        results[plan] = _table_rows(table)
    assert results["fused"] == results["partial"]


def test_dedup_plan_auto_switches_on_high_duplication(
    spark, tiny_changelog, tmp_path
):
    """auto plan: batch 0 runs fused (no history), records the measured
    events-per-key ratio, and a high-duplication feed flips batch 1 to
    the partial (map-side-combined) plan — with the final table still
    matching the serial oracle."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from gear5_spark.pipeline.runner import make_applier
    from gear5_spark.sources.changelog import read_changelog

    changelog_dir, _ = tiny_changelog
    changes = read_changelog(spark, changelog_dir)
    mid = changes.agg(F.max("lsn")).first()[0] // 2
    b0 = changes.filter(F.col("lsn") <= mid)
    b1 = changes.filter(F.col("lsn") > mid)
    n0 = b0.count()
    k0 = b0.select("conv_id", "turn_idx").distinct().count()
    ratio0 = n0 / k0
    assert ratio0 > 1.0, "fixture half-log must contain updates"

    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    applier = make_applier(
        table,
        str(tmp_path / "ckpt"),
        app_id="auto-plan-test",
        dedup_plan="auto",
        # threshold strictly below the measured batch-0 ratio so the
        # auto plan must flip to partial for batch 1
        partial_plan_dup_ratio=ratio0 * 0.9,
        # phased out-of-order safety is not under test; keep the guard
        order_guard=True,
    )
    applier(b0, 0)
    assert applier._last_dup_ratio == _pytest.approx(ratio0)
    applier(b1, 1)  # partial plan (ratio0 > threshold)
    _assert_matches_oracle(table, changelog_dir)
    # the per-batch plan decision lands in the lineage audit trail
    plans = {
        r["batch_id"]: r["dedup_plan"] for r in table.lineage_df().collect()
    }
    assert plans == {0: "fused", 1: "partial"}


def test_fused_plan_with_salting_is_rejected():
    # honoring dedup_plan="fused" is impossible with salting (co-location
    # vs salt are contradictory); the applier must refuse, not silently
    # run the salted two-shuffle plan (review r4)
    from gear5_spark.pipeline.apply import TranscriptsApplier

    with pytest.raises(ValueError, match="incompatible"):
        TranscriptsApplier(
            table=None, app_id="x", registry_path="/tmp/never-used",
            dedup_plan="fused", salt_buckets=4,
        )
