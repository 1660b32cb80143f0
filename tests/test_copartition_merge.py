"""Focused tests for the r6 co-partitioned MERGE (lake/merge.py
slots_per_bucket): result-identical to the legacy two-shuffle plan, and
physically a single full-outer join with no batch-side re-shuffle."""

import pytest
from pyspark.sql import functions as F

from gen_fixtures import generate_changelog
from gear5_spark.pipeline.runner import bootstrap_table, replay_batch


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("coplog") / "log"
    generate_changelog(
        str(d), n_events=6000, n_convs=120, chunk_rows=1500, seed=11
    )
    return str(d)


def _rows(table):
    df = table.read()
    return sorted(
        tuple(str(x) for x in r)
        for r in df.select(*sorted(df.columns)).collect()
    )


def test_copartitioned_merge_matches_legacy_plan(spark, log_dir, tmp_path):
    # phase 1 fills the target; phase 2 exercises the guarded merge
    # against a NON-empty target — fused plan carries _pslot and merges
    # co-partitioned, partial plan drops it and takes the legacy path.
    outs = {}
    for plan in ("fused", "partial"):
        t = bootstrap_table(spark, str(tmp_path / plan), n_buckets=8)
        for lo, hi in ((None, 2999), (2999, None)):
            replay_batch(
                spark, log_dir, t,
                checkpoint_dir=str(tmp_path / f"{plan}-ck{hi}"),
                min_lsn=lo, max_lsn=hi, dedup_plan=plan,
                order_guard=True,
            )
        outs[plan] = _rows(t)
    assert outs["fused"] == outs["partial"]
    assert len(outs["fused"]) > 0


def test_copartitioned_merge_plan_shape(spark, log_dir, tmp_path):
    # the guarded merge's write input: ONE full-outer join, built as a
    # shuffled-hash join on the batch side, with no exchange between the
    # (already-placed) batch and the join
    import gear5_spark.lake.table as LT
    from gear5_spark.pipeline.apply import TranscriptsApplier
    from gear5_spark.pipeline.runner import make_applier
    from gear5_spark.sources.changelog import read_changelog

    t = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    replay_batch(
        spark, log_dir, t, checkpoint_dir=str(tmp_path / "ck0"),
        max_lsn=2999,
    )
    applier = make_applier(t, str(tmp_path / "ck1"), order_guard=True)
    captured = {}
    orig = LT.LakeTable.write_data_files

    def spy(self, df, *a, **k):
        captured.setdefault("plan", df._jdf.queryExecution().executedPlan().toString())
        return orig(self, df, *a, **k)

    LT.LakeTable.write_data_files = spy
    try:
        applier(read_changelog(spark, log_dir, min_lsn=2999), 1)
    finally:
        LT.LakeTable.write_data_files = orig
    plan = captured["plan"]
    assert "ShuffledHashJoin" in plan and "FullOuter" in plan
    joins = sum(
        plan.count(j)
        for j in ("SortMergeJoin", "BroadcastHashJoin")
    )
    assert joins == 0, plan
    # no planner-inserted exchange anywhere: every shuffle left in the
    # plan is an explicit _pslot placement repartition (the legacy plan
    # re-shuffled BOTH join sides by key via ENSURE_REQUIREMENTS —
    # plans/r06/cow_merge_before.txt)
    assert "ENSURE_REQUIREMENTS" not in plan, plan
