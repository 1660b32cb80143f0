"""Manifest-list scale story (VERDICT r1 #8): commit payload grows O(new
files + manifests), not O(table files); bucket-granular liveness keeps
kept entries attributed to their original immutable manifests."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from gear5_spark.lake.table import LakeTable, _manifest_path


def _mk(spark, tmp_path, n_buckets=4):
    return LakeTable.create(
        spark,
        str(tmp_path / "t"),
        schema=T.StructType(
            [
                T.StructField("k", T.StringType(), False),
                T.StructField("v", T.LongType(), True),
            ]
        ),
        key_columns=["k"],
        n_buckets=n_buckets,
    )


def _fake_entries(commit_id: str, buckets) -> list[dict]:
    return [
        {"path": f"data/{commit_id}/f{b}.parquet", "bucket": b, "rows": 10}
        for b in buckets
    ]


def test_snapshot_size_grows_per_manifest_not_per_file(spark, tmp_path):
    table = _mk(spark, tmp_path)
    files: list[dict] = []
    sizes = []
    for v in range(1, 31):
        files = files + _fake_entries(f"c{v}", range(4))  # append-style (MoR)
        table.commit(files=files, lineage={"batch_id": v})
        sizes.append(os.path.getsize(_manifest_path(table.table_dir, v)))
    # each commit added 4 file entries but the snapshot grew by ONE
    # manifest ref (~100 bytes), not by 4 serialized entries
    growth_late = sizes[-1] - sizes[-2]
    assert growth_late < 150
    snap = table.snapshot()
    assert len(snap.files) == 30 * 4
    assert len(snap.manifest_list) == 30
    # lineage: one entry per snapshot, never a re-serialized tail
    assert len(snap.lineage) == 1 and snap.lineage[0]["batch_id"] == 30


def test_bucket_rewrite_updates_liveness_without_touching_manifests(
    spark, tmp_path
):
    table = _mk(spark, tmp_path)
    base = _fake_entries("base", range(4))
    table.commit(files=base)
    # rewrite buckets 1 and 3 (CoW merge shape): kept buckets stay
    # attributed to the base manifest, rewritten ones land in a new one
    kept = [f for f in base if f["bucket"] in (0, 2)]
    rewritten = _fake_entries("rw", (1, 3))
    table.commit(files=kept + rewritten)
    snap = table.snapshot()
    assert {f["path"] for f in snap.files} == {
        f["path"] for f in kept + rewritten
    }
    assert len(snap.manifest_list) == 2
    by_path = {m["path"]: m["buckets"] for m in snap.manifest_list}
    buckets_sets = sorted(tuple(b) for b in by_path.values())
    assert buckets_sets == [(0, 2), (1, 3)]
    # full rewrite (compaction shape): list collapses to one manifest
    table.commit(files=_fake_entries("full", range(4)))
    assert len(table.snapshot().manifest_list) == 1


def test_time_travel_resolves_old_manifest_lists(spark, tmp_path):
    table = _mk(spark, tmp_path)
    a = _fake_entries("a", range(4))
    table.commit(files=a)
    table.commit(files=_fake_entries("b", range(4)))
    old = table.snapshot(1)
    assert {f["path"] for f in old.files} == {f["path"] for f in a}


def test_rebucket_rewrites_layout_and_preserves_data(spark, tmp_path):
    """Re-bucketing: new bucket count, same rows, pruned lookups still
    correct, old snapshots keep the old layout (time travel)."""
    import json
    import os

    import pyarrow.parquet as pq_
    from gen_fixtures import CHANGE_SCHEMA
    import pyarrow as pa

    from gear5_spark.pipeline.runner import bootstrap_table, make_applier
    from gear5_spark.sources.changelog import read_changelog

    log = str(tmp_path / "log")
    os.makedirs(log)
    n = 40
    payload = [
        json.dumps({"role": "u", "text": f"t{i}", "ts": 1_700_000_000 + i})
        for i in range(n)
    ]
    tbl = pa.table(
        {
            "lsn": list(range(n)),
            "txn_id": [0] * n,
            "txn_seq": list(range(n)),
            "op": ["insert"] * n,
            "ts_ms": [1_700_000_000_000 + i for i in range(n)],
            "conv_id": [f"c{i}" for i in range(n)],
            "turn_idx": [0] * n,
            "after_json": payload,
        },
        schema=CHANGE_SCHEMA,
    )
    pq_.write_table(tbl, os.path.join(log, "chunk-000000.parquet"))

    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=4)
    make_applier(table, str(tmp_path / "c"))(read_changelog(spark, log), 0)
    before = {r["conv_id"]: r["text"] for r in table.read().collect()}
    v_old = table.current_version()

    table.rebucket(8)
    snap = table.snapshot()
    assert snap.properties["n_buckets"] == 8
    assert {f["bucket"] for f in snap.files} <= set(range(8))
    assert len({f["bucket"] for f in snap.files}) > 4  # actually spread
    after = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert after == before
    # pruned point lookup uses the NEW layout
    row = table.lookup(conv_id="c7", turn_idx=0).collect()
    assert len(row) == 1 and row[0]["text"] == "t7"
    # time travel: the old snapshot still resolves with the old layout
    old = table.snapshot(v_old)
    assert old.properties["n_buckets"] == 4
    assert table.read(snapshot=old).count() == n


def test_manifest_list_matches_inline_model_under_random_commits(
    spark, tmp_path
):
    """Property: for any sequence of whole-bucket commit operations
    (append / rewrite-buckets / truncate / full-rewrite), the
    manifest-list resolution equals a plain inline-files model, at every
    version (time travel included)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ops = st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.sets(st.integers(0, 3), min_size=1)),
            st.tuples(st.just("rewrite"), st.sets(st.integers(0, 3), min_size=1)),
            st.tuples(st.just("truncate"), st.just(set())),
            st.tuples(st.just("full"), st.just({0, 1, 2, 3})),
        ),
        min_size=1,
        max_size=12,
    )

    case = [0]

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ops)
    def run(sequence):
        case[0] += 1
        table = _mk(spark, tmp_path / f"case{case[0]}")
        model: list[dict] = []  # the inline-files ground truth
        history = [list(model)]
        for i, (op, buckets) in enumerate(sequence):
            new = _fake_entries(f"c{case[0]}-{i}", sorted(buckets))
            if op == "append":
                model = model + new
            elif op == "rewrite":
                model = [f for f in model if f["bucket"] not in buckets] + new
            elif op == "truncate":
                model = []
            elif op == "full":
                model = new
            table.commit(files=list(model))
            history.append(list(model))
        for v, want in enumerate(history):
            got = table.snapshot(v).files
            assert {f["path"] for f in got} == {f["path"] for f in want}, (
                f"version {v} diverged"
            )

    run()
