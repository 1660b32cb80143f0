"""Snapshot diff (incremental read): reconstructed change set between two
versions matches the oracle's state delta."""

from __future__ import annotations

from gear5_spark.lake.diff import table_diff
from gear5_spark.pipeline.runner import bootstrap_table, replay_batch
from tests.oracle import oracle_final_state


def test_table_diff_matches_oracle_delta(spark, tiny_changelog, tmp_path):
    changelog_dir, manifest = tiny_changelog
    half = manifest["n_events"] // 2
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    replay_batch(spark, changelog_dir, table, str(tmp_path / "c"), max_lsn=half - 1)
    v1 = table.current_version()
    replay_batch(spark, changelog_dir, table, str(tmp_path / "c"), min_lsn=half - 1)
    v2 = table.current_version()

    got = {
        (r["conv_id"], r["turn_idx"]): (r["change"], r["text"])
        for r in table_diff(table, v1, v2).collect()
    }

    s1 = oracle_final_state(changelog_dir, max_lsn=half - 1)
    s2 = oracle_final_state(changelog_dir)
    want: dict = {}
    for k in set(s1) | set(s2):
        if k not in s1:
            want[k] = ("insert", s2[k]["text"])
        elif k not in s2:
            want[k] = ("delete", None)
        elif s1[k]["_lsn"] != s2[k]["_lsn"]:
            want[k] = ("update", s2[k]["text"])
    assert got == want
    assert {c for c, _ in want.values()} == {"insert", "update", "delete"}


def test_table_diff_same_version_empty(spark, tiny_changelog, tmp_path):
    changelog_dir, _ = tiny_changelog
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    replay_batch(spark, changelog_dir, table, str(tmp_path / "c"), max_lsn=999)
    v = table.current_version()
    assert table_diff(table, v, v).count() == 0
