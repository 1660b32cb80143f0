"""Commit-protocol atomicity THROUGH the pluggable backend interface
(VERDICT r2 #4): fault drills prove a failed publish leaves no torn
state, a post-publish crash is exactly-once on replay, and the CAS
refuses double-commits — all against the interface the object-store
mapping implements (lake/backend.py contract table)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from gear5_spark.lake.backend import (
    AlreadyExists,
    BackendError,
    FaultInjectingBackend,
    PosixBackend,
)
from gear5_spark.lake.table import CommitRaceLost, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


def _mk(spark, tmp_path, backend=None) -> LakeTable:
    t = LakeTable.create(
        spark, str(tmp_path / "tab"), schema=SCHEMA, key_columns=["k"],
        n_buckets=4, if_not_exists=True,
    )
    if backend is not None:
        t.backend = backend
    return t


def test_put_if_absent_cas(tmp_path):
    b = PosixBackend()
    p = str(tmp_path / "obj")
    b.put_if_absent(p, b"one")
    with pytest.raises(AlreadyExists):
        b.put_if_absent(p, b"two")
    assert open(p, "rb").read() == b"one"  # loser never clobbers
    b.put_replace(p, b"three")
    assert open(p, "rb").read() == b"three"
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_failed_publish_leaves_no_torn_state(spark, tmp_path):
    table = _mk(spark, tmp_path)
    v0 = table.current_version()
    # fail BEFORE anything is written: commit must raise and the table
    # must still read at the previous version
    table.backend = FaultInjectingBackend(fail_before_n=1)
    files = [{"path": "data/x/f0.parquet", "bucket": 0, "rows": 1}]
    with pytest.raises(BackendError):
        table.commit(files=files, lineage={"batch_id": 1})
    table.backend = PosixBackend()
    assert table.current_version() == v0
    # no stray temp objects from the failed attempt
    lake = os.path.join(table.table_dir, "_lake")
    assert not [f for f in os.listdir(lake) if f.endswith(".tmp")]
    # and the same commit succeeds cleanly afterwards
    snap = table.commit(files=files, lineage={"batch_id": 1})
    assert snap.version == v0 + 1


def test_crash_after_publish_is_committed(spark, tmp_path):
    """Crash AFTER the snapshot CAS (committer died before acking):
    the commit IS durable — a replayed batch must be deduped by the
    txn ledger, not re-applied."""
    table = _mk(spark, tmp_path)
    v0 = table.current_version()
    # manifest write (call 1) succeeds; fault fires after the snapshot
    # publish (call 2) — the classic ack-lost window
    table.backend = FaultInjectingBackend(fail_after_n=2)
    files = [{"path": "data/x/f0.parquet", "bucket": 0, "rows": 1}]
    with pytest.raises(BackendError):
        table.commit(
            files=files, txn_app_id="app", txn_batch_id=7,
            lineage={"batch_id": 7},
        )
    table.backend = PosixBackend()
    assert table.current_version() == v0 + 1  # durable despite the crash
    assert table.last_committed_batch("app") == 7  # ledger sees it
    # the post-publish fault may interrupt commit() before it returns a
    # refreshed snapshot, so the caller replays batch 7: the ledger
    # makes the replay detectable (exactly-once)
    snap = table.snapshot()
    assert snap.lineage[-1]["batch_id"] == 7


def test_version_race_through_backend(spark, tmp_path):
    """Two writers computing the same next version: exactly one wins the
    CAS; the loser gets CommitRaceLost (and can rebase)."""
    table = _mk(spark, tmp_path)
    basis = table.snapshot()
    files_a = [{"path": "data/a/f0.parquet", "bucket": 0, "rows": 1}]
    files_b = [{"path": "data/b/f1.parquet", "bucket": 1, "rows": 1}]
    table.commit(files=files_a, lineage={"batch_id": 1}, basis=basis)
    other = LakeTable(spark, table.table_dir)

    # simulate the loser publishing against the stale basis by pinning
    # its view: commit() with basis rebases internally, so drive the raw
    # CAS instead — the primitive the rebase path itself relies on
    from gear5_spark.lake.table import _manifest_path

    with pytest.raises(AlreadyExists):
        other.backend.put_if_absent(
            _manifest_path(other.table_dir, basis.version + 1), b"{}"
        )
    # the cooperative path rebases and lands on the next version
    snap = other.commit(files=files_b, lineage={"batch_id": 2}, basis=basis)
    assert snap.version == basis.version + 2


def test_cursor_state_fault_keeps_old_value(tmp_path):
    from gear5_spark.pipeline.state import CursorStateStore

    p = str(tmp_path / "state.json")
    s = CursorStateStore(p)
    s.advance("ns", "st", "ts", 5)
    assert CursorStateStore(p).get("ns", "st") == 5
    faulty = CursorStateStore(p, backend=FaultInjectingBackend(fail_before_n=1))
    with pytest.raises(BackendError):
        faulty.advance("ns", "st", "ts", 9)
    # old cursor intact, no torn file
    assert CursorStateStore(p).get("ns", "st") == 5


def test_posix_backend_bare_relative_path(tmp_path, monkeypatch):
    # bare filename (dirname '') must not crash the directory fsync
    monkeypatch.chdir(tmp_path)
    b = PosixBackend()
    b.put_replace("state.json", b"x")
    assert open("state.json", "rb").read() == b"x"
    b.put_if_absent("once.json", b"y")
    with pytest.raises(AlreadyExists):
        b.put_if_absent("once.json", b"z")
