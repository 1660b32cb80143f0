"""Live-CDC adapter contract (sources/wal_adapter.py): wal2json frames ->
schema-exact changelog chunks, ACK gating, restart resume — the bits a
psycopg2/pglogrepl binding plugs into (reference wire loop:
pkg/waljs/waljs.go:126-259, ACK :149-169)."""

from __future__ import annotations

import pytest

from gear5_spark.sources.changelog import CHANGE_SCHEMA, read_changelog
from gear5_spark.sources.wal_adapter import (
    WalFeedWriter,
    changes_from_wal2json,
)


def _tx(xid, changes, ts="2026-01-01 12:00:00.5+00"):
    return {"xid": xid, "timestamp": ts, "change": changes}


def _ins(conv, turn, text="hi", role="user"):
    return {
        "kind": "insert",
        "schema": "public",
        "table": "transcripts",
        "columnnames": ["conv_id", "turn_idx", "role", "text"],
        "columnvalues": [conv, turn, role, text],
    }


def _del(conv, turn):
    return {
        "kind": "delete",
        "schema": "public",
        "table": "transcripts",
        "oldkeys": {
            "keynames": ["conv_id", "turn_idx"],
            "keyvalues": [conv, turn],
        },
    }


def test_wal2json_flatten_order_and_payload():
    rows = changes_from_wal2json(
        700, _tx(41, [_ins("c1", 0), _ins("c1", 1), _del("c0", 3)])
    )
    assert [(r["lsn"], r["txn_id"], r["txn_seq"]) for r in rows] == [
        (700, 41, 0),
        (700, 41, 1),
        (700, 41, 2),
    ]
    assert rows[0]["after_json"] == '{"role": "user", "text": "hi"}'
    # delete: key from oldkeys, no after image
    assert rows[2]["op"] == "delete"
    assert rows[2]["after_json"] is None
    assert (rows[2]["conv_id"], rows[2]["turn_idx"]) == ("c0", 3)
    # include-timestamp parsed to epoch ms (UTC-offset required)
    assert rows[0]["ts_ms"] == 1767268800500
    with pytest.raises(ValueError, match="timezone"):
        changes_from_wal2json(1, _tx(1, [_ins("c", 0)], ts="2026-01-01 12:00:00"))


def test_key_changing_update_retracts_old_identity():
    """UPDATE that changes a replica-identity key column must flatten to
    delete(oldkeys) + upsert(new) — a single upsert under the new key
    would leave the old row live forever. txn_seq stays dense over the
    EMITTED rows so (lsn, txn_seq) keeps its total order."""
    upd = {
        "kind": "update",
        "columnnames": ["conv_id", "turn_idx", "role", "text"],
        "columnvalues": ["c1", 5, "user", "moved"],
        "oldkeys": {
            "keynames": ["conv_id", "turn_idx"],
            "keyvalues": ["c1", 3],
        },
    }
    rows = changes_from_wal2json(900, _tx(7, [_ins("c9", 0), upd]))
    assert [
        (r["txn_seq"], r["op"], r["conv_id"], r["turn_idx"]) for r in rows
    ] == [
        (0, "insert", "c9", 0),
        (1, "delete", "c1", 3),  # retraction first (lower seq)
        (2, "update", "c1", 5),
    ]
    assert rows[1]["after_json"] is None
    # key-preserving update (oldkeys present, same key): single row
    same = dict(upd, oldkeys={
        "keynames": ["conv_id", "turn_idx"], "keyvalues": ["c1", 5],
    })
    rows = changes_from_wal2json(901, _tx(8, [same]))
    assert [(r["txn_seq"], r["op"]) for r in rows] == [(0, "update")]


def test_key_changing_update_applies_end_to_end(spark, tmp_path):
    from gear5_spark.pipeline.runner import bootstrap_table, make_applier

    log = str(tmp_path / "wal")
    w = WalFeedWriter(log)
    w.on_message(1, _tx(1, [_ins("c1", 3, text="v1")]))
    w.on_message(2, _tx(2, [{
        "kind": "update",
        "columnnames": ["conv_id", "turn_idx", "role", "text"],
        "columnvalues": ["c1", 5, "user", "v2"],
        "oldkeys": {
            "keynames": ["conv_id", "turn_idx"],
            "keyvalues": ["c1", 3],
        },
    }]))
    w.flush()
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=4)
    applier = make_applier(table, str(tmp_path / "ckpt"))
    applier(read_changelog(spark, log), 0)
    rows = {
        (r.conv_id, r.turn_idx): r.text
        for r in table.read().select("conv_id", "turn_idx", "text").collect()
    }
    # the old identity (c1,3) is gone, not duplicated
    assert rows == {("c1", 5): "v2"}


def test_missing_replica_identity_key_rejected():
    bad = {
        "kind": "insert",
        "columnnames": ["role", "text"],  # no key columns at all
        "columnvalues": ["user", "hi"],
    }
    with pytest.raises(ValueError, match="REPLICA IDENTITY"):
        changes_from_wal2json(5, _tx(1, [bad]))


def test_writer_chunks_match_feed_schema_exactly(spark, tmp_path):
    log = str(tmp_path / "wal")
    w = WalFeedWriter(log)
    assert w.ackable_lsn() is None  # nothing durable yet
    w.on_message(100, _tx(1, [_ins("c1", 0), _ins("c2", 0)]))
    w.on_message(101, _tx(2, [_del("c2", 0)]))
    assert w.ackable_lsn() is None  # buffered rows are NOT ackable
    w.flush()
    assert w.ackable_lsn() == 101  # durable -> safe to SendStandbyStatusUpdate

    df = read_changelog(spark, log)
    # the binding's output is byte-compatible with the native feed
    # (Spark file sources relax nullability on read, so compare
    # name/type — the parquet footer still carries required/optional
    # per FEED contract)
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in CHANGE_SCHEMA.fields
    ]
    got = {
        (r.lsn, r.txn_seq): (r.op, r.conv_id, r.turn_idx, r.after_json)
        for r in df.collect()
    }
    assert got[(100, 0)][0:3] == ("insert", "c1", 0)
    assert got[(101, 0)] == ("delete", "c2", 0, None)


def test_writer_restart_resumes_after_durable_max(tmp_path):
    log = str(tmp_path / "wal")
    w = WalFeedWriter(log)
    w.on_message(10, _tx(1, [_ins("a", 0)]))
    w.flush()
    w.on_message(20, _tx(2, [_ins("a", 1)]))  # buffered, then crash
    w2 = WalFeedWriter(log)  # restart
    # START_REPLICATION restarts from the durable max — the lost buffered
    # frame (lsn 20) is newer and will be re-delivered by the slot
    assert w2.resume_lsn() == 10
    w2.on_message(20, _tx(2, [_ins("a", 1)]))
    w2.flush()
    assert w2.ackable_lsn() == 20
    # second chunk got a fresh index, not an overwrite
    names = sorted(p.name for p in (tmp_path / "wal").iterdir())
    assert names == ["chunk-000000.parquet", "chunk-000001.parquet"]


def test_adapter_feed_applies_end_to_end(spark, tmp_path):
    """Chunks written by the adapter replay through the full pipeline."""
    from gear5_spark.pipeline.runner import bootstrap_table, make_applier

    log = str(tmp_path / "wal")
    w = WalFeedWriter(log)
    w.on_message(1, _tx(1, [_ins("c1", 0, text="v1")]))
    w.on_message(2, _tx(2, [_ins("c1", 1, text="x"), _ins("c2", 0)]))
    w.on_message(3, _tx(3, [{
        "kind": "update",
        "columnnames": ["conv_id", "turn_idx", "role", "text"],
        "columnvalues": ["c1", 0, "user", "v2"],
    }, _del("c1", 1)]))
    w.flush()

    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=4)
    applier = make_applier(table, str(tmp_path / "ckpt"))
    applier(read_changelog(spark, log), 0)
    rows = {
        (r.conv_id, r.turn_idx): r.text
        for r in table.read().select("conv_id", "turn_idx", "text").collect()
    }
    # update wins, delete removed, both convs present
    assert rows == {("c1", 0): "v2", ("c2", 0): "hi"}
