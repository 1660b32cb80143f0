"""pgoutput binary decoder: wire-format round-trips into CHANGE_SCHEMA.

Messages are synthesized byte-exact per the public PostgreSQL logical
streaming replication protocol docs (the sandbox has no server), then
decoded and flattened through the same path a live binding uses.
"""

from __future__ import annotations

import json
import os
import struct

import pyarrow.parquet as pq
import pytest

from gear5_spark.sources.pgoutput import (
    PG_EPOCH_MS,
    PgOutputDecoder,
    PgOutputFeed,
    changes_from_pgoutput,
)

# ---------------------------------------------------------------- encoder


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _tuple_data(values) -> bytes:
    """values: list of None | ('u',) | str | bytes."""
    out = struct.pack(">h", len(values))
    for v in values:
        if v is None:
            out += b"n"
        elif v == ("u",):
            out += b"u"
        elif isinstance(v, bytes):
            out += b"b" + struct.pack(">i", len(v)) + v
        else:
            b = str(v).encode()
            out += b"t" + struct.pack(">i", len(b)) + b
    return out


def msg_begin(final_lsn: int, commit_ts_us: int, xid: int) -> bytes:
    return b"B" + struct.pack(">qqi", final_lsn, commit_ts_us, xid)


def msg_commit(commit_lsn: int, end_lsn: int, commit_ts_us: int) -> bytes:
    return b"C" + struct.pack(">bqqq", 0, commit_lsn, end_lsn, commit_ts_us)


def msg_relation(rel_id: int, ns: str, name: str, cols, replident="d") -> bytes:
    """cols: [(name, oid, is_key)]"""
    out = b"R" + struct.pack(">i", rel_id) + _cstr(ns) + _cstr(name)
    out += replident.encode() + struct.pack(">h", len(cols))
    for cname, oid, is_key in cols:
        out += struct.pack(">b", 1 if is_key else 0) + _cstr(cname)
        out += struct.pack(">ii", oid, -1)
    return out


def msg_insert(rel_id: int, values) -> bytes:
    return b"I" + struct.pack(">i", rel_id) + b"N" + _tuple_data(values)


def msg_update(rel_id: int, new, old=None, old_marker=b"K") -> bytes:
    out = b"U" + struct.pack(">i", rel_id)
    if old is not None:
        out += old_marker + _tuple_data(old)
    return out + b"N" + _tuple_data(new)


def msg_delete(rel_id: int, old, marker=b"K") -> bytes:
    return b"D" + struct.pack(">i", rel_id) + marker + _tuple_data(old)


def msg_truncate(rel_ids) -> bytes:
    out = b"T" + struct.pack(">ib", len(rel_ids), 0)
    for rid in rel_ids:
        out += struct.pack(">i", rid)
    return out


# transcripts relation used across tests: (conv_id text, turn_idx int4,
# role text, text text, meta jsonb, score float8, flag bool)
REL = msg_relation(
    4001,
    "public",
    "transcripts",
    [
        ("conv_id", 25, True),
        ("turn_idx", 23, True),
        ("role", 25, False),
        ("text", 25, False),
        ("meta", 3802, False),
        ("score", 701, False),
        ("flag", 16, False),
    ],
)

TS_US = 820_000_000_000_000  # ~2025-12-23 in pg-epoch micros


def _tx(*row_msgs, lsn=1000, xid=77):
    return [msg_begin(lsn, TS_US, xid), REL, *row_msgs,
            msg_commit(lsn, lsn + 8, TS_US)]


# ---------------------------------------------------------------- tests


def test_insert_envelope_and_rows():
    dec = PgOutputDecoder()
    payloads = _tx(
        msg_insert(4001, ["c1", "0", "user", "hello", '{"k": [1, 2]}', "0.5", "t"])
    )
    rows = changes_from_pgoutput(dec, payloads)
    assert len(rows) == 1
    r = rows[0]
    assert (r["lsn"], r["txn_id"], r["txn_seq"], r["op"]) == (1000, 77, 0, "insert")
    assert (r["conv_id"], r["turn_idx"]) == ("c1", 0)
    assert r["ts_ms"] == TS_US // 1000 + PG_EPOCH_MS
    after = json.loads(r["after_json"])
    # typed conversion by OID: jsonb parsed, float8 float, bool real bool
    assert after == {
        "role": "user", "text": "hello", "meta": {"k": [1, 2]},
        "score": 0.5, "flag": True,
    }


def test_update_and_delete_key_extraction():
    dec = PgOutputDecoder()
    payloads = _tx(
        # K old tuple: only key columns carry values, rest NULL padding
        msg_update(
            4001,
            new=["c1", "0", "user", "hi2", None, None, "f"],
            old=["c1", "0", None, None, None, None, None],
        ),
        msg_delete(4001, ["c1", "1", None, None, None, None, None]),
        lsn=2000,
    )
    rows = changes_from_pgoutput(dec, payloads)
    assert [(r["op"], r["turn_idx"], r["txn_seq"]) for r in rows] == [
        ("update", 0, 0), ("delete", 1, 1),
    ]
    assert rows[1]["after_json"] is None
    assert json.loads(rows[0]["after_json"])["flag"] is False


def test_key_changing_update_retracts_old_identity():
    dec = PgOutputDecoder()
    payloads = _tx(
        msg_update(
            4001,
            new=["c1", "5", "user", "moved", None, None, None],
            old=["c1", "2", None, None, None, None, None],
        ),
        lsn=3000,
    )
    rows = changes_from_pgoutput(dec, payloads)
    # delete(old identity) precedes the upsert, dense txn_seq
    assert [(r["op"], r["turn_idx"], r["txn_seq"]) for r in rows] == [
        ("delete", 2, 0), ("update", 5, 1),
    ]


def test_unchanged_toast_backfills_from_full_old_image():
    dec = PgOutputDecoder()
    payloads = _tx(
        msg_update(
            4001,
            new=["c1", "0", "user", ("u",), None, None, None],
            old=["c1", "0", "user", "big-toasted-text", None, None, None],
            old_marker=b"O",  # REPLICA IDENTITY FULL
        ),
        lsn=4000,
    )
    rows = changes_from_pgoutput(dec, payloads)
    assert json.loads(rows[0]["after_json"])["text"] == "big-toasted-text"


def test_unchanged_toast_in_full_old_image_raises_not_leaks():
    """A full ('O') old image can itself mark the slot unchanged-TOAST;
    the backfill must then raise the instructive error, not let the
    sentinel leak into columnvalues and crash json.dumps downstream."""
    dec = PgOutputDecoder()
    with pytest.raises(ValueError, match="REPLICA IDENTITY FULL"):
        changes_from_pgoutput(
            dec,
            _tx(
                msg_update(
                    4001,
                    new=["c1", "0", "user", ("u",), None, None, None],
                    old=["c1", "0", "user", ("u",), None, None, None],
                    old_marker=b"O",
                ),
            ),
        )


def test_unchanged_toast_without_full_image_raises():
    dec = PgOutputDecoder()
    with pytest.raises(ValueError, match="REPLICA IDENTITY FULL"):
        changes_from_pgoutput(
            dec,
            _tx(
                msg_update(
                    4001,
                    new=["c1", "0", "user", ("u",), None, None, None],
                    old=["c1", "0", None, None, None, None, None],
                ),
            ),
        )


def test_multi_tx_stream_and_truncate_skipped():
    dec = PgOutputDecoder()
    p1 = _tx(msg_insert(4001, ["a", "0", "u", "x", None, None, None]), lsn=10, xid=1)
    p2 = [
        msg_begin(20, TS_US, 2),
        msg_truncate([4001]),
        msg_insert(4001, ["b", "0", "u", "y", None, None, None]),
        msg_commit(20, 28, TS_US),
    ]
    rows = changes_from_pgoutput(dec, [*p1, *p2])
    # truncate surfaces in the envelope but yields no row-change rows
    assert [(r["lsn"], r["conv_id"], r["txn_id"]) for r in rows] == [
        (10, "a", 1), (20, "b", 2),
    ]


def test_relation_resend_mid_stream_schema_evolution():
    """A new column appearing mid-stream (ST7) arrives as a Relation re-send."""
    dec = PgOutputDecoder()
    rel_v2 = msg_relation(
        4001, "public", "transcripts",
        [("conv_id", 25, True), ("turn_idx", 23, True), ("text", 25, False),
         ("tool", 25, False)],
    )
    payloads = [
        *_tx(msg_insert(4001, ["c", "0", "u", "t", None, None, None]), lsn=1),
        msg_begin(2, TS_US, 9),
        rel_v2,
        msg_insert(4001, ["c", "1", "hi", "search"]),
        msg_commit(2, 9, TS_US),
    ]
    rows = changes_from_pgoutput(dec, payloads)
    assert json.loads(rows[1]["after_json"]) == {"text": "hi", "tool": "search"}


def test_protocol_errors():
    dec = PgOutputDecoder()
    with pytest.raises(ValueError, match="unknown relation"):
        dec.decode(msg_begin(1, TS_US, 1)) or dec.decode(
            msg_insert(999, ["x"])
        )
    dec2 = PgOutputDecoder()
    with pytest.raises(ValueError, match="without Begin"):
        dec2.decode(msg_commit(1, 2, TS_US))
    dec3 = PgOutputDecoder()
    dec3.decode(REL)
    with pytest.raises(ValueError, match="outside Begin/Commit"):
        dec3.decode(msg_insert(4001, ["c", "0", None, None, None, None, None]))


def test_ignored_messages_and_binary_values():
    dec = PgOutputDecoder()
    assert dec.decode(b"O" + struct.pack(">q", 5) + b"origin\x00") is None
    assert dec.decode(b"Y" + struct.pack(">i", 600) + b"ns\x00nm\x00") is None
    assert dec.decode(b"Mrest-ignored") is None


def test_feed_end_to_end_durable_chunks(tmp_path):
    feed = PgOutputFeed(str(tmp_path / "wal"))
    for payload in _tx(
        msg_insert(4001, ["c1", "0", "user", "hello", None, "1.5", "t"]),
        msg_insert(4001, ["c1", "1", "asst", "world", None, None, "f"]),
        lsn=500,
    ):
        feed.on_xlog_data(400, payload)
    assert feed.writer.pending_rows == 2
    assert feed.writer.ackable_lsn() is None  # nothing durable yet
    path = feed.writer.flush()
    assert feed.writer.ackable_lsn() == 500  # commit LSN, not frame LSN
    t = pq.read_table(path)
    assert t.column("lsn").to_pylist() == [500, 500]
    assert t.column("txn_seq").to_pylist() == [0, 1]
    assert t.column("conv_id").to_pylist() == ["c1", "c1"]
    # restart resumes from the durable max LSN
    feed2 = PgOutputFeed(str(tmp_path / "wal"))
    assert feed2.writer.resume_lsn() == 500
    assert os.path.basename(path) == "chunk-000000.parquet"


def test_pgoutput_rows_match_wal2json_rows():
    """Both wire formats must flatten to identical CHANGE_SCHEMA rows."""
    from gear5_spark.sources.wal_adapter import changes_from_wal2json

    dec = PgOutputDecoder()
    pg_rows = changes_from_pgoutput(
        dec,
        _tx(
            msg_insert(4001, ["c9", "3", "user", "hi", '{"a": 1}', "2.5", "t"]),
            msg_delete(4001, ["c9", "2", None, None, None, None, None]),
            lsn=7000,
            xid=42,
        ),
    )
    wal_rows = changes_from_wal2json(
        7000,
        {
            "xid": 42,
            "timestamp": TS_US // 1000 + PG_EPOCH_MS,
            "change": [
                {
                    "kind": "insert",
                    "schema": "public",
                    "table": "transcripts",
                    "columnnames": ["conv_id", "turn_idx", "role", "text",
                                    "meta", "score", "flag"],
                    "columnvalues": ["c9", 3, "user", "hi", {"a": 1}, 2.5, True],
                },
                {
                    "kind": "delete",
                    "schema": "public",
                    "table": "transcripts",
                    "oldkeys": {"keynames": ["conv_id", "turn_idx"],
                                "keyvalues": ["c9", 2]},
                },
            ],
        },
    )
    assert pg_rows == wal_rows


# ------------------------------------------------- property: wire parity


def test_property_any_sequence_matches_wal2json_path():
    """ANY valid CDC sequence (inserts / updates / key-changing moves /
    deletes, grouped into transactions) encoded as pgoutput binary
    messages decodes to row-for-row the SAME CHANGE_SCHEMA rows as the
    equivalent wal2json envelopes — both wire formats are one feed."""
    from datetime import datetime, timezone

    from hypothesis import given, settings
    from tests.test_wal_property import _change, _envelope, wal_sequences

    from gear5_spark.sources.wal_adapter import changes_from_wal2json

    epoch_ms = int(
        datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp() * 1000
    )
    ts_us = (epoch_ms - PG_EPOCH_MS) * 1000
    rel = msg_relation(
        7001,
        "public",
        "transcripts",
        [("conv_id", 25, True), ("turn_idx", 23, True),
         ("role", 25, False), ("text", 25, False)],
    )

    def _encode(ch):
        if ch["kind"] == "delete":
            ok = ch["oldkeys"]
            return msg_delete(7001, [str(ok["keyvalues"][0]),
                                     str(ok["keyvalues"][1]), None, None])
        vals = [str(v) if v is not None else None
                for v in ch["columnvalues"]]
        if ch["kind"] == "insert":
            return msg_insert(7001, vals)
        ok = ch["oldkeys"]
        return msg_update(7001, new=vals,
                          old=[str(ok["keyvalues"][0]),
                               str(ok["keyvalues"][1]), None, None])

    @settings(max_examples=25, deadline=None)
    @given(events=wal_sequences())
    def run(events):
        dec = PgOutputDecoder()
        payloads = [rel]
        wal_rows = []
        lsn = 500
        for start in range(0, len(events), 3):
            chunk = events[start : start + 3]
            changes = [_change(op, k, k2, f"t{start + i}")
                       for i, (op, k, k2) in enumerate(chunk)]
            env = _envelope(lsn, changes)
            env["timestamp"] = epoch_ms
            wal_rows.extend(changes_from_wal2json(lsn, env))
            payloads.append(msg_begin(lsn, ts_us, lsn))
            payloads.extend(_encode(c) for c in changes)
            payloads.append(msg_commit(lsn, lsn + 8, ts_us))
            lsn += 1
        assert changes_from_pgoutput(dec, payloads) == wal_rows

    run()
