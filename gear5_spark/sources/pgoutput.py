"""Decoder for Postgres ``pgoutput`` logical replication (built-in plugin).

The wal2json adapter (``sources/wal_adapter.py``) mirrors the reference
wire loop (``pkg/waljs/waljs.go:126-259``), but wal2json is an extension
the server operator must install. Stock Postgres >= 10 always ships
``pgoutput`` — the binary protocol the server itself uses for logical
replication subscribers — so a binding that speaks pgoutput works
against ANY modern Postgres with zero server-side installs. This module
decodes that binary stream into the exact wal2json-shaped transaction
envelopes ``changes_from_wal2json`` already consumes, so both plugins
funnel into one tested path onto ``CHANGE_SCHEMA``.

Message formats follow the public PostgreSQL protocol documentation
("Logical Streaming Replication Protocol", protocol version 1):

==========  ===================================================
byte tag    layout (all ints big-endian, strings NUL-terminated)
==========  ===================================================
``B`` egin     Int64 final_lsn, Int64 commit_ts(us since 2000-01-01), Int32 xid
``C`` ommit    Int8 flags, Int64 commit_lsn, Int64 end_lsn, Int64 commit_ts
``O`` rigin    Int64 origin_lsn, String name (ignored)
``R`` elation  Int32 rel_id, String ns, String name, Int8 replident,
               Int16 ncols x (Int8 flags, String name, Int32 oid, Int32 typmod)
``Y`` (type)   Int32 oid, String ns, String name (ignored)
``I`` nsert    Int32 rel_id, 'N', TupleData
``U`` pdate    Int32 rel_id, optional 'K'|'O' + TupleData (old), 'N', TupleData
``D`` elete    Int32 rel_id, 'K'|'O', TupleData
``T`` runcate  Int32 nrels, Int8 options, Int32 rel_id x nrels
``M`` essage   (v14 logical messages) ignored
TupleData      Int16 ncols x (byte kind: 'n' null | 'u' unchanged TOAST |
               't' Int32 len + text bytes | 'b' Int32 len + binary bytes)
==========  ===================================================

Decoding is stateful exactly like a real subscriber: ``Relation``
messages register column metadata (re-sent by the server whenever the
schema changes mid-stream — this is how additive schema evolution
arrives over the wire, feeding the engine's discovery/widening path),
``Begin`` opens a transaction buffer, row messages append to it, and
``Commit`` seals the buffer into one envelope carrying the commit LSN —
the same per-transaction grouping wal2json format-version 1 produces
(``pkg/waljs/types.go:49-65``).

Unchanged-TOAST columns (``'u'``) carry NO value on the wire. Because
this engine's merge replaces the whole row image (after_json is a full
LWW payload, lake/merge.py), silently omitting such a column would
erase it on apply. The decoder therefore backfills from the old tuple
when the relation has REPLICA IDENTITY FULL (old image present), and
otherwise raises with instructions to ``ALTER TABLE ... REPLICA
IDENTITY FULL`` — loud beats lossy for a sink with replace semantics.

A live psycopg2 binding is the same loop as the wal2json one::

    feed = PgOutputFeed(changelog_dir)
    cur.start_replication(slot, start_lsn=feed.writer.resume_lsn() or 0,
                          options={"proto_version": "1",
                                   "publication_names": pub})
    for msg in cur:                       # ReplicationCursor
        feed.on_xlog_data(msg.data_start, msg.payload)
        if feed.writer.pending_rows >= batch_rows:
            feed.writer.flush()
            cur.send_feedback(flush_lsn=feed.writer.ackable_lsn())
"""

from __future__ import annotations

import json
import struct
from typing import Any

from gear5_spark.sources.wal_adapter import WalFeedWriter, changes_from_wal2json

#: microseconds in pgoutput timestamps count from 2000-01-01 UTC
PG_EPOCH_MS = 946_684_800_000

# type OIDs with a faithful JSON-native representation; everything else
# stays a string (same policy wal2json applies to its columnvalues)
_OID_BOOL = {16}
_OID_INT = {20, 21, 23, 26}  # int8, int2, int4, oid
_OID_FLOAT = {700, 701}  # float4, float8
_OID_NUMERIC = {1700}
_OID_JSON = {114, 3802}  # json, jsonb


class _Reader:
    """Cursor over one binary message (big-endian, NUL-terminated strings)."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def i16(self) -> int:
        (v,) = struct.unpack_from(">h", self.buf, self.pos)
        self.pos += 2
        return v

    def i32(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def cstring(self) -> str:
        end = self.buf.index(b"\x00", self.pos)
        s = self.buf[self.pos : end].decode("utf-8")
        self.pos = end + 1
        return s

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b


#: sentinel distinguishing "column absent on the wire" from SQL NULL
_UNCHANGED = object()


def _decode_tuple(r: _Reader) -> list[Any]:
    """TupleData -> per-column values (``_UNCHANGED`` for 'u' columns)."""
    ncols = r.i16()
    out: list[Any] = []
    for _ in range(ncols):
        kind = r.u8()
        if kind == ord("n"):
            out.append(None)
        elif kind == ord("u"):
            out.append(_UNCHANGED)
        elif kind == ord("t"):
            out.append(r.take(r.i32()).decode("utf-8"))
        elif kind == ord("b"):
            # binary-mode values (proto >= 2 with binary option): raw
            # bytes here; _convert renders them as wal2json's bytea hex
            # form so after_json stays JSON-serializable
            out.append(r.take(r.i32()))
        else:  # pragma: no cover - protocol violation
            raise ValueError(f"unknown TupleData kind {chr(kind)!r}")
    return out


def _convert(value: Any, oid: int) -> Any:
    """Text wire value -> JSON-native value by type OID (wal2json parity)."""
    if isinstance(value, bytes):
        # binary-mode values (proto >= 2 binary option): render as the
        # bytea hex form wal2json emits ('\\x...') so the value stays
        # JSON-serializable in after_json (raw bytes would crash
        # json.dumps downstream) and both wire formats agree
        return "\\x" + value.hex()
    if value is None or value is _UNCHANGED:
        return value
    if oid in _OID_BOOL:
        return value == "t"
    if oid in _OID_INT:
        return int(value)
    if oid in _OID_FLOAT:
        return float(value)
    if oid in _OID_NUMERIC:
        try:
            return int(value)
        except ValueError:
            try:
                return float(value)
            except ValueError:
                return value
    if oid in _OID_JSON:
        try:
            return json.loads(value)
        except (ValueError, TypeError):
            return value
    return value


class _Relation:
    __slots__ = ("namespace", "name", "replident", "columns", "key_flags")

    def __init__(self, namespace: str, name: str, replident: int, columns):
        self.namespace = namespace
        self.name = name
        self.replident = replident  # ord: 'd' default 'n' nothing 'f' full 'i' index
        self.columns = columns  # [(name, oid)]
        self.key_flags = []  # per-column: part of replica identity key?


class PgOutputDecoder:
    """Stateful pgoutput stream decoder.

    Feed every ``XLogData`` payload to :meth:`decode`; it returns a
    wal2json-shaped transaction envelope (plus ``"commit_lsn"``) when the
    message completes a transaction, else ``None``. Relation metadata and
    the open-transaction buffer persist across calls, mirroring a real
    subscriber's session state.
    """

    def __init__(self) -> None:
        self._relations: dict[int, _Relation] = {}
        self._tx: dict[str, Any] | None = None

    # -- public ------------------------------------------------------
    def decode(self, payload: bytes) -> dict[str, Any] | None:
        r = _Reader(payload)
        tag = r.u8()
        handler = self._HANDLERS.get(tag)
        if handler is None:
            raise ValueError(f"unknown pgoutput message tag {chr(tag)!r}")
        return handler(self, r)

    # -- message handlers --------------------------------------------
    def _msg_begin(self, r: _Reader) -> None:
        final_lsn, commit_ts, xid = r.i64(), r.i64(), r.i32()
        if self._tx is not None:
            raise ValueError("Begin inside an open transaction")
        self._tx = {
            "xid": xid,
            "timestamp": commit_ts // 1000 + PG_EPOCH_MS,  # epoch ms
            "change": [],
        }
        return None

    def _msg_commit(self, r: _Reader) -> dict[str, Any]:
        r.u8()  # flags (unused)
        commit_lsn = r.i64()
        r.i64()  # end_lsn
        r.i64()  # commit_ts (Begin already captured it)
        if self._tx is None:
            raise ValueError("Commit without Begin")
        env = self._tx
        self._tx = None
        env["commit_lsn"] = commit_lsn
        return env

    def _msg_relation(self, r: _Reader) -> None:
        rel_id = r.i32()
        namespace, name = r.cstring(), r.cstring()
        replident = r.u8()
        ncols = r.i16()
        cols, key_flags = [], []
        for _ in range(ncols):
            flags = r.u8()  # bit 1: part of the key
            cname = r.cstring()
            oid = r.i32()
            r.i32()  # typmod
            cols.append((cname, oid))
            key_flags.append(bool(flags & 1))
        rel = _Relation(namespace, name, replident, cols)
        rel.key_flags = key_flags
        self._relations[rel_id] = rel
        return None

    def _msg_insert(self, r: _Reader) -> None:
        rel = self._relation(r.i32())
        marker = r.u8()
        if marker != ord("N"):
            raise ValueError("Insert without new-tuple marker")
        values = _decode_tuple(r)
        self._append_change(rel, "insert", new=values, old=None)
        return None

    def _msg_update(self, r: _Reader) -> None:
        rel = self._relation(r.i32())
        marker = r.u8()
        old = None
        old_is_full = False
        if marker in (ord("K"), ord("O")):
            old = _decode_tuple(r)
            old_is_full = marker == ord("O")
            marker = r.u8()
        if marker != ord("N"):
            raise ValueError("Update without new-tuple marker")
        new = _decode_tuple(r)
        self._append_change(
            rel, "update", new=new, old=old, old_is_full=old_is_full
        )
        return None

    def _msg_delete(self, r: _Reader) -> None:
        rel = self._relation(r.i32())
        marker = r.u8()
        if marker not in (ord("K"), ord("O")):
            raise ValueError("Delete without key/old-tuple marker")
        old = _decode_tuple(r)
        # 'O' = REPLICA IDENTITY FULL old image: keep genuinely-NULL
        # non-key columns in oldkeys (wal2json parity) instead of
        # mistaking them for 'K'-tuple padding
        self._append_change(
            rel, "delete", new=None, old=old,
            old_is_full=marker == ord("O"),
        )
        return None

    def _msg_truncate(self, r: _Reader) -> None:
        nrels = r.i32()
        r.u8()  # options (CASCADE/RESTART IDENTITY)
        for _ in range(nrels):
            rel = self._relation(r.i32())
            # surfaced in the envelope with a kind changes_from_wal2json
            # deliberately skips (row-change feeds cannot express
            # truncation; parity with the wal2json path)
            self._tx_changes().append(
                {"kind": "truncate", "schema": rel.namespace, "table": rel.name}
            )
        return None

    def _msg_ignore(self, r: _Reader) -> None:
        return None

    _HANDLERS = {
        ord("B"): _msg_begin,
        ord("C"): _msg_commit,
        ord("R"): _msg_relation,
        ord("I"): _msg_insert,
        ord("U"): _msg_update,
        ord("D"): _msg_delete,
        ord("T"): _msg_truncate,
        ord("O"): _msg_ignore,  # Origin
        ord("Y"): _msg_ignore,  # Type
        ord("M"): _msg_ignore,  # logical Message (v14+)
    }

    # -- internals ----------------------------------------------------
    def _relation(self, rel_id: int) -> _Relation:
        rel = self._relations.get(rel_id)
        if rel is None:
            raise ValueError(
                f"row message for unknown relation {rel_id} — the server "
                "always sends Relation first; the binding must feed every "
                "XLogData payload in order"
            )
        return rel

    def _tx_changes(self) -> list[dict[str, Any]]:
        if self._tx is None:
            raise ValueError("row message outside Begin/Commit")
        return self._tx["change"]

    def _append_change(
        self,
        rel: _Relation,
        kind: str,
        *,
        new: list[Any] | None,
        old: list[Any] | None,
        old_is_full: bool = False,
    ) -> None:
        changes = self._tx_changes()
        change: dict[str, Any] = {
            "kind": kind,
            "schema": rel.namespace,
            "table": rel.name,
        }
        if new is not None:
            names, values = [], []
            for i, ((cname, oid), v) in enumerate(zip(rel.columns, new)):
                if v is _UNCHANGED:
                    if old_is_full and old is not None:
                        v = old[i]  # REPLICA IDENTITY FULL: old image has it
                    # the old image can itself carry the unchanged-TOAST
                    # sentinel for that slot ('u' in a full image) — if the
                    # backfill did not produce a real value, raise the same
                    # instructive error rather than letting the sentinel
                    # leak into columnvalues and crash json.dumps later
                    if v is _UNCHANGED:
                        raise ValueError(
                            f"unchanged-TOAST column {cname!r} on "
                            f"{rel.namespace}.{rel.name} without a full old "
                            "image — this sink replaces whole rows, so run "
                            "ALTER TABLE ... REPLICA IDENTITY FULL on TOASTy "
                            "tables (or the column's value would be lost)"
                        )
                names.append(cname)
                values.append(_convert(v, oid))
            change["columnnames"] = names
            change["columnvalues"] = values
        if old is not None:
            keynames, keyvalues = [], []
            for i, ((cname, oid), v) in enumerate(zip(rel.columns, old)):
                if v is _UNCHANGED or (
                    not old_is_full and not rel.key_flags[i] and v is None
                ):
                    # 'K' tuples carry only replica-identity columns;
                    # non-key slots arrive as NULL padding — drop them
                    continue
                keynames.append(cname)
                keyvalues.append(_convert(v, oid))
            change["oldkeys"] = {"keynames": keynames, "keyvalues": keyvalues}
        changes.append(change)


class PgOutputFeed:
    """pgoutput binding glue: decoder + durable chunk writer in one loop.

    ``on_xlog_data`` is the per-message entry point (see module docstring
    for the live psycopg2 loop). Envelopes are stamped with the COMMIT
    LSN — the position ``SendStandbyStatusUpdate`` acknowledges, matching
    the reference's ack of the consumed message LSN
    (``pkg/waljs/waljs.go:149-169``) — and flattened through the same
    ``changes_from_wal2json`` path as the wal2json plugin, so key-changing
    updates, delete key extraction, and dense (lsn, txn_seq) ordering
    behave identically across both wire formats.
    """

    def __init__(self, changelog_dir: str, key_columns=("conv_id", "turn_idx")):
        self.decoder = PgOutputDecoder()
        self.writer = WalFeedWriter(changelog_dir, key_columns=key_columns)

    def on_xlog_data(self, wal_start_lsn: int, payload: bytes) -> int:
        """Feed one frame; returns rows buffered (not yet durable)."""
        env = self.decoder.decode(payload)
        if env is not None:
            # explicit None check: a (legal) commit_lsn of 0 must not
            # silently fall back to the frame LSN
            lsn = env.pop("commit_lsn", None)
            if lsn is None:
                lsn = wal_start_lsn
            self.writer.on_message(lsn, env)
        return self.writer.pending_rows


def changes_from_pgoutput(
    decoder: PgOutputDecoder,
    payloads,
    *,
    key_columns=("conv_id", "turn_idx"),
) -> list[dict[str, Any]]:
    """Decode a sequence of pgoutput payloads straight to CHANGE_SCHEMA rows.

    Convenience for tests/backfills: every completed transaction is
    flattened via ``changes_from_wal2json`` at its commit LSN.
    """
    rows: list[dict[str, Any]] = []
    for payload in payloads:
        env = decoder.decode(payload)
        if env is not None:
            lsn = env.pop("commit_lsn")
            rows.extend(
                changes_from_wal2json(lsn, env, key_columns=key_columns)
            )
    return rows
