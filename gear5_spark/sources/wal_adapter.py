"""Live-CDC adapter contract: Postgres logical replication -> change feed.

This module is the documented, schema-validated bridge between a REAL
``START_REPLICATION`` wire loop and this engine's change-log feed
(``sources.changelog.CHANGE_SCHEMA``). The sandbox has no database, so
the socket loop itself is out of scope — what ships here is everything a
psycopg2/pglogrepl binding must plug into, runnable and tested against
wal2json-shaped messages.

Wire-loop mapping (reference ``pkg/waljs/waljs.go:126-259``):

====================================================  =======================
reference (Go, pglogrepl)                             this engine
====================================================  =======================
``StartReplication(slot, lsnrestart)`` (:126-130)     binding owns the socket;
                                                      resume LSN is
                                                      ``WalFeedWriter.resume_lsn()``
                                                      (max LSN already durable
                                                      in the chunk directory)
``XLogData`` -> ``changeFilter.FilterChange``         ``WalFeedWriter.on_message(
(:220-237): wal2json payload -> per-change callback   lsn, wal2json_dict)`` —
                                                      flattens each tx change
                                                      array into CHANGE_SCHEMA
                                                      rows (txn_seq = index)
``PrimaryKeepaliveMessage`` (:211-218): reply moves   no-op for the feed; the
the standby deadline, no data                         binding just keeps the
                                                      socket alive
``AcknowledgeLSN`` -> ``SendStandbyStatusUpdate``     ``flush()`` then ACK
(:149-169): confirms ``confirmed_flush_lsn``; WAL     ``ackable_lsn()`` — only
before it may be recycled by the server               LSNs whose chunk file is
                                                      ATOMICALLY VISIBLE
                                                      (write-temp + rename)
                                                      may be acknowledged;
                                                      acking further would let
                                                      the server recycle WAL
                                                      the feed never persisted
====================================================  =======================

Two-level durability, deliberately split: the reference acks after its
writer consumed the message in-process (``waljs.go:253-257`` acks the
cached LSN on exit) because its sink IS the pipeline. Here the chunk
directory is a durable replay buffer between the wire and Spark, so the
ACK protects *producer* durability (chunk visible on storage) while the
Structured Streaming checkpoint protects *consumer* progress
independently (``stream_changelog``'s file-source offsets play
``confirmed_flush_lsn`` for the pipeline — see ``sources/changelog.py``).
A crash between rename and ACK re-delivers the tail; the feed is
append-only and LSN-keyed, and the applier's (lsn, txn_seq) dedup makes
re-delivery harmless — the same at-least-once-wire / exactly-once-sink
contract as the reference.

A real binding is then just::

    writer = WalFeedWriter(changelog_dir)
    stream = conn.start_replication(slot, start_lsn=writer.resume_lsn())
    for msg in stream:                       # psycopg2 ReplicationCursor
        writer.on_message(msg.data_start, json.loads(msg.payload))
        if writer.pending_rows >= batch_rows:
            writer.flush()
            stream.send_feedback(flush_lsn=writer.ackable_lsn())

wal2json must run with ``include-xids`` and ``include-timestamp`` (the
reference's plugin args pin the same, ``waljs.go`` pluginArguments);
``format-version 1`` tx envelopes are assumed (``pkg/waljs/types.go:49-65``).
"""

from __future__ import annotations

import json
import os
from typing import Any

from gear5_spark.sources.changelog import CHANGE_SCHEMA

# wal2json "kind" -> feed op (FIXTURES.md §2)
_KIND_TO_OP = {"insert": "insert", "update": "update", "delete": "delete"}

#: columns a binding MUST produce per change row — the arrow/parquet
#: schema is derived from (and validated against) CHANGE_SCHEMA
FEED_COLUMNS = tuple(f.name for f in CHANGE_SCHEMA.fields)


def changes_from_wal2json(
    lsn: int, message: dict[str, Any], *, key_columns=("conv_id", "turn_idx")
) -> list[dict[str, Any]]:
    """Flatten one wal2json transaction envelope into CHANGE_SCHEMA rows.

    ``message`` is the decoded payload of one ``XLogData`` frame
    (``pkg/waljs/types.go:49-65``): ``{"xid": ..., "timestamp": ...,
    "change": [{kind, schema, table, columnnames, columnvalues,
    oldkeys}, ...]}``. Every change in the envelope shares the frame's
    LSN; ``txn_seq`` is the change's index within it — exactly the
    (lsn, txn_seq) total order the applier's dedup and the merge
    order-guard rely on (lake/merge.py).

    Deletes carry only ``oldkeys`` (wal2json sends no new-row image), so
    ``after_json`` is NULL and the key comes from ``oldkeys`` — matching
    the reference's delete handling where ``Data`` holds old keys for
    delete kinds.

    Key-changing updates (``UPDATE ... SET turn_idx = ...``) flatten to
    TWO feed rows — a delete of the ``oldkeys`` identity followed by the
    upsert of the new one — because the feed's merge is keyed on
    (conv_id, turn_idx): a single upsert under the new key would leave
    the old row live forever. ``txn_seq`` is therefore the index of the
    EMITTED row within the envelope (identical to the change index when
    no change fans out), keeping (lsn, txn_seq) a dense total order the
    applier's dedup and the merge order-guard rely on.
    """
    ts_ms = _parse_wal_ts(message.get("timestamp"))
    txn_id = int(message.get("xid") or 0)
    conv_key, turn_key = key_columns
    rows: list[dict[str, Any]] = []

    def _emit(op: str, conv: Any, turn: Any, after: str | None) -> None:
        rows.append(
            {
                "lsn": int(lsn),
                "txn_id": txn_id,
                "txn_seq": len(rows),
                "op": op,
                "ts_ms": ts_ms,
                "conv_id": str(conv),
                "turn_idx": int(turn),
                "after_json": after,
            }
        )

    for ch in message.get("change") or []:
        kind = _KIND_TO_OP.get(ch.get("kind", ""))
        if kind is None:  # truncate/message kinds: not row changes
            continue
        if kind == "delete":
            ok = ch.get("oldkeys") or {}
            data = dict(
                zip(ok.get("keynames") or [], ok.get("keyvalues") or [])
            )
            after = None
        else:
            data = dict(
                zip(ch.get("columnnames") or [], ch.get("columnvalues") or [])
            )
            after = json.dumps(
                {k: v for k, v in data.items() if k not in key_columns},
                ensure_ascii=False,
                sort_keys=True,
            )
        if data.get(conv_key) is None or data.get(turn_key) is None:
            raise ValueError(
                f"change without replica-identity key {key_columns}: "
                f"{ch.get('kind')} on {ch.get('table')} — the slot's table "
                "needs REPLICA IDENTITY including the key columns"
            )
        if kind == "update":
            ok = ch.get("oldkeys") or {}
            old = dict(
                zip(ok.get("keynames") or [], ok.get("keyvalues") or [])
            )
            if (
                old.get(conv_key) is not None
                and old.get(turn_key) is not None
                and (
                    str(old[conv_key]) != str(data[conv_key])
                    or int(old[turn_key]) != int(data[turn_key])
                )
            ):
                # replica-identity key changed: retract the old row
                # first (same lsn, lower txn_seq -> merge applies it
                # before the upsert)
                _emit("delete", old[conv_key], old[turn_key], None)
        _emit(kind, data[conv_key], data[turn_key], after)
    return rows


def _parse_wal_ts(ts: Any) -> int:
    """wal2json timestamp ('2026-01-01 12:00:00.123456+00') -> epoch ms.

    Timezone-required: logical replication emits session-TZ stamps; the
    binding should SET timezone TO 'UTC' on the replication connection
    (absent offset is rejected rather than silently local)."""
    if ts is None:
        return 0
    if isinstance(ts, (int, float)):
        return int(ts)
    from datetime import datetime

    s = str(ts).replace(" ", "T", 1)
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        raise ValueError(
            f"wal2json timestamp without offset: {ts!r} — run the "
            "replication session with timezone=UTC"
        )
    return int(dt.timestamp() * 1000)


class WalFeedWriter:
    """Durable chunk writer a replication binding feeds row batches into.

    Chunks land as ``chunk-NNNNNN.parquet`` (the exact layout
    ``read_changelog``/``stream_changelog`` tail) via write-temp +
    ``os.replace`` so a reader (or the streaming file source) never
    observes a partial file — the atomic-visibility contract the ACK
    mapping in the module docstring depends on. Single-writer by design:
    one replication slot has one consumer (the reference holds one
    socket per slot for the same reason)."""

    def __init__(self, changelog_dir: str, key_columns=("conv_id", "turn_idx")):
        self.dir = changelog_dir
        self.key_columns = key_columns
        os.makedirs(changelog_dir, exist_ok=True)
        self._pending: list[dict[str, Any]] = []
        self._ackable: int | None = self.resume_lsn()
        self._next_idx = self._scan_next_idx()

    # -- wire-loop entry points -------------------------------------
    def on_message(self, lsn: int, message: dict[str, Any]) -> int:
        """One ``XLogData`` frame. Returns rows buffered (not yet durable)."""
        self._pending.extend(
            changes_from_wal2json(lsn, message, key_columns=self.key_columns)
        )
        return len(self._pending)

    @property
    def pending_rows(self) -> int:
        return len(self._pending)

    def flush(self) -> str | None:
        """Write buffered rows as one atomically-visible chunk; advances
        ``ackable_lsn`` to the batch max. No-op when nothing is pending."""
        if not self._pending:
            return None
        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = {
            name: [r[name] for r in self._pending] for name in FEED_COLUMNS
        }
        # nullability written into the parquet footer (required vs
        # optional) so a Spark read reconstructs CHANGE_SCHEMA exactly
        schema = pa.schema(
            [
                pa.field("lsn", pa.int64(), nullable=False),
                pa.field("txn_id", pa.int64(), nullable=False),
                pa.field("txn_seq", pa.int32(), nullable=False),
                pa.field("op", pa.string(), nullable=False),
                pa.field("ts_ms", pa.int64(), nullable=False),
                pa.field("conv_id", pa.string(), nullable=False),
                pa.field("turn_idx", pa.int32(), nullable=False),
                pa.field("after_json", pa.string(), nullable=True),
            ]
        )
        table = pa.table(
            {name: pa.array(cols[name], schema.field(name).type)
             for name in FEED_COLUMNS},
            schema=schema,
        )
        final = os.path.join(self.dir, f"chunk-{self._next_idx:06d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # atomic visibility
        self._next_idx += 1
        batch_max = max(cols["lsn"])
        self._ackable = (
            batch_max if self._ackable is None else max(self._ackable, batch_max)
        )
        self._pending.clear()
        return final

    def ackable_lsn(self) -> int | None:
        """Highest LSN safe to ``SendStandbyStatusUpdate`` (None = none
        durable yet). Never includes buffered-only rows."""
        return self._ackable

    def resume_lsn(self) -> int | None:
        """Max LSN already durable in the chunk directory — the
        ``START_REPLICATION`` start position after a restart (the slot
        re-delivers anything newer; re-delivery of the boundary is
        deduped downstream)."""
        import pyarrow.parquet as pq

        best: int | None = None
        for name in os.listdir(self.dir) if os.path.isdir(self.dir) else []:
            if not (name.startswith("chunk-") and name.endswith(".parquet")):
                continue
            meta = pq.read_metadata(os.path.join(self.dir, name))
            idx = [
                i
                for i in range(meta.num_columns)
                if meta.schema.column(i).name == "lsn"
            ]
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx[0]).statistics
                if st is not None and st.has_min_max:
                    best = max(best or 0, int(st.max))
        return best

    def _scan_next_idx(self) -> int:
        idxs = [
            int(n[len("chunk-") : -len(".parquet")])
            for n in os.listdir(self.dir)
            if n.startswith("chunk-") and n.endswith(".parquet")
        ]
        return (max(idxs) + 1) if idxs else 0
