"""Live replication socket client vs a local fake walsender.

The fake server speaks the real PostgreSQL v3 wire protocol (startup,
auth, IDENTIFY_SYSTEM, START_REPLICATION → CopyBoth with XLogData /
keepalive frames) over a loopback socket — the same live-binding test
pattern ``test_rest`` uses for HTTP. pgoutput payloads are synthesized
with the byte-exact encoder from ``test_pgoutput``.
"""

from __future__ import annotations

import socket
import struct
import threading

import pyarrow.parquet as pq
import pytest

from gear5_spark.sources.pg_replication import (
    ReplicationClient,
    ReplicationError,
    lsn_str,
    parse_lsn,
)
from gear5_spark.sources.pgoutput import PgOutputFeed
from tests.test_pgoutput import (
    REL,
    TS_US,
    msg_begin,
    msg_commit,
    msg_insert,
)


def _m(tag: bytes, body: bytes = b"") -> bytes:
    return tag + struct.pack(">i", len(body) + 4) + body


def _xlogdata(wal_start: int, payload: bytes) -> bytes:
    return _m(
        b"d",
        b"w" + struct.pack(">qqq", wal_start, wal_start + 1, 0) + payload,
    )


def _keepalive(wal_end: int, reply: int) -> bytes:
    return _m(b"d", b"k" + struct.pack(">qqb", wal_end, 0, reply))


class FakeWalSender(threading.Thread):
    """One-connection walsender: scripted XLogData frames, records every
    standby-status update the client sends."""

    def __init__(self, frames, require_password=None, split_writes=False):
        super().__init__(daemon=True)
        self.frames = frames  # [(wal_start, pgoutput payload bytes)]
        self.require_password = require_password
        self.split_writes = split_writes  # stress the client's reframing
        self.statuses: list[int] = []  # flushed LSNs from 'r' updates
        self.startup_params: dict[str, str] = {}
        self.queries: list[str] = []
        self.errors: list[str] = []
        self._lsock = socket.create_server(("127.0.0.1", 0))
        self.port = self._lsock.getsockname()[1]

    # -- helpers -----------------------------------------------------
    def _recv_exact(self, c, n):
        buf = b""
        while len(buf) < n:
            chunk = c.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("client closed")
            buf += chunk
        return buf

    def _recv_startup(self, c):
        (ln,) = struct.unpack(">i", self._recv_exact(c, 4))
        body = self._recv_exact(c, ln - 4)
        assert struct.unpack_from(">i", body, 0)[0] == 196608
        parts = body[4:].split(b"\x00")
        it = iter(parts)
        for k in it:
            if not k:
                break
            self.startup_params[k.decode()] = next(it).decode()

    def _recv_msg(self, c):
        hdr = self._recv_exact(c, 5)
        (ln,) = struct.unpack(">i", hdr[1:])
        return hdr[:1], self._recv_exact(c, ln - 4)

    def _send(self, c, data: bytes):
        if self.split_writes:
            # deliberately fragment across the message boundary so the
            # client's buffer-atomic reframing is actually exercised
            mid = max(1, len(data) // 2)
            c.sendall(data[:mid])
            c.sendall(data[mid:])
        else:
            c.sendall(data)

    # -- the scripted session ---------------------------------------
    def run(self):
        try:
            c, _ = self._lsock.accept()
            with c:
                self._session(c)
        except Exception as e:  # surface in the test thread
            self.errors.append(repr(e))
        finally:
            self._lsock.close()

    def _session(self, c):
        self._recv_startup(c)
        if self.require_password is not None:
            self._send(c, _m(b"R", struct.pack(">i", 3)))
            tag, body = self._recv_msg(c)
            assert tag == b"p"
            assert body.rstrip(b"\x00").decode() == self.require_password
        self._send(c, _m(b"R", struct.pack(">i", 0)))  # AuthenticationOk
        self._send(
            c, _m(b"S", b"server_version\x0016.1\x00")
        )  # ParameterStatus
        self._send(c, _m(b"Z", b"I"))  # ReadyForQuery
        while True:
            tag, body = self._recv_msg(c)
            if tag == b"X":  # Terminate
                return
            assert tag == b"Q"
            q = body.rstrip(b"\x00").decode()
            self.queries.append(q)
            if q == "IDENTIFY_SYSTEM":
                self._send_identify(c)
                continue
            assert q.startswith("START_REPLICATION")
            break
        # CopyBothResponse: format 0, zero columns
        self._send(c, _m(b"W", struct.pack(">bh", 0, 0)))
        for wal_start, payload in self.frames:
            self._send(c, _xlogdata(wal_start, payload))
        # reply-requested keepalive -> client must send a status update
        self._send(c, _keepalive(self.frames[-1][0] + 1, 1))
        tag, body = self._recv_msg(c)
        assert tag == b"d" and body[:1] == b"r"
        self.statuses.append(struct.unpack_from(">q", body, 9)[0])
        # end the stream cleanly, then drain the client's final status
        self._send(c, _m(b"c"))  # CopyDone
        self._send(c, _m(b"C", b"COPY 0\x00"))
        self._send(c, _m(b"Z", b"I"))
        c.settimeout(2.0)
        try:
            while True:
                tag, body = self._recv_msg(c)
                if tag == b"d" and body[:1] == b"r":
                    self.statuses.append(
                        struct.unpack_from(">q", body, 9)[0]
                    )
                elif tag == b"X":
                    return
        except (ConnectionError, socket.timeout):
            pass

    def _send_identify(self, c):
        def field(name):
            return name + b"\x00" + struct.pack(">ihihih", 0, 0, 25, -1, -1, 0)

        self._send(
            c,
            _m(b"T", struct.pack(">h", 4) + field(b"systemid")
               + field(b"timeline") + field(b"xlogpos") + field(b"dbname")),
        )
        vals = [b"7001", b"1", b"0/500", b"app"]
        row = struct.pack(">h", 4)
        for v in vals:
            row += struct.pack(">i", len(v)) + v
        self._send(c, _m(b"D", row))
        self._send(c, _m(b"C", b"IDENTIFY_SYSTEM\x00"))
        self._send(c, _m(b"Z", b"I"))


def _tx_frames(lsn: int, n_rows: int, xid: int = 9):
    """One committed transaction as (wal_start, payload) XLogData frames."""
    frames = [(lsn, msg_begin(lsn, TS_US, xid)), (lsn, REL)]
    for i in range(n_rows):
        frames.append(
            (lsn + i, msg_insert(
                4001, [f"c{xid}", str(i), "user", f"t{i}", None, None, None]
            ))
        )
    frames.append((lsn + n_rows, msg_commit(lsn, lsn + n_rows, TS_US)))
    return frames


def test_lsn_text_roundtrip():
    assert lsn_str(0x1_0000_002A) == "1/2A"
    assert parse_lsn("1/2A") == 0x1_0000_002A
    assert parse_lsn(lsn_str(2**40 + 17)) == 2**40 + 17


def test_live_tail_end_to_end(tmp_path):
    """Full loop: handshake → START_REPLICATION → decode → durable
    chunks → ACK of the durable commit LSN; server writes fragmented
    across message boundaries to exercise reframing."""
    frames = _tx_frames(1000, 3, xid=1) + _tx_frames(2000, 2, xid=2)
    srv = FakeWalSender(frames, split_writes=True)
    srv.start()
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="rep", dbname="app", timeout=5.0
    )
    client.connect()
    ident = client.identify_system()
    assert ident["systemid"] == "7001"
    assert ident["xlogpos"] == parse_lsn("0/500")
    feed = PgOutputFeed(str(tmp_path / "wal"))
    client.run(feed, slot="g5", publication="g5pub", batch_rows=3)
    client.close()
    srv.join(timeout=5)
    assert not srv.errors, srv.errors
    # session walsender-mode + replication commands
    assert srv.startup_params["replication"] == "database"
    assert srv.startup_params["user"] == "rep"
    start = [q for q in srv.queries if q.startswith("START_REPLICATION")]
    assert start == [
        "START_REPLICATION SLOT \"g5\" LOGICAL 0/0 "
        "(\"proto_version\" '1', \"publication_names\" 'g5pub')"
    ]
    # both transactions durable, stamped with their commit LSNs
    files = sorted((tmp_path / "wal").glob("chunk-*.parquet"))
    assert len(files) == 2  # flush at 3 buffered rows, final drain of 2
    rows = []
    for f in files:
        rows += pq.read_table(f).to_pylist()
    assert [(r["lsn"], r["conv_id"], r["turn_idx"]) for r in rows] == [
        (1000, "c1", 0), (1000, "c1", 1), (1000, "c1", 2),
        (2000, "c2", 0), (2000, "c2", 1),
    ]
    # ACKs only ever report DURABLE positions (+1 next-byte convention):
    # the keepalive-forced status carries the first flush (1000+1), the
    # final drain acks 2000+1; nothing beyond the durable max
    assert srv.statuses[0] == 1001
    assert srv.statuses[-1] == 2001


def test_resume_from_durable_chunks(tmp_path):
    """A restarted client resumes START_REPLICATION at the feed's
    durable max LSN, exactly like the reference resumes from
    confirmed_flush_lsn."""
    frames = _tx_frames(500, 2)
    srv = FakeWalSender(frames)
    srv.start()
    client = ReplicationClient("127.0.0.1", srv.port, user="r", dbname="d")
    client.connect()
    feed = PgOutputFeed(str(tmp_path / "wal"))
    client.run(feed, slot="s", publication="p")
    client.close()
    srv.join(timeout=5)
    assert not srv.errors, srv.errors

    srv2 = FakeWalSender(_tx_frames(800, 1))
    srv2.start()
    client2 = ReplicationClient("127.0.0.1", srv2.port, user="r", dbname="d")
    client2.connect()
    feed2 = PgOutputFeed(str(tmp_path / "wal"))
    client2.run(feed2, slot="s", publication="p")
    client2.close()
    srv2.join(timeout=5)
    assert not srv2.errors, srv2.errors
    start = [q for q in srv2.queries if q.startswith("START_REPLICATION")][0]
    assert f"LOGICAL {lsn_str(500)} " in start  # resumed, not 0/0


def test_cleartext_password_auth(tmp_path):
    frames = _tx_frames(100, 1)
    srv = FakeWalSender(frames, require_password="sekrit")
    srv.start()
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="r", dbname="d", password="sekrit"
    )
    client.connect()
    feed = PgOutputFeed(str(tmp_path / "wal"))
    client.run(feed, slot="s", publication="p")
    client.close()
    srv.join(timeout=5)
    assert not srv.errors, srv.errors
    assert (tmp_path / "wal" / "chunk-000000.parquet").exists()


def test_password_required_but_missing():
    srv = FakeWalSender(_tx_frames(100, 1), require_password="x")
    srv.start()
    client = ReplicationClient("127.0.0.1", srv.port, user="r", dbname="d")
    with pytest.raises(ReplicationError, match="password"):
        client.connect()
    client.close()


def test_server_error_surfaces():
    """An ErrorResponse to START_REPLICATION (e.g. unknown slot) raises
    with the server's message."""

    class ErrSender(FakeWalSender):
        def _session(self, c):
            self._recv_startup(c)
            self._send(c, _m(b"R", struct.pack(">i", 0)))
            self._send(c, _m(b"Z", b"I"))
            tag, body = self._recv_msg(c)
            self._send(
                c,
                _m(b"E", b"SERROR\x00Mreplication slot \"s\" does not "
                   b"exist\x00\x00"),
            )

    srv = ErrSender([])
    srv.start()
    client = ReplicationClient("127.0.0.1", srv.port, user="r", dbname="d")
    client.connect()
    with pytest.raises(ReplicationError, match="does not exist"):
        list(client.start_replication("s", 0, {"proto_version": "1"}))
    client.close()
