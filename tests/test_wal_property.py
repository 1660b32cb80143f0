"""Property-based WAL-adapter fold (hypothesis): ANY valid sequence of
wal2json envelopes — inserts, in-place updates, KEY-CHANGING updates,
deletes, grouped into multi-change transactions across multiple flushed
chunks — applies through the adapter + replay to the same state as a
serial dict oracle. Exercises the delete(oldkeys)+upsert flattening for
key-changing updates under randomized interleavings."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gear5_spark.pipeline.runner import bootstrap_table, replay_batch
from gear5_spark.sources.wal_adapter import WalFeedWriter

KEYS = [(f"c{i}", t) for i in range(4) for t in range(3)]


@st.composite
def wal_sequences(draw):
    """(op, key_idx, new_key_idx|None) with CDC validity: update/delete/
    move-source only touch live keys; a move target is a DEAD key (a
    primary-key update onto a live key would violate the PK in
    Postgres)."""
    n = draw(st.integers(min_value=1, max_value=40))
    live: set[int] = set()
    events = []
    for _ in range(n):
        choices = ["insert"]
        if live:
            choices += ["update", "delete"]
            if len(live) < len(KEYS):
                choices.append("move")
        op = draw(st.sampled_from(choices))
        dead = sorted(set(range(len(KEYS))) - live)
        if op == "insert":
            if not dead:
                op = "update"
                k, k2 = draw(st.sampled_from(sorted(live))), None
            else:
                k, k2 = draw(st.sampled_from(dead)), None
                live.add(k)
        elif op == "move":
            k = draw(st.sampled_from(sorted(live)))
            k2 = draw(st.sampled_from(dead))
            live.remove(k)
            live.add(k2)
        else:
            k, k2 = draw(st.sampled_from(sorted(live))), None
            if op == "delete":
                live.remove(k)
        events.append((op, k, k2))
    return events


def _envelope(xid, changes):
    return {
        "xid": xid,
        "timestamp": "2026-01-01 00:00:00+00",
        "change": changes,
    }


def _change(op, k, k2, text):
    conv, turn = KEYS[k]
    if op == "delete":
        return {
            "kind": "delete",
            "oldkeys": {
                "keynames": ["conv_id", "turn_idx"],
                "keyvalues": [conv, turn],
            },
        }
    if op == "move":
        nconv, nturn = KEYS[k2]
        return {
            "kind": "update",
            "columnnames": ["conv_id", "turn_idx", "role", "text"],
            "columnvalues": [nconv, nturn, "user", text],
            "oldkeys": {
                "keynames": ["conv_id", "turn_idx"],
                "keyvalues": [conv, turn],
            },
        }
    return {
        "kind": "insert" if op == "insert" else "update",
        "columnnames": ["conv_id", "turn_idx", "role", "text"],
        "columnvalues": [conv, turn, "user", text],
        **(
            {}
            if op == "insert"
            else {
                "oldkeys": {
                    "keynames": ["conv_id", "turn_idx"],
                    "keyvalues": [conv, turn],
                }
            }
        ),
    }


def _oracle(events):
    state = {}
    for j, (op, k, k2) in enumerate(events):
        if op == "delete":
            state.pop(KEYS[k], None)
        elif op == "move":
            state.pop(KEYS[k], None)
            state[KEYS[k2]] = f"t{j}"
        else:
            state[KEYS[k]] = f"t{j}"
    return state


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=wal_sequences(), tx_size=st.integers(min_value=1, max_value=3))
def test_any_wal_sequence_folds_to_oracle(
    spark, tmp_path_factory, events, tx_size
):
    base = tmp_path_factory.mktemp("walprop")
    log = str(base / "wal")
    w = WalFeedWriter(log)
    lsn = 100
    for start in range(0, len(events), tx_size):
        chunk = events[start : start + tx_size]
        changes = [
            _change(op, k, k2, f"t{start + i}")
            for i, (op, k, k2) in enumerate(chunk)
        ]
        w.on_message(lsn, _envelope(lsn, changes))
        lsn += 1
        if lsn % 3 == 0:  # multiple chunks per run
            w.flush()
    w.flush()

    table = bootstrap_table(spark, str(base / "t"), n_buckets=4)
    replay_batch(spark, log, table, str(base / "c"))
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read().select("conv_id", "turn_idx", "text").collect()
    }
    assert got == _oracle(events)
