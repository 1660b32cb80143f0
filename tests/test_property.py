"""Property-based replay equivalence (hypothesis): ANY valid op sequence —
not just the seeded generator's distribution — folds to the same state via
the engine and the serial oracle, in both one-shot and split replays."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gen_fixtures import CHANGE_SCHEMA
from gear5_spark.pipeline.runner import bootstrap_table, replay_batch

KEYS = [(f"c{i}", t) for i in range(4) for t in range(3)]


@st.composite
def op_sequences(draw):
    """Sequences of (key_idx, op) where update/delete only touch live keys
    (CDC validity, like a real WAL)."""
    n = draw(st.integers(min_value=1, max_value=60))
    live: set[int] = set()
    events = []
    for _ in range(n):
        choices = ["insert"]
        if live:
            choices += ["update", "delete"]
        op = draw(st.sampled_from(choices))
        if op == "insert":
            dead = [i for i in range(len(KEYS)) if i not in live]
            if not dead:
                op = "update"
                k = draw(st.sampled_from(sorted(live)))
            else:
                k = draw(st.sampled_from(dead))
                live.add(k)
        else:
            k = draw(st.sampled_from(sorted(live)))
            if op == "delete":
                live.remove(k)
        events.append((k, op))
    return events


def _write_log(d: str, events) -> None:
    os.makedirs(d, exist_ok=True)
    rows = {k.name: [] for k in CHANGE_SCHEMA}
    for lsn, (ki, op) in enumerate(events):
        conv, turn = KEYS[ki]
        rows["lsn"].append(lsn)
        rows["txn_id"].append(lsn // 3)
        rows["txn_seq"].append(lsn % 3)
        rows["op"].append(op)
        rows["ts_ms"].append(1_700_000_000_000 + lsn)
        rows["conv_id"].append(conv)
        rows["turn_idx"].append(turn)
        rows["after_json"].append(
            None
            if op == "delete"
            else json.dumps(
                {"role": "user", "text": f"t{lsn}", "ts": 1_700_000_000 + lsn}
            )
        )
    pq.write_table(
        pa.table(
            {k: pa.array(v, type=CHANGE_SCHEMA.field(k).type) for k, v in rows.items()},
            schema=CHANGE_SCHEMA,
        ),
        os.path.join(d, "chunk-000000.parquet"),
    )


def _oracle(events):
    state = {}
    for lsn, (ki, op) in enumerate(events):
        key = KEYS[ki]
        if op == "delete":
            state.pop(key, None)
        else:
            state[key] = f"t{lsn}"
    return state


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=op_sequences(), split=st.integers(min_value=1, max_value=59))
def test_any_op_sequence_replays_to_oracle(spark, tmp_path_factory, events, split):
    base = tmp_path_factory.mktemp("prop")
    log = str(base / "log")
    _write_log(log, events)
    want = _oracle(events)

    # one-shot replay
    t1 = bootstrap_table(spark, str(base / "t1"), n_buckets=4)
    replay_batch(spark, log, t1, str(base / "c1"))
    got1 = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in t1.read().collect()
    }
    assert got1 == want

    # split replay (two ordered batches across the same table)
    split = min(split, len(events) - 1) if len(events) > 1 else 0
    t2 = bootstrap_table(spark, str(base / "t2"), n_buckets=4)
    if split > 0:
        replay_batch(spark, log, t2, str(base / "c2"), max_lsn=split - 1)
    replay_batch(spark, log, t2, str(base / "c2"), min_lsn=split - 1)
    got2 = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in t2.read().collect()
    }
    assert got2 == want
