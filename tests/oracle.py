"""In-memory serial oracle for the CDC replay (SURVEY.md §5.2).

Applies the change log one event at a time in ``(lsn, txn_seq)`` order —
exactly the reference's serial OnMessage semantics
(``/root/reference/pkg/waljs/waljs.go:332-348``): last write wins per
``(conv_id, turn_idx)``; delete removes the row. Pure Python + pyarrow;
no Spark — an independent implementation to compare against.
"""

from __future__ import annotations

import datetime as dt
import glob
import json
import os

import pyarrow.parquet as pq

UTC = dt.timezone.utc


def _to_ts(v) -> dt.datetime | None:
    if v is None:
        return None
    return dt.datetime.fromtimestamp(float(v), tz=UTC).replace(tzinfo=None)


def oracle_final_state(
    changelog_dir: str, max_lsn: int | None = None
) -> dict[tuple[str, int], dict]:
    """Fold the change log serially; returns {key: row-dict} of live rows."""
    events = []
    for path in sorted(glob.glob(os.path.join(changelog_dir, "chunk-*.parquet"))):
        tbl = pq.read_table(path)
        events.extend(tbl.to_pylist())
    events.sort(key=lambda e: (e["lsn"], e["txn_seq"]))

    state: dict[tuple[str, int], dict] = {}
    for e in events:
        if max_lsn is not None and e["lsn"] > max_lsn:
            continue
        key = (e["conv_id"], e["turn_idx"])
        if e["op"] == "delete":
            state.pop(key, None)
            continue
        payload = json.loads(e["after_json"]) if e["after_json"] else {}
        state[key] = {
            "conv_id": e["conv_id"],
            "turn_idx": e["turn_idx"],
            "role": payload.get("role"),
            "text": payload.get("text"),
            "tool": payload.get("tool"),
            "ts": _to_ts(payload.get("ts")),
            "_lsn": e["lsn"],
        }
    return state


def oracle_rows(changelog_dir: str, max_lsn: int | None = None) -> list[dict]:
    """Live rows in stable (conv_id, turn_idx) order — the verification
    invariant from BASELINE.json (per-turn text equality, stable order)."""
    state = oracle_final_state(changelog_dir, max_lsn=max_lsn)
    return [state[k] for k in sorted(state)]
