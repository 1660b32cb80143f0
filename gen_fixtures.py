"""Deterministic fixture generator — transcripts change log (FIXTURES.md).

Synthesizes the binlog/WAL stand-in: an append-only, LSN-ordered sequence
of insert/update/delete change events over multi-turn transcripts keyed by
``(conv_id, turn_idx)``, written as parquet chunk files whose lexical
order == LSN order (≈ the wal2json stream the reference tails,
``/root/reference/pkg/waljs/types.go:49-65``). A snapshot prefix of pure
inserts precedes the mixed tail (≈ the initial-snapshot phase,
``pkg/waljs/waljs.go:261-316``).

Seeded + wall-clock-free: same args -> byte-identical output.
Mix: ~60% insert / ~30% update / ~10% delete (FIXTURES.md §2); a hot
conv_id receives ``skew_frac`` of all tail events; the nullable ``tool``
payload field appears only after ``evolve_frac`` of events (additive
schema evolution mid-stream, SURVEY.md ST7).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CHANGE_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("txn_id", pa.int64()),
        ("txn_seq", pa.int32()),
        ("op", pa.string()),
        ("ts_ms", pa.int64()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("after_json", pa.string()),
    ]
)

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "python", "browser", "calculator", None, None]
BASE_TS_MS = 1_700_000_000_000  # fixed epoch base, no wall clock
BASE_TS_S = 1_700_000_000  # payload `ts` uses whole seconds (exact in double)
_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu".split()
)


def _text_pool(rng: np.random.Generator, size: int = 512) -> list[str]:
    pool = []
    for _ in range(size):
        n = int(rng.integers(4, 300))
        words = rng.choice(_WORDS, size=n)
        pool.append(" ".join(words.tolist()))
    return pool


def generate_changelog(
    out_dir: str,
    n_events: int = 10_000,
    n_convs: int = 200,
    snapshot_frac: float = 0.25,
    skew_frac: float = 0.30,
    evolve_frac: float = 0.5,
    txn_size: int = 5,
    chunk_rows: int = 5_000,
    seed: int = 42,
    overwrite: bool = False,
) -> dict:
    """Write an LSN-ordered change log; returns a manifest dict."""
    if os.path.exists(out_dir):
        if not overwrite:
            raise FileExistsError(out_dir)
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    rng = np.random.default_rng(seed)
    pool = _text_pool(rng)
    n_pool = len(pool)
    hot_conv = "conv-00000000"
    evolve_lsn = int(n_events * evolve_frac)

    # live state, tracked sequentially (CDC validity: updates/deletes only
    # hit live keys)
    next_turn: dict[str, int] = {}
    live: list[tuple[str, int]] = []
    live_pos: dict[tuple[str, int], int] = {}

    cols: dict[str, list] = {k.name: [] for k in CHANGE_SCHEMA}
    chunk_idx = 0

    def flush() -> None:
        nonlocal chunk_idx, cols
        if not cols["lsn"]:
            return
        tbl = pa.table(
            {k: pa.array(v, type=CHANGE_SCHEMA.field(k).type) for k, v in cols.items()},
            schema=CHANGE_SCHEMA,
        )
        pq.write_table(
            tbl, os.path.join(out_dir, f"chunk-{chunk_idx:06d}.parquet")
        )
        chunk_idx += 1
        cols = {k.name: [] for k in CHANGE_SCHEMA}

    n_snapshot = int(n_events * snapshot_frac)
    op_draw = rng.random(n_events)
    conv_draw = rng.random(n_events)
    pick_draw = rng.integers(0, 1 << 62, size=n_events)
    text_draw = rng.integers(0, n_pool, size=n_events)
    role_draw = rng.integers(0, len(ROLES), size=n_events)
    tool_draw = rng.integers(0, len(TOOLS), size=n_events)

    def add_insert(lsn: int) -> tuple[str, int, str]:
        if conv_draw[lsn] < skew_frac:
            conv = hot_conv
        else:
            conv = f"conv-{int(pick_draw[lsn]) % n_convs:08d}"
        turn = next_turn.get(conv, 0)
        next_turn[conv] = turn + 1
        key = (conv, turn)
        live_pos[key] = len(live)
        live.append(key)
        return conv, turn, "insert"

    def pick_live(lsn: int) -> tuple[str, int]:
        i = int(pick_draw[lsn]) % len(live)
        return live[i]

    def remove_live(key: tuple[str, int]) -> None:
        i = live_pos.pop(key)
        last = live.pop()
        if i < len(live):
            live[i] = last
            live_pos[last] = i

    for lsn in range(n_events):
        if lsn < n_snapshot or not live:
            op = "insert"
        else:
            r = op_draw[lsn]
            op = "insert" if r < 0.60 else ("update" if r < 0.90 else "delete")
        if op == "insert":
            conv, turn, op = add_insert(lsn)
        elif op == "update":
            conv, turn = pick_live(lsn)
        else:
            conv, turn = pick_live(lsn)
            remove_live((conv, turn))

        ts_ms = BASE_TS_MS + lsn * 1000
        if op == "delete":
            after = None
        else:
            payload = {
                "role": ROLES[role_draw[lsn]],
                "text": f"{pool[text_draw[lsn]]} #{lsn}",
                "ts": BASE_TS_S + turn * 60 + lsn,
            }
            if lsn >= evolve_lsn:
                tool = TOOLS[tool_draw[lsn]]
                if tool is not None:
                    payload["tool"] = tool
            after = json.dumps(payload, separators=(",", ":"))

        cols["lsn"].append(lsn)
        cols["txn_id"].append(lsn // txn_size)
        cols["txn_seq"].append(lsn % txn_size)
        cols["op"].append(op)
        cols["ts_ms"].append(ts_ms)
        cols["conv_id"].append(conv)
        cols["turn_idx"].append(turn)
        cols["after_json"].append(after)
        if len(cols["lsn"]) >= chunk_rows:
            flush()
    flush()

    manifest = {
        "n_events": n_events,
        "n_convs": n_convs,
        "snapshot_events": n_snapshot,
        "evolve_lsn": evolve_lsn,
        "hot_conv": hot_conv,
        "seed": seed,
        "chunks": chunk_idx,
        "final_live_keys": len(live),
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--events", type=int, default=10_000)
    ap.add_argument("--convs", type=int, default=200)
    ap.add_argument("--chunk-rows", type=int, default=5_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--skew", type=float, default=0.30)
    ap.add_argument("--overwrite", action="store_true")
    a = ap.parse_args()
    m = generate_changelog(
        a.out_dir,
        n_events=a.events,
        n_convs=a.convs,
        chunk_rows=a.chunk_rows,
        seed=a.seed,
        skew_frac=a.skew,
        overwrite=a.overwrite,
    )
    print(json.dumps(m))


if __name__ == "__main__":
    main()
