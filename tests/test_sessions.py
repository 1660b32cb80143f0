"""Custom stateful streaming operator (applyInPandasWithState): state
accumulates across micro-batches, survives only in the checkpoint, and
idle conversations finalize via event-time timeout."""

from __future__ import annotations

import pytest

from gen_fixtures import generate_changelog
from gear5_spark.sources.changelog import stream_changelog
from gear5_spark.streaming.sessions import conversation_progress


@pytest.mark.usefixtures("spark")
def test_progress_accumulates_across_batches(spark, tmp_path):
    log = str(tmp_path / "log")
    manifest = generate_changelog(
        log, n_events=4_000, n_convs=50, chunk_rows=1_000
    )
    stream = stream_changelog(spark, log, max_files_per_trigger=1)
    progress = conversation_progress(stream)
    q = (
        progress.writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.sql(
        "SELECT * FROM conv_progress"
    ).collect()
    assert rows, "stateful operator emitted nothing"
    # multiple emissions per conversation (one per batch it appeared in),
    # each monotonically growing — state really carried across batches
    by_conv: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: r["last_lsn"]):
        by_conv.setdefault(r["conv_id"], []).append(r)
    multi = [v for v in by_conv.values() if len(v) > 1]
    assert multi, "no conversation spanned two micro-batches"
    for emissions in multi:
        counts = [e["n_events"] for e in emissions]
        assert counts == sorted(counts) and counts[0] >= 1
        turns = [e["max_turn"] for e in emissions]
        assert turns == sorted(turns)

    # the final emission per conv must equal the serial ground truth
    import json

    import pyarrow.parquet as pq
    import glob
    import os

    truth: dict[str, dict] = {}
    for p in sorted(glob.glob(os.path.join(log, "chunk-*.parquet"))):
        for e in pq.read_table(p).to_pylist():
            t = truth.setdefault(
                e["conv_id"], {"n": 0, "mt": -1, "lsn": -1}
            )
            t["n"] += 1
            t["mt"] = max(t["mt"], e["turn_idx"])
            t["lsn"] = max(t["lsn"], e["lsn"])
    for conv, emissions in by_conv.items():
        last = emissions[-1]
        assert last["n_events"] == truth[conv]["n"]
        assert last["max_turn"] == truth[conv]["mt"]
        assert last["last_lsn"] == truth[conv]["lsn"]


def test_streaming_sessionize_matches_serial_fold(spark, tmp_path):
    """Final per-(conv, session) rows must equal a serial gap fold over
    the same events; sessions close in-stream or by event-time timeout."""
    import glob
    import os

    import pyarrow.parquet as pq

    from gear5_spark.streaming.sessions import streaming_sessionize

    log = str(tmp_path / "log")
    generate_changelog(log, n_events=4_000, n_convs=50, chunk_rows=1_000)
    stream = stream_changelog(spark, log, max_files_per_trigger=1)
    sessions = streaming_sessionize(stream, gap="2 minutes", watermark="1 minute")
    q = (
        sessions.writeStream.format("memory")
        .queryName("conv_sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.sql("SELECT * FROM conv_sessions").collect()
    assert rows
    # session identity is (conv_id, session_start) — stable across state
    # eviction, unlike session_seq; n_events grows monotonically, so
    # max(n_events) IS the final state of that session
    final: dict[tuple, dict] = {}
    for r in rows:
        k = (r["conv_id"], r["session_start"])
        cur = final.get(k)
        if cur is None or r["n_events"] >= cur["n_events"]:
            final[k] = {
                "n_events": r["n_events"],
                "start": r["session_start"],
                "end": r["session_end"],
            }

    # serial ground truth: same 2-minute gap fold per conversation
    GAP_MS = 2 * 60 * 1000
    events: dict[str, list[int]] = {}
    for p in sorted(glob.glob(os.path.join(log, "chunk-*.parquet"))):
        for e in pq.read_table(p).to_pylist():
            events.setdefault(e["conv_id"], []).append(e["ts_ms"])
    import datetime as dt

    truth: dict[tuple, int] = {}
    for conv, ts_list in events.items():
        n, last, start = 0, None, None
        for ts in sorted(ts_list):
            if last is not None and ts - last > GAP_MS:
                truth[(conv, dt.datetime.utcfromtimestamp(start / 1000))] = n
                n, start = 0, None
            if start is None:
                start = ts
            n += 1
            last = ts
        truth[(conv, dt.datetime.utcfromtimestamp(start / 1000))] = n

    got = {k: v["n_events"] for k, v in final.items()}
    assert got == truth
    # multiple sessions actually happened (the gap split something)
    assert any(
        sum(1 for c, _ in truth if c == conv) > 1 for conv, _ in truth
    )
    for k, v in final.items():
        assert v["start"] <= v["end"]
