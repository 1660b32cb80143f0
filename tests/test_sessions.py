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
