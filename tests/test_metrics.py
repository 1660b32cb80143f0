"""Windowed event-time metrics: streaming result equals batch computation;
append-mode parquet sink emits only watermark-finalized windows."""

from __future__ import annotations

from gear5_spark.sources.changelog import read_changelog, stream_changelog
from gear5_spark.streaming.metrics import run_metrics_stream, windowed_op_counts


def test_streaming_windowed_counts_match_batch(spark, tiny_changelog, tmp_path):
    changelog_dir, manifest = tiny_changelog

    batch_counts = {
        (r["window_start"], r["op"]): (r["event_count"], r["distinct_convs"])
        for r in windowed_op_counts(
            read_changelog(spark, changelog_dir), "1 minute"
        ).collect()
    }
    assert sum(c for c, _ in batch_counts.values()) == manifest["n_events"]

    # streaming, complete mode to a memory sink: all windows present
    counts = windowed_op_counts(
        stream_changelog(spark, changelog_dir, max_files_per_trigger=2),
        "1 minute",
    )
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("op_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    stream_counts = {
        (r["window_start"], r["op"]): (r["event_count"], r["distinct_convs"])
        for r in spark.sql("select * from op_counts").collect()
    }
    assert stream_counts == batch_counts


def test_metrics_parquet_sink_finalized_windows(spark, tiny_changelog, tmp_path):
    changelog_dir, _ = tiny_changelog
    out = str(tmp_path / "metrics")
    run_metrics_stream(
        spark,
        changelog_dir,
        out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
    )
    rows = spark.read.parquet(out).collect()
    # append mode emits only windows sealed by the watermark: a non-empty
    # strict subset of the batch windows (the tail window stays open)
    batch = windowed_op_counts(
        read_changelog(spark, changelog_dir), "1 minute"
    ).collect()
    batch_map = {
        (r["window_start"], r["op"]): r["event_count"] for r in batch
    }
    assert 0 < len(rows) < len(batch)
    for r in rows:
        assert batch_map[(r["window_start"], r["op"])] == r["event_count"]
