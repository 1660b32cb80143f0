"""Event-time windowed pipeline metrics (SURVEY.md ST3/ST4 optional row).

The reference emits per-batch record counters on stdout
(``/root/reference/protocol/read.go:61-88``); lineage rows already cover
that. This module adds the genuinely streaming-native metric the
reference cannot express: event-time tumbling-window op counts with a
watermark for late data — ops/sec by kind over commit time, usable for
lag/throughput dashboards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gear5_spark.sources.changelog import stream_changelog


def windowed_op_counts(
    changes: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window counts per op over commit time (ts_ms).

    Works on both batch and streaming change DataFrames; in streaming the
    watermark bounds state for late events (the WAL is ordered so real
    lateness is tiny, but a multi-source union need not be)."""
    evented = changes.withColumn("commit_time", F.timestamp_millis(F.col("ts_ms")))
    if changes.isStreaming:
        evented = evented.withWatermark("commit_time", watermark)
    return (
        evented.groupBy(
            F.window("commit_time", window_duration).alias("w"), F.col("op")
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            # exact distinct is unsupported on streaming aggregations; the
            # HLL sketch is deterministic and merge-commutative, so batch
            # and streaming agree
            F.approx_count_distinct("conv_id").alias("distinct_convs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "event_count",
            "distinct_convs",
        )
    )


def run_metrics_stream(
    spark,
    changelog_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 minute",
    max_files_per_trigger: int | None = None,
    timeout_sec: float | None = 600,
):
    """Drain the change feed into a parquet metrics table (availableNow).

    Streaming parquet sinks need append mode, so the aggregation runs with
    a watermark and emits finalized windows."""
    changes = stream_changelog(
        spark, changelog_dir, max_files_per_trigger=max_files_per_trigger
    )
    counts = windowed_op_counts(changes, window_duration=window_duration)
    query = (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = query.awaitTermination(timeout_sec)
    # no-timeout awaitTermination returns None (void) AFTER a complete
    # drain — only a real timeout (False with a timeout set) is an error
    if timeout_sec is not None and not finished:
        # the drain outran the timeout: returning silently would hand the
        # caller a PARTIAL metrics table with a writer still racing it
        query.stop()
        raise TimeoutError(
            f"metrics drain exceeded {timeout_sec}s (stopped incomplete)"
        )
    return query
