"""SparkSession factory tuned for the CDC/ingest engine.

Local-mode testing uses ``local[N]``; on a real cluster the same confs
apply (AQE, Arrow, shuffle sizing). The reference has no session concept —
it is a single Go process; Spark's session + shuffle replace its
channel-based dataflow (see SURVEY.md §3.1).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "gear5-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with CDC-engine defaults.

    Defaults chosen for scale:
    - AQE on: runtime coalescing + skew-join splitting for the MERGE join.
    - Arrow on: every pandas UDF crosses the JVM/Python boundary in
      columnar batches (the reference moves rows one Go map at a time;
      we never move rows one Python object at a time).
    - shuffle partitions sized to cores locally; on a 1000-executor
      cluster this is overridden (AQE coalesces anyway).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", str(DEFAULT_SHUFFLE_PARTITIONS))
        )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # allow a join whose children are hash-partitioned on a SUBSET
        # of the join keys to run without a new exchange (rows with
        # equal join keys share the subset hash, so co-location is
        # guaranteed). The co-partitioned MERGE (lake/merge.py
        # slots_per_bucket) leads its equi-join with the placement slot
        # both sides are already partitioned on; with the default
        # (true) Spark re-shuffles both sides by the full key anyway.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # zstd level 1 for data-file writes: A/B at 4M-winner batches
        # (bench_extra `write_codec`, 8 cores) — level 1 writes faster
        # (2.56 s vs 3.05 s) AND reads back faster (0.71 s vs 0.80 s)
        # than the parquet-mr default level 3 for +23% file size
        # (388 vs 315 MB); snappy/lz4 write no faster and read slower
        # at 2-3x the bytes. Transparent to every reader.
        .config("spark.hadoop.parquet.compression.codec.zstd.level", "1")
        # shuffle/broadcast/spill codec: the replay's heavy phases are
        # bandwidth-bound, and zstd moves 2.3x fewer shuffle bytes than
        # lz4 on the JSON-payload dedup shuffle for LESS total CPU
        # (1813 -> 797 MB and 114 -> 94 CPU-sec at 4M events/8 cores,
        # scripts/diag_codec.py) — fewer bytes through the memory
        # hierarchy beats the compressor cost on every level measured
        .config("spark.io.compression.codec", "zstd")
        # INT64-micros timestamps (not legacy INT96): footer min/max
        # statistics exist, enabling manifest-stats file skipping
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
