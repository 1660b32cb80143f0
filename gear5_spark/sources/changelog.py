"""Change-feed source — the binlog/WAL tail, Spark-native.

The reference tails a Postgres logical-replication slot over a socket
(``/root/reference/pkg/waljs/waljs.go:126-259``) and tracks its position in
``confirmed_flush_lsn``. Our stand-in (per SURVEY.md S4 and FIXTURES.md §2)
is an append-only directory of LSN-ordered parquet chunks:

- batch mode (``read_changelog``) = bounded replay / initial snapshot;
- stream mode (``stream_changelog``) = ``spark.readStream`` file source —
  the Structured Streaming checkpoint plays the role of the replication
  slot's confirmed LSN (offsets = which files are consumed), and
  ``maxFilesPerTrigger`` bounds micro-batch size the way the reference's
  ``--batch`` flag bounds its channel (``protocol/root.go:78``).

At scale the same pipeline binds to a Kafka/Kinesis source or a real CDC
feed — only this module changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# FIXTURES.md §2; mirrors wal2json fields (reference pkg/waljs/types.go:49-65)
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("txn_id", T.LongType(), False),
        T.StructField("txn_seq", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("after_json", T.StringType(), True),
    ]
)


def read_changelog(
    spark: SparkSession,
    changelog_dir: str,
    min_lsn: int | None = None,
    max_lsn: int | None = None,
) -> DataFrame:
    """Batch read of the change feed; ``min_lsn`` is the cursor predicate
    (SURVEY.md P3) — Catalyst pushes it into the parquet scan.
    ``max_lsn`` (inclusive) bounds a phased replay."""
    from pyspark.sql import functions as F

    df = (
        spark.read.schema(CHANGE_SCHEMA)
        .option("pathGlobFilter", "chunk-*.parquet")
        .parquet(changelog_dir)
    )
    if min_lsn is not None:
        df = df.filter(F.col("lsn") > F.lit(min_lsn))
    if max_lsn is not None:
        df = df.filter(F.col("lsn") <= F.lit(max_lsn))
    return df


def stream_changelog(
    spark: SparkSession,
    changelog_dir: str,
    max_files_per_trigger: int | None = 4,
) -> DataFrame:
    """Streaming tail of the change feed (S4)."""
    reader = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("pathGlobFilter", "chunk-*.parquet")
        .option("latestFirst", "false")
        # FileStreamSource silently IGNORES files whose mtime is older
        # than maxFileAge (default 7d) relative to the newest seen — a
        # backfilled/restored chunk with a preserved old mtime would
        # never be delivered. The feed contract is append-only by NAME;
        # age-based eviction is wrong for it, so effectively disable it
        .option("maxFileAge", "36500d")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(changelog_dir)
