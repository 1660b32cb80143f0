"""Streaming incremental dedup: a continuous stream of new documents
matched against a persisted corpus LSH signature index.

The batch operator (``text.dedupe.incremental_lsh_duplicates``) is the
per-increment shape; this module is the always-on form — crawl output
lands as files/messages, the stream dedupes each micro-batch against the
corpus index and absorbs survivors, without ever recomputing a corpus
signature. The reference has no text/dedup surface at all (its streaming
state is the cursor map, ``/root/reference/types/state.go:64-70``); this
is a scale-path addition for training-data ingestion.

Spark-native shape — everything STATELESS so the stream needs no state
store and no watermark:

- signatures per new doc are a pure projection
  (``minhash_signatures_rowwise``: ``array_min`` over a hash lambda —
  no explode+groupBy, which would be a stateful streaming aggregation);
- band explode is a projection;
- the index probe is a stream-static equi-join on (band, bucket) —
  Spark plans the static (compacted, O(#buckets)) side as a broadcast
  or shuffled-hash build per micro-batch, and the 100 TB corpus behind
  it is never touched;
- the per-doc min-witness fold runs INSIDE foreachBatch (bounded:
  one row per new doc per matched band before the fold), where it is a
  plain batch aggregation with exactly-once parquet output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gear5_spark.text.dedupe import (
    band_assignments,
    compact_signature_index,
    minhash_signatures_rowwise,
)


def stream_incremental_matches(
    docs_stream: DataFrame,
    index: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Raw per-band candidate matches ``(doc_id, corpus_doc_id)`` for a
    STREAMING frame of new docs against a static index (raw or
    compacted). Stateless end to end, so any output mode/trigger works.
    A doc matching the same witness through several bands emits several
    rows — fold with ``groupBy(doc_id).agg(min(...))`` in foreachBatch
    (:func:`run_incremental_dedup_stream`) or accept candidates at-least
    -once downstream."""
    reps = (
        index
        if "corpus_doc_id" in index.columns
        else compact_signature_index(index)
    )
    sigs = minhash_signatures_rowwise(
        docs_stream, num_hashes, shingle_n, hasher
    )
    banded = band_assignments(sigs, num_hashes, bands, hasher)
    return banded.join(reps, ["band", "bucket"]).select(
        "doc_id", "corpus_doc_id"
    )


def run_incremental_dedup_stream(
    docs_stream: DataFrame,
    index: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hasher: str = "xxhash64",
    available_now: bool = True,
    timeout_sec: float | None = None,
):
    """Drive the stream to a parquet match log: per micro-batch, fold
    raw band matches to one ``(doc_id, corpus_doc_id)`` witness row per
    matched doc (min over all matching corpus docs — identical
    semantics to the batch operator) and append under
    ``out_dir/batch_id=N``, overwritten per batch so a replayed
    micro-batch is idempotent. Returns the (stopped, if drained) query.
    """
    matches = stream_incremental_matches(
        docs_stream, index, num_hashes, bands, shingle_n, hasher
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        folded = batch.groupBy("doc_id").agg(
            F.min("corpus_doc_id").alias("corpus_doc_id")
        )
        folded.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    writer = (
        matches.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "spark"))
        .queryName("incremental-dedup")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        if timeout_sec is None:
            query.awaitTermination()
        elif not query.awaitTermination(timeout_sec):
            query.stop()
            query.awaitTermination(30)
            raise TimeoutError(
                f"availableNow drain exceeded {timeout_sec}s"
            )
    return query
