"""Planning-time parallelism guard for CPU-heavy narrow stages.

A parquet table smaller than one split arrives as a SINGLE partition, so
a compute-dense projection right after the scan (MinHash signatures:
shingle explode × K hash-min aggregates; SimHash bit folds; LSH plane
projections) runs on one core no matter how wide the cluster is. At
corpus scale the input has far more splits than cores and this never
triggers — the guard exists so the SAME operator code saturates a
32-core local session on a one-file table and a 1000-executor cluster
on 100k splits without a needless full-corpus shuffle in either case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism — but ONLY when its current partition count is below
    ``min_factor``× that. The repartition moves just the narrow input
    (one extra shuffle of the raw rows); when the source already has
    enough splits this is a no-op and the plan is untouched, so calling
    it ahead of a CPU-dense stage is safe at any scale.

    The explicit partition count is deliberately user-specified: AQE's
    advisory coalescing would immediately fold a few-MB shuffle back to
    one partition, exactly the serialization this exists to break.
    """
    if df.isStreaming:
        # no .rdd on a streaming frame; micro-batch width is governed
        # by the source (maxFilesPerTrigger × file splits) instead
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # .rdd resolves the logical plan only — no job is triggered
    if df.rdd.getNumPartitions() >= max(1, int(target * min_factor)):
        return df
    return df.repartition(target)
