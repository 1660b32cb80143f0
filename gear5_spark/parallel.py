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

# logical operators whose presence means the plan contains
# compute-bearing exchanges — probing .rdd there would EXECUTE the
# upstream stages under AQE (AdaptiveSparkPlanExec materializes every
# non-final query stage to plan the final one), doing the heaviest
# work twice. Such plans already carry shuffle-partition width, so the
# narrow-scan guard has nothing to fix anyway. Plain Repartition /
# coalesce nodes are NOT listed: they are cheap to probe and a
# coalesced scan is exactly the narrow shape the guard exists for.
_WIDE_OPS = (
    "Join", "Aggregate", "Window", "Distinct", "Deduplicate",
    "Sort", "GlobalLimit", "Intersect", "Except",
)


def _is_narrow_scan_plan(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return not any(op in plan for op in _WIDE_OPS)


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism — but ONLY when it is a plain narrow scan with fewer
    partitions than that. The repartition moves just the narrow input
    (one extra shuffle of the raw rows); when the source already has
    enough splits — or the plan already contains exchanges, whose
    width is governed by ``spark.sql.shuffle.partitions`` — this is a
    no-op and the plan is untouched, so calling it ahead of a
    CPU-dense stage is safe at any scale.

    The explicit partition count is deliberately user-specified: AQE's
    advisory coalescing would immediately fold a few-MB shuffle back to
    one partition, exactly the serialization this exists to break.
    """
    if df.isStreaming:
        # no .rdd on a streaming frame; micro-batch width is governed
        # by the source (maxFilesPerTrigger × file splits) instead
        return df
    if not _is_narrow_scan_plan(df):
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # safe here: a narrow scan's .rdd resolves the plan without
    # materializing any shuffle stage
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
