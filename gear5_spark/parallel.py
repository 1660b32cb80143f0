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

# Logical-plan node classes that are safe to probe with .rdd: leaves
# (the split count comes from scan metadata, nothing executes), pure
# per-row transforms, and plain Repartition/coalesce (probing runs at
# most a round-robin map over the raw scan rows — a coalesced scan is
# exactly the narrow shape this guard exists for). ANY other node —
# joins, aggregates, windows, sorts, limits, pandas group-map/cogroup
# (FlatMapGroupsInPandas / FlatMapCoGroupsInPandas), rebalance — is
# treated as wide: probing .rdd there would EXECUTE the upstream query
# stages under AQE (AdaptiveSparkPlanExec materializes every non-final
# stage to plan the final one), doing the heaviest work twice; and such
# plans already carry shuffle-partition width, so the narrow-scan guard
# has nothing to fix anyway. An allowlist (not a denylist) means an
# unrecognized node is conservatively wide instead of silently probed.
_NARROW_NODES = frozenset({
    # leaves
    "LogicalRelation", "DataSourceV2Relation", "LocalRelation",
    "LogicalRDD", "Range", "OneRowRelation", "StreamingRelationV2",
    # per-row narrow transforms
    "Project", "Filter", "Generate", "SubqueryAlias", "Union",
    "MapInPandas", "PythonMapInArrow",
    # explicitly-cheap width changers (see note above)
    "Repartition",
})


def _is_narrow_scan_plan(df: DataFrame) -> bool:
    """True iff every node in the analyzed logical plan is on the
    narrow allowlist. Walks actual tree-node class names rather than
    substring-matching the plan string, so an identifier that happens
    to contain an operator keyword (a column named ``SortKey``) cannot
    disable the guard, and a shuffle-bearing node missing from a
    denylist cannot sneak past it."""
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() not in _NARROW_NODES:
            return False
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return True


def shuffle_width(spark) -> int:
    """The session's shuffle-partition count as an int, tolerating
    platforms where ``spark.sql.shuffle.partitions`` is set to a
    non-numeric value such as ``"auto"`` (Databricks auto-optimized
    shuffle) — falls back to the cluster's default parallelism there."""
    raw = spark.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        return int(raw)
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


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
