"""Column profiling — the `discover` command's statistical sibling.

The reference's discovery infers only TYPES from a sample
(``/root/reference/protocol/discover.go:46-90``); a training-data
pipeline also wants per-column statistics before committing to an ingest
(row/null/distinct counts, value ranges). One aggregation pass computes
every column's stats (all JVM built-ins, map-side combined), then a
``stack`` unpivot emits one row per column.

``exact=False`` swaps COUNT(DISTINCT) for HyperLogLog
``approx_count_distinct`` — at 100 TB the exact distinct of a
high-cardinality column is its own shuffle per column; the sketch rides
the same single pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max stringified so mixed column types
    share one schema."""
    from pyspark.sql import types as T

    cols = cols or df.columns
    dtypes = {f.name: f.dataType for f in df.schema.fields}

    def _orderable(dt) -> bool:
        # MAP (and maps nested in arrays/structs) supports no ordering —
        # min/max/count_distinct on it fails the WHOLE aggregation, so
        # unorderable columns degrade per-column instead (null stats)
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        ok = _orderable(dtypes[c])
        distinct = (
            (
                F.count_distinct(F.col(c))
                if exact
                else F.approx_count_distinct(F.col(c))
            )
            if ok
            else F.lit(None).cast("long")
        )
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nonnull"),
            distinct.alias(f"{c}__distinct"),
            (F.min(F.col(c)).cast("string") if ok else F.lit(None)).alias(
                f"{c}__min"
            ),
            (F.max(F.col(c)).cast("string") if ok else F.lit(None)).alias(
                f"{c}__max"
            ),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__total").alias("n_rows"),
                (F.col("__total") - F.col(f"{c}__nonnull")).alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
