"""Change-event normalization — the "T" of ELT, vectorized.

Mirrors the reference's per-value ``ReformatValue`` coercions
(``/root/reference/typeutils/reformat.go:44-106``: bool from "1"/"t"/"yes",
numeric widening, 11-layout timestamp parse ``reformat.go:16-28`` with year
clamp ``reformat.go:164-170``) and the ``_cdc_*`` metadata stamping
(``/root/reference/drivers/postgres/internal/cdc.go:70-78``,
``pkg/jdbc/jdbc.go:11-19``) — but columnar, never per-row Go-map/Python-dict.

Two interchangeable physical paths:

- **sql** (default): ``from_json`` + built-in casts — whole-stage codegen,
  zero Python in the hot loop. Use when the payload schema is known.
- **pandas**: one ``mapInPandas`` Arrow transform for messy feeds (mixed
  timestamp layouts, stringly-typed bools) — the only sanctioned per-value
  code path (SURVEY.md §2.10), batched through Arrow.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gear5_spark.lake.table import CDC_DELETED_AT, CDC_LSN, CDC_UPDATED_AT

# the reference tries 11 layouts (typeutils/reformat.go:16-28); these are the
# Spark-pattern equivalents of the common ones (RFC3339, SQL, date-only, ...)
TIMESTAMP_PATTERNS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "MM/dd/yyyy",
    "dd MMM yyyy HH:mm:ss",
]

_TRUE_SET = ["1", "t", "true", "y", "yes", "on"]  # reformat.go:48-72
_FALSE_SET = ["0", "f", "false", "n", "no", "off"]


def coerce_bool(col: Column) -> Column:
    """F1: boolean from string/int forms (typeutils/reformat.go:48-72)."""
    s = F.lower(F.trim(col.cast("string")))
    return (
        F.when(s.isin(_TRUE_SET), F.lit(True))
        .when(s.isin(_FALSE_SET), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def coerce_long(col: Column) -> Column:
    """F2: int64 from any width / numeric string / float truncation;
    try_cast throughout so malformed input degrades to NULL instead of
    failing the task under ANSI mode (reference errors per value,
    reformat.go:190-219 — NULL is our columnar equivalent)."""
    return F.coalesce(
        col.try_cast("long"),
        col.cast("string").try_cast("double").try_cast("long"),
    )


def coerce_double(col: Column) -> Column:
    """F3: float64 incl. string parse (reformat.go:221-256)."""
    return col.cast("string").try_cast("double")


def coerce_timestamp(col: Column) -> Column:
    """F5: multi-layout timestamp parse + unix-seconds ints
    (reformat.go:108-173). Entirely JVM-side: a coalesce over
    ``try_to_timestamp`` patterns, then epoch-seconds fallback."""
    s = col.cast("string")
    attempts = [F.try_to_timestamp(s, F.lit(p)) for p in TIMESTAMP_PATTERNS]
    attempts.append(F.timestamp_seconds(s.try_cast("long")))
    return F.coalesce(*attempts)


def stamp_cdc_columns(df: DataFrame) -> DataFrame:
    """Attach the three ``_cdc_*`` metadata columns the reference injects
    into every CDC record (drivers/postgres/internal/cdc.go:70-78)."""
    updated = F.timestamp_millis(F.col("ts_ms"))
    return (
        df.withColumn(CDC_LSN, F.col("lsn").cast("string"))
        .withColumn(CDC_UPDATED_AT, updated)
        .withColumn(
            CDC_DELETED_AT,
            F.when(F.col("op") == "delete", updated).otherwise(
                F.lit(None).cast("timestamp")
            ),
        )
    )


def normalize_changes(
    df: DataFrame,
    payload_schema: T.StructType,
    mode: str = "sql",
) -> DataFrame:
    """Raw change feed -> typed change DataFrame.

    Input (FIXTURES.md §2): lsn, txn_id, txn_seq, op, ts_ms, conv_id,
    turn_idx, after_json. Output: keys + ordered metadata + one typed
    column per payload field + ``_cdc_*`` columns. Delete events carry
    null payload (wal2json deletes carry only oldkeys,
    /root/reference/pkg/waljs/types.go:59-63).
    """
    if mode == "pandas":
        return _normalize_pandas(df, payload_schema)
    parsed = df.withColumn("_after", F.from_json(F.col("after_json"), payload_schema))
    out = parsed.select(
        "lsn",
        "txn_id",
        "txn_seq",
        "op",
        "ts_ms",
        "conv_id",
        "turn_idx",
        *[F.col(f"_after.{f.name}").alias(f.name) for f in payload_schema.fields],
    )
    return stamp_cdc_columns(out)


# ---------------------------------------------------------------- pandas path


def _clamp_year(ts: pd.Series) -> pd.Series:
    # year clamp [0, 9999] — reformat.go:164-170
    return ts.where((ts.dt.year >= 0) & (ts.dt.year <= 9999))


def _coerce_pd(series: pd.Series, dt: T.DataType) -> pd.Series:
    if isinstance(dt, T.BooleanType):
        s = series.astype("string").str.strip().str.lower()
        out = pd.Series(pd.NA, index=series.index, dtype="boolean")
        out[s.isin(_TRUE_SET)] = True
        out[s.isin(_FALSE_SET)] = False
        return out
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return pd.to_numeric(series, errors="coerce").astype("Int64")
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return pd.to_numeric(series, errors="coerce").astype("Float64")
    if isinstance(dt, T.TimestampType):
        num = pd.to_numeric(series, errors="coerce")
        from_num = pd.to_datetime(num, unit="s", errors="coerce", utc=True)
        from_str = pd.to_datetime(
            series.where(num.isna()), errors="coerce", utc=True, format="mixed"
        )
        return _clamp_year(from_num.fillna(from_str).dt.tz_localize(None))
    return series.astype("string")


def _normalize_pandas(df: DataFrame, payload_schema: T.StructType) -> DataFrame:
    meta_cols = ["lsn", "txn_id", "txn_seq", "op", "ts_ms", "conv_id", "turn_idx"]
    out_fields = [df.schema[c] for c in meta_cols] + list(payload_schema.fields)
    out_schema = T.StructType(out_fields)

    def _loads(s) -> dict:
        # malformed JSON degrades to an empty payload (null columns), the
        # same contract as from_json's null-on-error — never a task failure
        if not isinstance(s, str) or not s:
            return {}
        try:
            out = json.loads(s)
            return out if isinstance(out, dict) else {}
        except ValueError:
            return {}

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed: list[dict[str, Any]] = [_loads(s) for s in pdf["after_json"]]
            payload = pd.DataFrame.from_records(parsed, index=pdf.index)
            out = pdf[meta_cols].copy()
            for f in payload_schema.fields:
                col = payload[f.name] if f.name in payload.columns else pd.Series(
                    pd.NA, index=pdf.index
                )
                out[f.name] = _coerce_pd(col, f.dataType)
            yield out[[f.name for f in out_fields]]

    typed = df.mapInPandas(transform, schema=out_schema)
    return stamp_cdc_columns(typed)
