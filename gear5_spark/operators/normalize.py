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
from dataclasses import dataclass
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gear5_spark.lake.table import CDC_DELETED_AT, CDC_LSN, CDC_UPDATED_AT
from gear5_spark.operators.infer import SCALAR_TOKENS


@dataclass(frozen=True)
class PayloadField:
    """One typed payload column: ``source`` is the raw JSON key (used to
    extract), ``col`` the sanitized output column name (operators/names),
    ``token`` the registry type token (operators/infer)."""

    col: str
    token: str
    source: str

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


# epoch-seconds range for years [0, 9999] (reformat.go:164-170)
_EPOCH_S_MIN = -62_135_596_800
_EPOCH_S_MAX = 253_402_300_799


def coerce_timestamp(col: Column) -> Column:
    """F5: multi-layout timestamp parse + unix-seconds ints
    (reformat.go:108-173) + the reference's year clamp [0, 9999]
    (reformat.go:164-170 — matching the pandas path's ``_clamp_year``).
    Entirely JVM-side: a coalesce over ``try_to_timestamp`` patterns,
    then a RANGE-GUARDED epoch-seconds fallback — an unguarded
    ``timestamp_seconds`` throws 'long overflow' on large numeric
    strings (e.g. a compact ``yyyyMMddHHmmss`` value) and would fail
    the task instead of degrading to NULL."""
    s = col.cast("string")
    attempts = [F.try_to_timestamp(s, F.lit(p)) for p in TIMESTAMP_PATTERNS]
    n = s.try_cast("long")
    attempts.append(
        F.timestamp_seconds(F.when(n.between(_EPOCH_S_MIN, _EPOCH_S_MAX), n))
    )
    ts = F.coalesce(*attempts)
    return F.when(F.year(ts).between(0, 9999), ts)


def decode_url(col: Column) -> Column:
    """F10: percent-decoding for URL-encoded values (object-store keys,
    hive partition values) — the reference decodes partition values read
    from S3 paths (``drivers/s3/internal/reader/parquet.go:217-223``).
    JVM-side ``url_decode``; try-variant so malformed escapes degrade to
    NULL instead of failing the task."""
    return F.try_url_decode(col.cast("string"))


def stamp_cdc_columns(df: DataFrame) -> DataFrame:
    """Attach the three ``_cdc_*`` metadata columns the reference injects
    into every CDC record (drivers/postgres/internal/cdc.go:70-78)."""
    # timestamp_millis multiplies by 1000 via multiplyExact: a corrupt
    # ts_ms (e.g. nanoseconds) would throw 'long overflow' and kill the
    # batch — guard to the representable range, degrade to NULL
    _MS_MAX = 9_223_372_036_854_775  # Long.MaxValue // 1000
    updated = F.timestamp_millis(
        F.when(F.col("ts_ms").between(-_MS_MAX, _MS_MAX), F.col("ts_ms"))
    )
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


def _to_specs(payload_schema) -> list[PayloadField]:
    """Accept either a list of PayloadField or a plain StructType (legacy
    catalog-style schema: field name == JSON key, Spark type -> token)."""
    if not isinstance(payload_schema, T.StructType):
        return list(payload_schema)
    specs = []
    for f in payload_schema.fields:
        dt = f.dataType
        if isinstance(dt, T.BooleanType):
            token = "boolean"
        elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            token = "long"
        elif isinstance(dt, (T.FloatType, T.DoubleType)):
            token = "double"
        elif isinstance(dt, T.StringType):
            token = "string"
        elif isinstance(dt, T.TimestampType):
            token = "timestamp_iso"
        else:
            token = dt.simpleString()
        specs.append(PayloadField(col=f.name, token=token, source=f.name))
    return specs


def _parse_type(token: str) -> T.DataType:
    """from_json field type for a token: scalars parse as STRING (the
    JSON token text survives — "yes", "3.9", true all arrive as text for
    the columnar coercers, reference ReformatValue semantics); complex
    DDL tokens parse typed."""
    if token in SCALAR_TOKENS:
        return T.StringType()
    return T._parse_datatype_string(token)


def output_type(token: str) -> T.DataType:
    if token in ("timestamp_iso", "epoch_seconds"):
        return T.TimestampType()
    if token in ("string", "boolean", "long", "double"):
        return {
            "string": T.StringType(),
            "boolean": T.BooleanType(),
            "long": T.LongType(),
            "double": T.DoubleType(),
        }[token]
    return T._parse_datatype_string(token)


def _coerce_sql(raw: Column, token: str) -> Column:
    if token == "boolean":
        return coerce_bool(raw)
    if token == "long":
        return coerce_long(raw)
    if token == "double":
        return coerce_double(raw)
    if token == "timestamp_iso":
        return coerce_timestamp(raw)
    if token == "epoch_seconds":
        # same range guard + year clamp as coerce_timestamp: an
        # unguarded timestamp_seconds saturates (or throws) on corrupt
        # magnitudes (millis-for-seconds, 1e30) instead of degrading to
        # NULL like the pandas path and the reference's [0,9999] clamp
        n = coerce_double(raw)
        ts = F.timestamp_seconds(
            F.when(n.between(_EPOCH_S_MIN, _EPOCH_S_MAX), n)
        )
        return F.when(F.year(ts).between(0, 9999), ts)
    return raw  # string / already-typed complex


def normalize_changes(
    df: DataFrame,
    payload_schema,
    mode: str = "sql",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Raw change feed -> typed change DataFrame.

    ``payload_schema``: list[PayloadField] (registry-driven) or a legacy
    StructType. Input (FIXTURES.md §2): lsn, txn_id, txn_seq, op, ts_ms,
    conv_id, turn_idx, after_json. Output: keys + ordered metadata + one
    typed column per payload field + ``_cdc_*`` columns. Delete events
    carry null payload (wal2json deletes carry only oldkeys,
    /root/reference/pkg/waljs/types.go:59-63).

    ``carry_cols``: physical-layout columns (e.g. the placement slot) to
    pass through untouched when present — keeping them in the plan
    preserves the input's partitioning attribute so a downstream
    co-partitioned merge join needs no new exchange.
    """
    specs = _to_specs(payload_schema)
    carried = [c for c in carry_cols if c in df.columns]
    if mode == "pandas":
        return _normalize_pandas(df, specs, carried)
    parse_schema = T.StructType(
        [T.StructField(s.source, _parse_type(s.token), True) for s in specs]
    )
    parsed = df.withColumn("_after", F.from_json(F.col("after_json"), parse_schema))
    out = parsed.select(
        *carried,
        "lsn",
        "txn_id",
        "txn_seq",
        "op",
        "ts_ms",
        "conv_id",
        "turn_idx",
        *[
            _coerce_sql(F.col("_after").getField(s.source), s.token).alias(s.col)
            for s in specs
        ],
    )
    return stamp_cdc_columns(out)


# ---------------------------------------------------------------- pandas path


def _clamp_year(ts: pd.Series) -> pd.Series:
    # year clamp [0, 9999] — reformat.go:164-170. KNOWN LIMITATION of
    # the pandas mode: datetime64[ns] only spans years 1677-2262, so
    # valid timestamps outside that window coerce to NULL here while
    # the sql mode keeps them (its clamp is the full [0, 9999]). Feeds
    # carrying far-future/past timestamps should use normalize_mode=
    # "sql" (the default and the reference-parity path).
    return ts.where((ts.dt.year >= 0) & (ts.dt.year <= 9999))


def _coerce_pd(series: pd.Series, token: str) -> pd.Series:
    if token == "boolean":
        s = series.astype("string").str.strip().str.lower()
        out = pd.Series(pd.NA, index=series.index, dtype="boolean")
        out[s.isin(_TRUE_SET)] = True
        out[s.isin(_FALSE_SET)] = False
        return out
    if token == "long":
        # ELEMENT-WISE, not pd.to_numeric: a whole-series float coercion
        # (forced by any None/str in the batch) silently rounds huge
        # in-range ints (2**63-1 -> 2**63) and then crashes or nulls
        # them. Per-value conversion mirrors the sql path exactly:
        # ints pass when in int64 range, floats/float-strings truncate
        # (then range-check), bools and junk degrade to NULL
        # (reformat.go:190-219; try_cast semantics).
        def _to_long(v):
            if v is None or isinstance(v, bool):
                return None
            if isinstance(v, int):
                return v if -(2**63) <= v < 2**63 else None
            if isinstance(v, float):
                if v != v or not (-(2.0**63) <= v < 2.0**63):
                    return None
                return int(v)
            if isinstance(v, str):
                s_ = v.strip()
                try:
                    n_ = int(s_)
                    return n_ if -(2**63) <= n_ < 2**63 else None
                except ValueError:
                    try:
                        f_ = float(s_)
                    except ValueError:
                        return None
                    if f_ != f_ or not (-(2.0**63) <= f_ < 2.0**63):
                        return None
                    return int(f_)
            return None

        # build the nullable array from the PYTHON ints directly —
        # Series.map would infer float64 for int+None mixes and round
        # int64-max on the way through
        return pd.Series(
            pd.array([_to_long(v) for v in series], dtype="Int64"),
            index=series.index,
        )
    if token == "double":
        return pd.to_numeric(series, errors="coerce").astype("Float64")
    if token == "epoch_seconds":
        num = pd.to_numeric(series, errors="coerce")
        return _clamp_year(
            pd.to_datetime(num, unit="s", errors="coerce", utc=True)
            .dt.tz_localize(None)
        )
    if token == "timestamp_iso":
        # numbers still accepted as epoch seconds (the sql path's
        # coerce_timestamp has the same fallback)
        num = pd.to_numeric(series, errors="coerce")
        from_num = pd.to_datetime(num, unit="s", errors="coerce", utc=True)
        from_str = pd.to_datetime(
            series.where(num.isna()), errors="coerce", utc=True, format="mixed"
        )
        return _clamp_year(from_num.fillna(from_str).dt.tz_localize(None))
    if token == "string":
        # complex parsed values must serialize as JSON text (the sql
        # path keeps the raw JSON), not the Python repr — "{'a': 1}"
        # is not re-parseable downstream
        return series.map(
            lambda v: (
                json.dumps(v)
                if isinstance(v, (dict, list))
                # pd.isna catches None, float NaN (a MISSING key in the
                # batch frame), and pd.NA — str() would store 'nan'
                else (None if pd.isna(v) else str(v))
            )
        ).astype("string")
    return series  # complex (array/struct): python objects pass through


def _normalize_pandas(
    df: DataFrame, specs: list[PayloadField], carried: list[str] | None = None
) -> DataFrame:
    meta_cols = list(carried or []) + [
        "lsn", "txn_id", "txn_seq", "op", "ts_ms", "conv_id", "turn_idx",
    ]
    out_fields = [df.schema[c] for c in meta_cols] + [
        T.StructField(s.col, output_type(s.token), True) for s in specs
    ]
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
            for s in specs:
                col = (
                    payload[s.source]
                    if s.source in payload.columns
                    else pd.Series(pd.NA, index=pdf.index)
                )
                out[s.col] = _coerce_pd(col, s.token)
            yield out[[f.name for f in out_fields]]

    typed = df.mapInPandas(transform, schema=out_schema)
    return stamp_cdc_columns(typed)


# -------------------------------------------------------- widening detection


def detect_widening(
    df: DataFrame, specs, include_string: bool = False
) -> dict[str, str]:
    """Per-batch type-flip probe (ST7): find registered scalar keys
    whose CURRENT batch carries values the registered token would
    coerce LOSSILY — ``coerce_long`` truncating ``2.5`` — and return
    ``{column: widened token}`` (lattice-up only).

    The reference observes every record's type and widens the record
    schema via the LCA walk (``typeutils/fields.go:182-205``); a
    columnar engine cannot retype mid-batch, so the applier runs this
    ONE constant-width aggregate over the persisted deduped winners
    BEFORE the parse, re-registers, and re-plans the batch with the
    widened token — the flip batch itself lands lossless, and the lake
    widens its schema in place (metadata-only; lake/table.py
    ``read_file_entries``). Returns ``{}`` with NO Spark job when no
    registered key is widenable: ``string`` is the lattice top, and
    timestamp tokens' parse failures degrade to NULL by the documented
    F5 contract (a flip away from timestamps is a broken feed, not a
    widening).

    By default only NUMERIC targets fire (boolean→long/double,
    long→double): a numeric value a narrower token can't hold is
    unambiguous evidence of a type flip, while an unparseable string
    is indistinguishable from feed junk — and the documented
    configured-type contract (F1-F3, reference ReformatValue,
    ``reformat.go:44-256``) NULLs junk per value rather than degrading
    the whole column. ``include_string=True`` (applier
    ``auto_widen="full"``) opts a genuinely text-bearing feed into the
    full LCA behavior where any unparseable value widens the column to
    string. Boolean-word tokens on a numeric key stay non-lossy in
    both modes (the coercers deliberately NULL them), so a stray
    ``"yes"`` never flips a column."""
    widenable = ("boolean", "long", "double") if include_string else (
        "boolean", "long",
    )
    watched = [s for s in specs if s.token in widenable]
    if not watched:
        return {}
    parse_schema = T.StructType(
        [T.StructField(s.source, T.StringType(), True) for s in watched]
    )
    a = F.from_json(F.col("after_json"), parse_schema)
    aggs = []
    kinds: list[tuple[str, str]] = []
    for s in watched:
        raw = a.getField(s.source)
        d = raw.try_cast("double")
        lng = raw.try_cast("long")
        is_bool_word = F.lower(F.trim(raw)).isin(*_TRUE_SET, *_FALSE_SET)
        to_string = raw.isNotNull() & d.isNull() & ~is_bool_word
        # a value only double can hold: fractional ("2.5"), or beyond
        # long range ("9e99") — huge integral longs are NOT flagged
        # (their decimal string and the long→double cast round to the
        # same double, so the comparison stays quiet)
        to_double = d.isNotNull() & (
            lng.isNull() | (lng.cast("double") != d)
        )
        if s.token == "boolean":
            checks = [
                ("long", ~is_bool_word & lng.isNotNull()),
                ("double", ~is_bool_word & to_double),
            ]
        elif s.token == "long":
            checks = [("double", to_double)]
        else:  # double
            checks = []
        if include_string:
            checks.append(("string", to_string))
        for kind, cond in checks:
            aggs.append(
                F.max(cond.cast("int")).alias(f"_w{len(aggs)}")
            )
            kinds.append((s.col, kind))
    row = df.agg(*aggs).first()
    rank = {"long": 1, "double": 2, "string": 3}
    out: dict[str, str] = {}
    for (col, kind), hit in zip(kinds, row):
        if hit:
            if col not in out or rank[kind] > rank[out[col]]:
                out[col] = kind
    return out
