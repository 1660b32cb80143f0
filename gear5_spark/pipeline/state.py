"""Cursor state for the non-CDC incremental path (FIXTURES.md §5).

The reference keeps per-stream cursor state in a mutex-guarded ``State``
struct serialized to a JSON file every batch
(``/root/reference/types/state.go:64-70``,
``types/stream_configured.go:94-124``). Spark-side the streaming checkpoint
covers the CDC feed; this store covers *cursor-incremental* reads of plain
tables (SURVEY.md S2): a small JSON-file-backed map
``(namespace, stream) -> {cursor_field, cursor_value}`` with atomic
replace-on-write, plus a DataFrame view for inspection.

Cursor values are stored as ISO/decimal strings with their type tag so
TIMESTAMP and INT64 cursors round-trip exactly
(``typeutils/datatype.go:42-78`` MaximumOnDataType semantics).
"""

from __future__ import annotations

import datetime as dt
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("namespace", T.StringType(), False),
        T.StructField("stream", T.StringType(), False),
        T.StructField("cursor_field", T.StringType(), False),
        T.StructField("cursor_value", T.StringType(), True),
        T.StructField("cursor_type", T.StringType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)


def _encode(v: Any) -> tuple[str | None, str]:
    import decimal as _decimal

    if v is None:
        return None, "null"
    if isinstance(v, dt.datetime):
        return v.isoformat(), "timestamp"
    # date/Decimal must round-trip TYPED: the string fallback would make
    # the next advance() compare date-vs-str and crash the sync forever
    # (MaximumOnDataType semantics require same-type comparison)
    if isinstance(v, dt.date):
        return v.isoformat(), "date"
    if isinstance(v, _decimal.Decimal):
        return str(v), "decimal"
    if isinstance(v, bool):
        return str(v).lower(), "bool"
    if isinstance(v, int):
        return str(v), "int64"
    if isinstance(v, float):
        return repr(v), "float64"
    return str(v), "string"


def _decode(s: str | None, t: str) -> Any:
    import decimal as _decimal

    if s is None or t == "null":
        return None
    if t == "timestamp":
        return dt.datetime.fromisoformat(s)
    if t == "date":
        return dt.date.fromisoformat(s)
    if t == "decimal":
        return _decimal.Decimal(s)
    if t == "int64":
        return int(s)
    if t == "float64":
        return float(s)
    if t == "bool":
        return s == "true"
    return s


class CursorStateStore:
    """File-backed per-stream cursor map with atomic writes."""

    def __init__(self, path: str, backend=None):
        from gear5_spark.lake.backend import PosixBackend

        self.path = path
        # same pluggable write primitive as the lake's commit protocol
        # (lake/backend.py): newest-wins durable replace
        self.backend = backend or PosixBackend()

    def _load(self) -> dict[str, dict[str, Any]]:
        if os.path.exists(self.path):
            with open(self.path) as fh:
                return json.load(fh)
        return {}

    def _save(self, data: dict[str, dict[str, Any]]) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        self.backend.put_replace(
            self.path, json.dumps(data, indent=2, sort_keys=True).encode()
        )

    @staticmethod
    def _key(namespace: str, stream: str) -> str:
        # namespace.name stream identifier (utils/utils.go:151-157)
        return f"{namespace}.{stream}"

    def get(self, namespace: str, stream: str) -> Any:
        entry = self._load().get(self._key(namespace, stream))
        if not entry:
            return None
        return _decode(entry.get("cursor_value"), entry.get("cursor_type", "string"))

    def advance(
        self, namespace: str, stream: str, cursor_field: str, value: Any
    ) -> Any:
        """Monotone cursor fold: state = max(state, value) (SURVEY.md A1,
        drivers/base/driver.go:24-46). Returns the stored value.

        The load-modify-save runs under an advisory file lock: two
        streams sharing one state file commit concurrently (the
        reference guards its shared State with a mutex,
        types/stream_configured.go:94-124) — without the lock the later
        save would resurrect the other stream's OLD cursor."""
        import fcntl

        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        with open(self.path + ".lock", "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            return self._advance_locked(namespace, stream, cursor_field, value)

    def _advance_locked(
        self, namespace: str, stream: str, cursor_field: str, value: Any
    ) -> Any:
        data = self._load()
        key = self._key(namespace, stream)
        current = None
        if key in data:
            current = _decode(
                data[key].get("cursor_value"), data[key].get("cursor_type", "string")
            )
        if value is None or (current is not None and value <= current):
            return current
        enc, enc_t = _encode(value)
        data[key] = {
            "namespace": namespace,
            "stream": stream,
            "cursor_field": cursor_field,
            "cursor_value": enc,
            "cursor_type": enc_t,
            "updated_at": dt.datetime.now(dt.timezone.utc).isoformat(),
        }
        self._save(data)
        return value

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = []
        for entry in self._load().values():
            rows.append(
                (
                    entry["namespace"],
                    entry["stream"],
                    entry["cursor_field"],
                    entry.get("cursor_value"),
                    entry.get("cursor_type"),
                    (
                        dt.datetime.fromisoformat(entry["updated_at"]).replace(
                            tzinfo=None
                        )
                        if entry.get("updated_at")
                        else None
                    ),
                )
            )
        return spark.createDataFrame(rows, _STATE_SCHEMA)
