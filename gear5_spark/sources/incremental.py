"""Cursor-incremental reads of plain tables — the non-CDC sync path.

Re-expresses the reference's sync modes (``/root/reference/types/
stream.go:23-33``: FULLREFRESH / INCREMENTAL / CDC; postgres SQL shapes at
``pkg/jdbc/jdbc.go:22-35``, sync loops ``drivers/postgres/internal/
sync.go:19-100``) as declarative DataFrame reads:

- full refresh  = ``spark.read`` of the table (Catalyst handles
  parallelism — no hand-chunked Reader loop, SURVEY.md S3);
- incremental   = ``filter(cursor > state)`` — the predicate reaches the
  parquet/JDBC scan via pushdown (P3);
- state advance = ``agg(max(cursor))`` per sync, folded into
  :class:`~gear5_spark.pipeline.state.CursorStateStore` (A1).

``IncrementalSource`` is this engine's "connector interface"
(``protocol/interface.go:7-54``): anything that yields a DataFrame plus a
cursor column participates.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gear5_spark.pipeline.state import CursorStateStore

_log = __import__("logging").getLogger("gear5_spark.sources.incremental")
_OBS_PROBE_WARNED = False


def _observation_ran(obs) -> bool | None:
    """Non-blocking "did the caller's action run?" probe. PySpark exposes
    no documented non-blocking accessor, so this reaches for the JVM
    handle's ``getOrEmpty``; a rename across Spark versions must degrade
    LOUDLY (warn once, return None) rather than silently into the
    re-scan fallback, which can advance the cursor past unsynced rows on
    a live source."""
    global _OBS_PROBE_WARNED
    try:
        return not obs._jo.getOrEmpty().isEmpty()
    except Exception as e:
        if not _OBS_PROBE_WARNED:
            _OBS_PROBE_WARNED = True
            _log.warning(
                "Observation non-blocking probe unavailable (%s: %s) — "
                "commit() will re-execute the cursor aggregate against "
                "the source; on a LIVE source this can advance the "
                "cursor past rows the downstream write never saw. "
                "Ensure commit() is called only after the full write "
                "action, or pin a PySpark version with Observation._jo.",
                type(e).__name__,
                e,
            )
        return None


@dataclass
class IncrementalSource:
    """One configured stream: where it lives + key/cursor metadata
    (≈ types/stream_configured.go:10-25)."""

    namespace: str
    stream: str
    load: Callable[[SparkSession], DataFrame]
    cursor_field: str | None = None
    primary_key: list[str] | None = None
    exclude_columns: list[str] | None = None

    @classmethod
    def parquet(
        cls,
        namespace: str,
        stream: str,
        path: str,
        cursor_field: str | None = None,
        primary_key: list[str] | None = None,
        exclude_columns: list[str] | None = None,
    ) -> "IncrementalSource":
        return cls(
            namespace=namespace,
            stream=stream,
            load=lambda spark: spark.read.parquet(path),
            cursor_field=cursor_field,
            primary_key=primary_key,
            exclude_columns=exclude_columns,
        )

    def full_refresh(self, spark: SparkSession) -> DataFrame:
        """S1: full table scan (ordered reads are unnecessary in Spark —
        the reference orders by PK only for resumable chunking)."""
        df = self.load(spark)
        if self.exclude_columns:
            df = df.drop(*self.exclude_columns)  # P2 (ref declares, TODOs)
        return df

    def incremental(
        self, spark: SparkSession, state: CursorStateStore
    ) -> tuple[DataFrame, Callable[[], Any]]:
        """S2: rows with cursor > stored state. Returns (df, commit_fn);
        call ``commit_fn()`` after the downstream write succeeds to fold
        max(cursor) into the state store — write-then-ack, the same
        ordering the reference uses for its LSN ack (waljs.go:252-257).
        """
        if not self.cursor_field:
            raise ValueError(f"{self.namespace}.{self.stream} has no cursor")
        df = self.full_refresh(spark)
        cur = state.get(self.namespace, self.stream)
        if cur is not None:
            df = df.filter(F.col(self.cursor_field) > F.lit(cur))
        # the cursor must come from the rows the caller actually CONSUMED:
        # re-executing the read at commit time would re-query a live
        # source, and rows landing between the downstream write and the
        # commit would advance the cursor past data never synced. The
        # Observation rides the caller's own action; the re-scan fallback
        # only fires when no action ran (frozen sources re-read the same
        # snapshot, so it stays correct there).
        import uuid as _uuid

        from pyspark.sql import Observation

        obs = Observation(f"inc-cursor-{_uuid.uuid4().hex[:8]}")
        df = df.observe(obs, F.max(self.cursor_field).alias("m"))

        def commit() -> Any:
            observed = _observation_ran(obs)
            if observed:
                m = obs.get["m"]
            else:
                if observed is None:
                    _log.warning(
                        "%s.%s: falling back to re-scan cursor aggregate "
                        "(Observation probe unavailable)",
                        self.namespace,
                        self.stream,
                    )
                m = df.agg(F.max(self.cursor_field).alias("m")).first()["m"]
            return state.advance(
                self.namespace, self.stream, self.cursor_field, m
            )

        return df, commit


def validate_streams(
    spark: SparkSession, sources: list[IncrementalSource]
) -> list[str]:
    """P1: startup validation — cursor/PK columns must exist in the source
    schema (≈ protocol/read.go:100-123, stream_configured.go:135-148).
    Returns a list of human-readable problems (empty = valid)."""
    problems = []
    for s in sources:
        try:
            cols = set(s.load(spark).columns)
        except Exception as e:  # unreadable source ≈ stream missing
            problems.append(f"{s.namespace}.{s.stream}: unreadable ({e})")
            continue
        if s.cursor_field and s.cursor_field not in cols:
            problems.append(
                f"{s.namespace}.{s.stream}: cursor {s.cursor_field} not in schema"
            )
        for k in s.primary_key or []:
            if k not in cols:
                problems.append(
                    f"{s.namespace}.{s.stream}: pk column {k} not in schema"
                )
        for c in s.exclude_columns or []:
            if c in (s.primary_key or []):
                problems.append(
                    f"{s.namespace}.{s.stream}: cannot exclude pk column {c}"
                )
    return problems
