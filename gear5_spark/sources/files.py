"""File-based sources: glob listing + mtime-incremental reads (S7/S9).

The reference's S3 driver hand-rolls object listing with glob matching and
pagination (``/root/reference/drivers/s3/internal/s3.go:186-281``), a
parquet row-group reader (``reader/parquet.go``), and an incremental mode
that skips objects older than a ``last_modified_date`` cursor
(``s3.go:114-184``). All three are Spark built-ins:

- glob listing  -> Spark's file index expands the glob in the path (P7);
- parquet read  -> the vectorized parquet datasource (S8);
- mtime cursor  -> the ``modifiedAfter`` read option, or (streaming) the
  file-source checkpoint which tracks seen files exactly (S9).

This module wraps them with the reference's cursor-state bookkeeping so a
batch scheduler can run the same "only new files" contract.
"""

from __future__ import annotations

import datetime as dt
import glob as globmod
import os
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from gear5_spark.pipeline.state import CursorStateStore

MTIME_CURSOR_FIELD = "last_modified_date"  # hardcoded in reference s3.go:59


def list_files(pattern: str) -> list[tuple[str, dt.datetime]]:
    """Glob listing with mtimes (driver-side; Spark's file index does the
    same distributed for real object stores)."""
    out = []
    for p in sorted(globmod.glob(pattern, recursive=True)):
        if os.path.isfile(p):
            out.append(
                (p, dt.datetime.fromtimestamp(os.path.getmtime(p), dt.timezone.utc))
            )
    return out


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    pattern: str | None = None,
    modified_after: dt.datetime | None = None,
    schema=None,
    recursive: bool = True,
) -> DataFrame:
    """Batch read with glob + optional mtime predicate, all pushed to the
    datasource (no manual pagination/preload — S3/S8 built-ins).
    ``recursive`` mirrors the reference's prefix listing (any depth under
    the prefix, drivers/s3/internal/s3.go:186-281)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    if modified_after is not None:
        # fractional seconds ARE honored (stringToTimestamp); truncating
        # to whole seconds here would re-read up to a second of files.
        # The cursor is UTC (list_files/getmtime) — say so explicitly:
        # a zone-less string would be interpreted in the SESSION timezone
        # and silently skip (or re-read) hours of files on non-UTC
        # deployments.
        if modified_after.tzinfo is None:
            modified_after = modified_after.replace(tzinfo=dt.timezone.utc)
        reader = reader.option(
            "modifiedAfter",
            modified_after.astimezone(dt.timezone.utc).strftime(
                "%Y-%m-%dT%H:%M:%S.%f+00:00"
            ),
        )
    return reader.format(fmt).load(path)


def incremental_files(
    spark: SparkSession,
    state: CursorStateStore,
    namespace: str,
    stream: str,
    path: str,
    fmt: str = "parquet",
    pattern: str | None = None,
    schema=None,
) -> tuple[DataFrame, Callable[[], Any]]:
    """S9: only files newer than the stored mtime cursor; commit() folds
    the max seen mtime into state after the downstream write succeeds."""
    cur = state.get(namespace, stream)
    # taken BEFORE Spark lists the files: any file whose observed mtime
    # exceeds this instant was (or may have been) modified after the
    # listing froze its length, so its recorded cursor contribution is
    # clamped to t0 — strictly below the modification's real mtime —
    # and the next sync re-reads it (at-least-once, never skipped)
    t0 = dt.datetime.now(dt.timezone.utc)
    df = read_files(
        spark, path, fmt=fmt, pattern=pattern, modified_after=cur, schema=schema
    )
    # cursor from the files the DataFrame actually READ (plan file
    # index), never a fresh listing: a file landing between the read
    # and the commit must stay AHEAD of the cursor for the next sync
    # (a live re-listing would fold it in and skip it forever). The
    # mtimes are snapshotted HERE and clamped to t0: a file appended
    # after the listing keeps a cursor entry below its new mtime
    # (getmtime at commit time would fold the new mtime in and skip
    # the unsynced append forever)
    from urllib.parse import unquote, urlparse

    listed_mtimes: list[dt.datetime] = []
    skipped_remote = 0
    for uri in df.inputFiles():
        if "://" in uri and not uri.startswith("file:"):
            # non-local store (s3a://, gs://, ...): no os-level mtime.
            # Contributing nothing keeps the cursor BEHIND (safe —
            # re-read, never skip), but silently re-reading everything
            # forever is an operational trap: say so loudly.
            skipped_remote += 1
            continue
        p = unquote(urlparse(uri).path) if uri.startswith("file:") else uri
        try:
            listed_mtimes.append(
                min(
                    dt.datetime.fromtimestamp(
                        os.path.getmtime(p), dt.timezone.utc
                    ),
                    t0,
                )
            )
        except OSError:
            continue
    if skipped_remote:
        __import__("logging").getLogger("gear5_spark.sources.files").warning(
            "incremental_files: %d non-local URIs have no os mtime — the "
            "cursor cannot advance past them and every sync will re-read "
            "them. Bind a store-native listing (LastModified) for object "
            "stores, or use stream_files (exact checkpoint).",
            skipped_remote,
        )

    def commit() -> Any:
        newest = max(listed_mtimes, default=None)
        if newest is not None:
            # Spark compares file mtimes at MILLISECOND precision; store
            # the newest mtime floored to its millisecond. The consumed
            # newest file is never re-read (mtime == cursor), and only a
            # file landing in the SAME millisecond after this listing
            # could be skipped — a sub-ms race, 1000x tighter than the
            # previous ceil-to-next-second behavior (which skipped
            # same-second files forever; the reference's whole-second
            # cursor has that gap too, s3.go:135-139). The streaming
            # variant's checkpoint is exact — use it for feeds where the
            # sub-ms race matters.
            newest = newest.replace(
                microsecond=(newest.microsecond // 1000) * 1000,
                tzinfo=None,
            )
        return state.advance(namespace, stream, MTIME_CURSOR_FIELD, newest)

    return df, commit


def stream_files(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    pattern: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming variant: the checkpoint tracks exactly which files were
    consumed — strictly stronger than the reference's mtime cursor (two
    files in the same second can't be missed)."""
    reader = spark.readStream.schema(schema)
    # parity with read_files' default recursive listing: without this a
    # nested layout (root/yyyy/mm/dd/part-*.parquet) is silently read
    # shallow by the streaming variant only
    reader = reader.option("recursiveFileLookup", "true")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.format(fmt).load(path)
