"""Paginated REST-style source adapter (the S10/S11 pattern, network-free).

The reference ships two REST drivers whose *incremental machinery* — not
their HTTP specifics — is what an ingest engine needs:

- cursor pagination via a ``paging.next.after`` token
  (``/root/reference/drivers/hubspot/internal/base_stream.go:179-212``);
- bounded retries honoring ``Retry-After`` on 429
  (``base_stream.go:341-409``: 3 attempts);
- the 10k-result search-window restart: when the API refuses to page
  past its cap, restart the query with ``cursor > last seen value``
  (``crm_stream.go:93-148``, restart at ``:136-143``);
- page-size bounds (100-1000, ``base_stream.go:67``) and all-string
  row typing for schemaless feeds (Sheets,
  ``drivers/google-sheets/internal/utils.go:187-196``).

This module implements exactly that protocol over a PLUGGABLE ``fetch``
callable (this sandbox has no network; tests drive it with an in-memory
API). Pagination is inherently serial per stream — driver-side by design;
scale comes from running many streams concurrently and from everything
AFTER ``createDataFrame`` being distributed.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from gear5_spark.pipeline.state import CursorStateStore


class RateLimited(Exception):
    """Fetch hit a rate limit; retry after ``retry_after_sec``
    (the 429 + Retry-After contract, base_stream.go:356-380)."""

    def __init__(self, retry_after_sec: float = 0.0):
        super().__init__(f"rate limited, retry after {retry_after_sec}s")
        self.retry_after_sec = retry_after_sec


@dataclass
class Page:
    """One fetch result: records + the next-page token (None = last page)."""

    records: list[dict]
    next_after: str | None = None


# fetch(params) -> Page; params carry after/limit/cursor_field/cursor_gt
FetchFn = Callable[[dict[str, Any]], Page]


# hard upper bound on a single Retry-After sleep: attempt counting bounds
# the NUMBER of retries but not their DURATION — a lying/buggy server
# ("Retry-After: 9999999999", or an HTTP-date years out) would otherwise
# park the worker for centuries on a single sleep. Real rate-limit windows
# are seconds; anything past this cap is treated as the cap.
RETRY_AFTER_CAP_SEC = 300.0


def _parse_retry_after(value: str | None) -> float:
    """``Retry-After`` -> seconds, clamped to ``RETRY_AFTER_CAP_SEC``.
    RFC 7231 allows delta-seconds OR an HTTP-date; real APIs and proxies
    emit both. Garbled/missing -> 0 (retry loop still counts attempts,
    so a lying server cannot spin forever — and the cap bounds each
    individual sleep, so it cannot stall forever either)."""
    if not value:
        return 0.0
    try:
        return min(RETRY_AFTER_CAP_SEC, max(0.0, float(value)))
    except ValueError:
        pass
    try:
        from email.utils import parsedate_to_datetime

        dt = parsedate_to_datetime(value)
        return min(RETRY_AFTER_CAP_SEC, max(0.0, dt.timestamp() - time.time()))
    except (ValueError, TypeError):
        return 0.0


def make_http_fetch(
    url: str,
    *,
    headers: dict[str, str] | None = None,
    timeout_sec: float = 30.0,
    records_key: str = "results",
    next_after_path: tuple[str, ...] = ("paging", "next", "after"),
) -> FetchFn:
    """Default LIVE fetch: a stdlib-urllib client implementing the
    pluggable ``FetchFn`` contract against a real JSON-over-HTTP
    endpoint.

    Maps the reference driver's wire behavior
    (``drivers/hubspot/internal/base_stream.go:341-409``) onto this
    module's protocol: request params go as query-string fields
    (None values omitted), a ``429`` response raises :class:`RateLimited`
    carrying the ``Retry-After`` header so ``_fetch_with_retry`` sleeps
    exactly what the server asked — both RFC 7231 forms are honored
    (delta-seconds and HTTP-date; missing/garbled header -> 0), any
    other HTTP error propagates (fail-fast, same as the reference's
    non-retryable path), and every request carries a hard
    ``timeout_sec`` so a hung endpoint cannot stall the pipeline.

    The response body may be a HubSpot-shaped object
    (``{"results": [...], "paging": {"next": {"after": ...}}}`` —
    ``base_stream.go:179-212``; key names configurable via
    ``records_key`` / ``next_after_path``) or a bare JSON array
    (Sheets-style value dump: one page, no cursor).

    Pagination stays serial per stream by design — scale comes from
    many streams in parallel and from everything after
    ``createDataFrame`` being distributed (module docstring)."""

    def fetch(params: dict[str, Any]) -> Page:
        q = {k: str(v) for k, v in params.items() if v is not None}
        full = url + ("?" + urllib.parse.urlencode(q) if q else "")
        req = urllib.request.Request(
            full, headers={"Accept": "application/json", **(headers or {})}
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout_sec) as resp:
                body = json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code == 429:
                raise RateLimited(
                    retry_after_sec=_parse_retry_after(
                        e.headers.get("Retry-After")
                    )
                ) from e
            raise
        if isinstance(body, list):
            return Page(records=body, next_after=None)
        if not isinstance(body, dict):
            # a scalar/null JSON body (misconfigured URL, error page
            # serialized as a bare string) would otherwise surface as
            # AttributeError deep in the paging walk — fail with the
            # actual diagnosis instead
            raise ValueError(
                f"endpoint {url} returned a JSON {type(body).__name__} "
                "body; expected an object or array"
            )
        node: Any = body
        for k in next_after_path:
            node = node.get(k) if isinstance(node, dict) else None
            if node is None:
                break
        nxt = None if node is None else str(node)
        records = body.get(records_key)
        if records is None:
            records = []
        elif not isinstance(records, list):
            # a dict would iterate as its keys, a string as characters —
            # garbage rows with no error. Same fail-fast contract as the
            # non-object body guard above.
            raise ValueError(
                f"endpoint {url} returned a JSON "
                f"{type(records).__name__} under {records_key!r}; "
                "expected an array of records"
            )
        return Page(records=records, next_after=nxt)

    return fetch


@dataclass
class RestStream:
    namespace: str
    name: str
    primary_key: str = "id"
    cursor_field: str | None = None
    page_size: int = 100  # base_stream.go:67 default
    search_cap: int = 10_000  # crm_stream.go:136-143 window
    max_retries: int = 3  # base_stream.go:356
    max_records: int | None = None  # O3: sample/page limit
    stats: dict[str, int] = field(
        default_factory=lambda: {"pages": 0, "retries": 0, "restarts": 0}
    )


def _fetch_with_retry(
    fetch: FetchFn, params: dict, stream: RestStream, sleep=time.sleep
) -> Page:
    attempts = 0
    while True:
        try:
            return fetch(dict(params))
        except RateLimited as e:
            attempts += 1
            stream.stats["retries"] += 1
            if attempts >= stream.max_retries:
                raise
            # clamp again here: a custom FetchFn can raise RateLimited
            # with any value, bypassing _parse_retry_after's cap
            sleep(min(max(0.0, e.retry_after_sec), RETRY_AFTER_CAP_SEC))


def fetch_records(
    fetch: FetchFn,
    stream: RestStream,
    cursor_start: Any = None,
    sleep=time.sleep,
) -> list[dict]:
    """Drain the stream: cursor pagination + retry + search-window
    restarts. Records are returned in API order; the caller dedupes by
    primary key downstream (restarts can re-deliver boundary rows —
    at-least-once, same as the reference)."""
    out: list[dict] = []
    cursor_gt = cursor_start
    cursor_gte = None  # restart boundary: >= re-delivers ties (see below)
    after: str | None = None
    window_seen = 0
    seen_max = None  # running max cursor — O(page), never re-scans `out`
    while True:
        params: dict[str, Any] = {"limit": stream.page_size, "after": after}
        if stream.cursor_field is not None:
            params["cursor_field"] = stream.cursor_field
            if cursor_gte is not None:
                params["cursor_gte"] = cursor_gte
            else:
                params["cursor_gt"] = cursor_gt
        page = _fetch_with_retry(fetch, params, stream, sleep=sleep)
        stream.stats["pages"] += 1
        out.extend(page.records)
        window_seen += len(page.records)
        if stream.cursor_field is not None and page.records:
            page_max = max(r[stream.cursor_field] for r in page.records)
            seen_max = page_max if seen_max is None else max(seen_max, page_max)
        if stream.max_records is not None and len(out) >= stream.max_records:
            return out[: stream.max_records]
        if page.next_after is None:
            return out
        if (
            stream.cursor_field is not None
            and window_seen + stream.page_size > stream.search_cap
        ):
            # the API will refuse to page past its result cap: restart
            # the search from the newest cursor value seen so far
            # (crm_stream.go:136-143). The restart filter is >=, not >:
            # unfetched rows SHARING the boundary cursor value would be
            # dropped forever under strict >, breaking the at-least-once
            # contract (ties are re-delivered and deduped downstream).
            boundary = seen_max
            if boundary is not None and (
                cursor_gte is None or boundary > cursor_gte
            ):
                cursor_gte = boundary
                after = None
                window_seen = 0
                stream.stats["restarts"] += 1
                continue
            # boundary did not advance since the last restart: more than
            # search_cap rows share one cursor value (bulk imports with
            # identical timestamps), so a gte-restart would refetch the
            # same window forever. Keep paging via ``after`` past the
            # advertised cap for this one value — ``after`` advances per
            # page, so progress is guaranteed; the first page bearing a
            # newer cursor value re-arms the restart path above.
            stream.stats["cap_overruns"] = (
                stream.stats.get("cap_overruns", 0) + 1
            )
        after = page.next_after


def flat_associations(records: list[dict]) -> list[dict]:
    """Flatten nested CRM association maps into plain id arrays — parity
    with ``flatAssociations`` (base_stream.go:297-339), which turns

        {"associations": {"contacts": {"results":
            [{"id": "201", "type": "company_to_contact"},
             {"id": "251", "type": "company_to_contact"}]}}}

    into ``{"contacts": ["201", "251"]}``. Matching the reference
    exactly: the ``associations`` key is removed whenever present; each
    association name becomes a top-level column (spaces -> ``_``) whose
    value is the list of result ids — ALWAYS a list, empty when the
    nested shape is missing or malformed (non-dict association, absent
    ``results``, non-list ``results``); non-dict entries inside
    ``results`` are skipped. Records without ``associations`` pass
    through untouched. Runs driver-side on the fetched page list (the
    serial-pagination stage); everything after ``createDataFrame``
    stays distributed."""
    out: list[dict] = []
    for record in records:
        if "associations" in record:
            record = dict(record)  # never mutate the caller's page
            value = record.pop("associations")
            if isinstance(value, dict):
                for name, assoc in value.items():
                    ids: list[Any] = []
                    if isinstance(assoc, dict):
                        results = assoc.get("results")
                        if isinstance(results, list):
                            ids = [
                                row["id"]
                                for row in results
                                if isinstance(row, dict) and "id" in row
                            ]
                    record[name.replace(" ", "_")] = ids
        out.append(record)
    return out


def read_paginated(
    spark: SparkSession,
    fetch: FetchFn,
    stream: RestStream,
    state: CursorStateStore | None = None,
    all_string: bool = False,
    flatten_associations: bool = False,
    sleep=time.sleep,
) -> tuple[DataFrame, Callable[[], Any]]:
    """Incremental REST read -> DataFrame + a ``commit()`` that folds the
    max cursor into state after the downstream write succeeds (the same
    contract as ``sources.incremental``). ``all_string=True`` applies
    the Sheets all-string schema (utils.go:187-196);
    ``flatten_associations=True`` applies the CRM association
    denormalization (base_stream.go:297-339) before the DataFrame is
    built, so association ids land as array columns."""
    cur = state.get(stream.namespace, stream.name) if state else None
    records = fetch_records(fetch, stream, cursor_start=cur, sleep=sleep)
    if flatten_associations:
        records = flat_associations(records)
    if records:
        if all_string:
            keys = sorted({k for r in records for k in r})
            rows = [tuple(
                None if r.get(k) is None else str(r.get(k)) for k in keys
            ) for r in records]
            df = spark.createDataFrame(
                rows, ", ".join(f"`{k}` string" for k in keys)
            )
        else:
            df = spark.createDataFrame(records)  # type: ignore[arg-type]
    else:
        df = spark.createDataFrame([], "`__empty` string").limit(0)

    def commit() -> Any:
        if state is None or stream.cursor_field is None or not records:
            return cur
        newest = max(r[stream.cursor_field] for r in records)
        return state.advance(
            stream.namespace, stream.name, stream.cursor_field, newest
        )

    return df, commit
