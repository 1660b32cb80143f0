"""S10/S11 pagination pattern: cursor paging, Retry-After retries, the
10k search-window restart, incremental state — driven by an in-memory
fake API (no network in this sandbox; the protocol is the thing under
test, per /root/reference/drivers/hubspot/internal/base_stream.go)."""

from __future__ import annotations

import pytest

from gear5_spark.pipeline.state import CursorStateStore
from gear5_spark.sources.rest import (
    Page,
    RateLimited,
    RestStream,
    fetch_records,
    read_paginated,
)


class FakeApi:
    """In-memory paginated search API with a result-window cap and a
    one-shot rate limit."""

    def __init__(self, n=2500, cap=1000, limit_on_call=None):
        self.rows = [{"id": i, "updated": 1000 + i, "v": f"r{i}"} for i in range(n)]
        self.cap = cap
        self.calls = 0
        self.limit_on_call = limit_on_call

    def fetch(self, params):
        self.calls += 1
        if self.limit_on_call == self.calls:
            raise RateLimited(retry_after_sec=0)
        rows = self.rows
        if params.get("cursor_gt") is not None:
            rows = [r for r in rows if r["updated"] > params["cursor_gt"]]
        if params.get("cursor_gte") is not None:
            rows = [r for r in rows if r["updated"] >= params["cursor_gte"]]
        start = int(params["after"] or 0)
        if start >= self.cap:  # the API refuses to page past its window
            raise AssertionError("paged past the search cap")
        page = rows[start : start + params["limit"]]
        nxt = start + params["limit"]
        return Page(
            records=page,
            next_after=str(nxt) if nxt < len(rows) else None,
        )


def test_pagination_with_window_restarts():
    api = FakeApi(n=2500, cap=1000)
    stream = RestStream("hub", "contacts", cursor_field="updated",
                        page_size=100, search_cap=1000)
    got = fetch_records(api.fetch, stream)
    # every record arrives despite the 1000-result window (dedupe by pk)
    assert {r["id"] for r in got} == {r["id"] for r in api.rows}
    assert stream.stats["restarts"] >= 2
    assert stream.stats["pages"] == api.calls


def test_retry_after_rate_limit():
    api = FakeApi(n=300, cap=10_000, limit_on_call=2)
    stream = RestStream("hub", "deals", page_size=100)
    got = fetch_records(api.fetch, stream, sleep=lambda s: None)
    assert len(got) == 300
    assert stream.stats["retries"] == 1


def test_retries_exhausted_raise():
    def always_limited(params):
        raise RateLimited(0)

    stream = RestStream("hub", "deals", max_retries=3)
    with pytest.raises(RateLimited):
        fetch_records(always_limited, stream, sleep=lambda s: None)
    assert stream.stats["retries"] == 3


def test_max_records_sample_limit():
    api = FakeApi(n=2500, cap=10_000)
    stream = RestStream("hub", "contacts", page_size=100, max_records=250)
    got = fetch_records(api.fetch, stream)
    assert len(got) == 250
    assert api.calls == 3  # stops paging once the sample is filled


def test_incremental_sync_cycle(spark, tmp_path):
    api = FakeApi(n=500, cap=10_000)
    state = CursorStateStore(str(tmp_path / "s.json"))
    stream = RestStream("hub", "contacts", cursor_field="updated",
                        page_size=200)
    df, commit = read_paginated(spark, api.fetch, stream, state=state)
    assert df.count() == 500
    commit()
    # new rows land in the API; second sync fetches only those
    api.rows += [{"id": 9000 + i, "updated": 2000 + i, "v": "new"} for i in range(7)]
    df2, commit2 = read_paginated(spark, api.fetch, stream, state=state)
    assert df2.count() == 7
    assert {r["id"] for r in df2.collect()} == {9000 + i for i in range(7)}
    commit2()


def test_all_string_schema_sheets_semantics(spark):
    # Sheets rows are all-string (utils.go:187-196)
    api = FakeApi(n=5, cap=10_000)
    stream = RestStream("sheets", "tab1", page_size=10)
    df, _ = read_paginated(spark, api.fetch, stream, all_string=True)
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)
    assert df.filter("id = '3'").count() == 1


def test_tied_cursor_window_terminates():
    # >cap rows sharing ONE cursor value (bulk import with identical
    # timestamps): a gte-restart would refetch the same window forever.
    # The engine must detect the stuck boundary and keep paging via
    # `after` past the advertised cap for that one value.
    class TieApi(FakeApi):
        def fetch(self, params):
            self.calls += 1
            rows = self.rows
            if params.get("cursor_gt") is not None:
                rows = [r for r in rows if r["updated"] > params["cursor_gt"]]
            if params.get("cursor_gte") is not None:
                rows = [r for r in rows if r["updated"] >= params["cursor_gte"]]
            start = int(params["after"] or 0)
            page = rows[start : start + params["limit"]]
            nxt = start + params["limit"]
            return Page(records=page,
                        next_after=str(nxt) if nxt < len(rows) else None)

    api = TieApi(n=2500, cap=1000)
    for r in api.rows:
        r["updated"] = 1000  # every row shares the boundary cursor value
    stream = RestStream("hub", "contacts", cursor_field="updated",
                        page_size=100, search_cap=1000)
    got = fetch_records(api.fetch, stream)
    assert {r["id"] for r in got} == {r["id"] for r in api.rows}
    assert stream.stats.get("cap_overruns", 0) >= 1
    # exactly one restart arms the gte boundary; the stuck boundary is
    # then detected instead of looping
    assert stream.stats["restarts"] <= 1
    assert api.calls <= 60  # terminates promptly, no unbounded refetch


def test_tied_then_advancing_cursor_rearms_restart():
    # ties at the cap boundary, then newer rows: after the overrun pages
    # drain the tied value, a newer boundary re-arms the restart path
    class TieApi(FakeApi):
        def fetch(self, params):
            self.calls += 1
            rows = self.rows
            if params.get("cursor_gt") is not None:
                rows = [r for r in rows if r["updated"] > params["cursor_gt"]]
            if params.get("cursor_gte") is not None:
                rows = [r for r in rows if r["updated"] >= params["cursor_gte"]]
            start = int(params["after"] or 0)
            page = rows[start : start + params["limit"]]
            nxt = start + params["limit"]
            return Page(records=page,
                        next_after=str(nxt) if nxt < len(rows) else None)

    api = TieApi(n=3000, cap=1000)
    for i, r in enumerate(api.rows):
        r["updated"] = 1000 if i < 1500 else 2000 + i
    stream = RestStream("hub", "contacts", cursor_field="updated",
                        page_size=100, search_cap=1000)
    got = fetch_records(api.fetch, stream)
    assert {r["id"] for r in got} == {r["id"] for r in api.rows}
    assert stream.stats["restarts"] >= 2  # re-armed after the tie drains
