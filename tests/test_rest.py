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


# ---- live HTTP client (make_http_fetch) against a local socket server ----


class _FakeRestHandler:
    """HubSpot-shaped paginated JSON endpoint with a scripted one-shot
    429 + Retry-After (base_stream.go:341-409 semantics)."""


def _start_fake_server(rows, *, rate_limit_on_call=None, retry_after="2"):
    import http.server
    import threading

    state = {"calls": 0}

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            from urllib.parse import parse_qs, urlparse

            state["calls"] += 1
            if state["calls"] == rate_limit_on_call:
                self.send_response(429)
                self.send_header("Retry-After", retry_after)
                self.end_headers()
                return
            q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
            sel = rows
            if "cursor_gt" in q:
                sel = [r for r in sel if r["updated"] > int(q["cursor_gt"])]
            start = int(q.get("after") or 0)
            limit = int(q.get("limit") or 100)
            page = sel[start : start + limit]
            nxt = start + limit
            body = {"results": page}
            if nxt < len(sel):
                body["paging"] = {"next": {"after": str(nxt)}}
            payload = __import__("json").dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, state


def test_http_fetch_drains_pages_over_real_socket():
    from gear5_spark.sources.rest import make_http_fetch

    rows = [{"id": i, "updated": 1000 + i} for i in range(350)]
    srv, state = _start_fake_server(rows)
    try:
        fetch = make_http_fetch(f"http://127.0.0.1:{srv.server_address[1]}/v1")
        stream = RestStream("hub", "contacts", cursor_field="updated",
                            page_size=100)
        got = fetch_records(fetch, stream)
        assert [r["id"] for r in got] == [r["id"] for r in rows]
        assert state["calls"] == 4  # 100+100+100+50
        # cursor params reach the wire: incremental re-read returns the tail
        got2 = fetch_records(fetch, stream, cursor_start=1339)
        assert [r["id"] for r in got2] == [r["id"] for r in rows[340:]]
    finally:
        srv.shutdown()


def test_http_fetch_honors_retry_after_header():
    from gear5_spark.sources.rest import make_http_fetch

    rows = [{"id": i, "updated": 1000 + i} for i in range(120)]
    srv, state = _start_fake_server(rows, rate_limit_on_call=2,
                                    retry_after="3")
    try:
        fetch = make_http_fetch(f"http://127.0.0.1:{srv.server_address[1]}/v1")
        stream = RestStream("hub", "contacts", cursor_field="updated",
                            page_size=100)
        slept = []
        got = fetch_records(fetch, stream, sleep=slept.append)
        assert [r["id"] for r in got] == [r["id"] for r in rows]
        assert slept == [3.0]  # the server's Retry-After, not a guess
        assert stream.stats["retries"] == 1
    finally:
        srv.shutdown()


def test_retry_after_http_date_form_parsed():
    """RFC 7231 allows Retry-After as delta-seconds OR an HTTP-date;
    real proxies emit the date form. It must map to a positive sleep,
    not float()-fail to an immediate-retry burst."""
    import time as _time
    from email.utils import formatdate

    from gear5_spark.sources.rest import _parse_retry_after

    assert _parse_retry_after("7") == 7.0
    assert _parse_retry_after(None) == 0.0
    assert _parse_retry_after("garbled") == 0.0
    future = formatdate(_time.time() + 30, usegmt=True)
    got = _parse_retry_after(future)
    assert 25.0 < got <= 31.0
    past = formatdate(_time.time() - 30, usegmt=True)
    assert _parse_retry_after(past) == 0.0  # clamped, never negative


def test_http_fetch_non_retryable_error_propagates():
    import urllib.error

    from gear5_spark.sources.rest import make_http_fetch

    import http.server
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(500)
            self.end_headers()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        fetch = make_http_fetch(f"http://127.0.0.1:{srv.server_address[1]}/v1")
        stream = RestStream("hub", "contacts")
        with pytest.raises(urllib.error.HTTPError):
            fetch_records(fetch, stream)
        assert stream.stats["retries"] == 0  # 500 is not the 429 path
    finally:
        srv.shutdown()


def test_http_fetch_bare_array_body():
    # Sheets-style value dump: a bare JSON array is one page, no cursor
    import http.server
    import threading

    from gear5_spark.sources.rest import make_http_fetch

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            payload = b'[{"A": "1", "B": "x"}, {"A": "2", "B": "y"}]'
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        fetch = make_http_fetch(f"http://127.0.0.1:{srv.server_address[1]}/v")
        page = fetch({"limit": 100, "after": None})
        assert page.next_after is None
        assert page.records == [{"A": "1", "B": "x"}, {"A": "2", "B": "y"}]
    finally:
        srv.shutdown()


def test_retry_after_sleep_is_capped():
    """A lying server ("Retry-After: 9999999999", or an HTTP-date years
    out) must not park the worker: parse clamps to RETRY_AFTER_CAP_SEC,
    and the retry loop clamps again for custom FetchFns that raise
    RateLimited with arbitrary values."""
    from gear5_spark.sources.rest import (
        RETRY_AFTER_CAP_SEC,
        RateLimited,
        _fetch_with_retry,
        _parse_retry_after,
    )

    assert _parse_retry_after("9999999999") == RETRY_AFTER_CAP_SEC
    # HTTP-date a year in the future clamps too
    import email.utils
    import time as _time

    future = email.utils.formatdate(_time.time() + 365 * 86400, usegmt=True)
    assert _parse_retry_after(future) == RETRY_AFTER_CAP_SEC
    assert _parse_retry_after("2") == 2.0
    assert _parse_retry_after(None) == 0.0

    # custom fetch raising an unclamped RateLimited: the loop clamps
    slept = []
    calls = {"n": 0}

    def fetch(params):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RateLimited(retry_after_sec=10**12)
        return Page(records=[], next_after=None)

    stream = RestStream("ns", "s")
    _fetch_with_retry(fetch, {}, stream, sleep=slept.append)
    assert slept == [RETRY_AFTER_CAP_SEC]


def test_http_fetch_scalar_body_raises_cleanly():
    # a JSON scalar/null body (misconfigured URL, stringified error
    # page) must fail with a diagnosis, not AttributeError
    import http.server
    import threading

    from gear5_spark.sources.rest import make_http_fetch

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            payload = b'"oops"'
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        fetch = make_http_fetch(f"http://127.0.0.1:{srv.server_address[1]}/v")
        with pytest.raises(ValueError, match="JSON str body"):
            fetch({"limit": 1, "after": None})
    finally:
        srv.shutdown()


def test_http_fetch_non_list_records_raises_cleanly():
    # schema drift / error pages: a dict under the records key would
    # iterate as its KEYS, a string as characters — both must fail with
    # a diagnosis instead of flowing into createDataFrame as garbage
    import http.server
    import threading

    from gear5_spark.sources.rest import make_http_fetch

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            payload = b'{"results": "internal error"}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        fetch = make_http_fetch(f"http://127.0.0.1:{srv.server_address[1]}/v")
        with pytest.raises(ValueError, match="expected an array"):
            fetch({"limit": 1, "after": None})
    finally:
        srv.shutdown()


def test_flat_associations_reference_shape():
    # the exact transformation documented in base_stream.go:297-316
    from gear5_spark.sources.rest import flat_associations

    recs = [
        {
            "id": 1,
            "associations": {
                "contacts": {
                    "results": [
                        {"id": "201", "type": "company_to_contact"},
                        {"id": "251", "type": "company_to_contact"},
                    ]
                },
                "deal items": {"results": [{"id": "9"}]},
            },
        },
        {"id": 2},  # no associations: passes through untouched
        {
            "id": 3,
            "associations": {
                "contacts": "garbage",          # non-dict association
                "deals": {"results": "nope"},   # non-list results
                "tickets": {},                  # missing results
                "notes": {"results": [3, {"id": "7"}, {"x": 1}]},
            },
        },
    ]
    before = [dict(r) for r in recs]
    out = flat_associations(recs)
    assert out[0] == {"id": 1, "contacts": ["201", "251"],
                      "deal_items": ["9"]}
    assert out[1] == {"id": 2}
    # malformed shapes degrade to empty id arrays, never crash
    assert out[2] == {"id": 3, "contacts": [], "deals": [],
                      "tickets": [], "notes": ["7"]}
    # caller's page list is not mutated
    assert recs == before


def test_read_paginated_flattens_associations(spark):
    from gear5_spark.sources.rest import Page as _Page

    def fetch(params):
        return _Page(records=[
            {"id": 1, "associations": {
                "contacts": {"results": [{"id": "201"}, {"id": "251"}]}}},
            {"id": 2, "associations": {
                "contacts": {"results": []}}},
        ], next_after=None)

    stream = RestStream("hub", "companies", page_size=100)
    df, _ = read_paginated(spark, fetch, stream,
                           flatten_associations=True)
    rows = {r["id"]: r for r in (x.asDict() for x in df.collect())}
    assert "associations" not in df.columns
    assert rows[1]["contacts"] == ["201", "251"]
    assert rows[2]["contacts"] == []
