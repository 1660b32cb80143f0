"""Property-based as-of join equivalence: the union-window formulation
must match a brute-force per-row reference on ANY (key, ts) layout —
including equal timestamps across and within sides."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gear5_spark.operators.conversations import asof_join

BASE = dt.datetime(2024, 1, 1)


def _rows(draw_vals, side):
    return [
        (k, BASE + dt.timedelta(seconds=s), f"{side}{i}")
        for i, (k, s) in enumerate(draw_vals)
    ]


pairs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),
              st.integers(min_value=0, max_value=8)),
    min_size=1, max_size=8,
)


def _reference(left, right, strict):
    """Brute force: latest right row (by ts, then tag order) per left row."""
    out = {}
    for lk, lts, lid in left:
        best = None
        for rk, rts, rid in right:
            if rk != lk:
                continue
            if rts > lts or (strict and rts == lts):
                continue
            if best is None or rts > best[0]:
                best = (rts, rid)
        out[lid] = best[0] if best else None  # compare on ts (unique winner)
    return out


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(lv=pairs, rv=pairs, strict=st.booleans())
def test_asof_matches_reference(spark, lv, rv, strict):
    left = _rows(lv, "L")
    right = _rows(rv, "R")
    ldf = spark.createDataFrame(left, "k long, ts timestamp, lid string")
    rdf = spark.createDataFrame(
        [(k, ts, rid) for k, ts, rid in right],
        "k long, ts timestamp, rid string",
    )
    got = {
        r["lid"]: r["ts_asof"]
        for r in asof_join(ldf, rdf, on="k", strict=strict).collect()
    }
    want = _reference(left, right, strict)
    assert set(got) == {lid for _, _, lid in left}  # exactly left's rows
    assert got == want
