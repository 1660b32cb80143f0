"""Conversation-level analytics: render, stats, sessionize, as-of join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gear5_spark.operators.conversations import (
    asof_join,
    conversation_stats,
    gap_sessionize,
    render_conversations,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        ("c1", 0, "user", "hi", _ts("2024-01-01 10:00:00")),
        ("c1", 2, "user", "thanks", _ts("2024-01-01 10:02:00")),
        ("c1", 1, "assistant", "hello!", _ts("2024-01-01 10:01:00")),
        ("c2", 0, "user", "solo", _ts("2024-01-01 11:00:00")),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )


def test_render_orders_turns_within_conversation(turns):
    got = {
        r["conv_id"]: r
        for r in render_conversations(turns).collect()
    }
    assert got["c1"]["n_turns"] == 3
    assert got["c1"]["transcript"] == "user: hi\nassistant: hello!\nuser: thanks"
    assert got["c2"]["transcript"] == "user: solo"


def test_conversation_stats(turns):
    got = {r["conv_id"]: r for r in conversation_stats(turns).collect()}
    c1 = got["c1"]
    assert c1["n_turns"] == 3
    assert c1["n_roles"] == 2
    assert c1["total_chars"] == len("hi") + len("hello!") + len("thanks")
    assert c1["duration_s"] == 120
    assert got["c2"]["duration_s"] == 0


def test_gap_sessionize_splits_on_gap(spark):
    rows = [
        (1, _ts("2024-01-01 10:00:00")),
        (1, _ts("2024-01-01 10:10:00")),   # 10 min: same session
        (1, _ts("2024-01-01 11:00:00")),   # 50 min: new session
        (2, _ts("2024-01-01 10:00:00")),   # other key: own numbering
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["user_id"], r["ts"]): r["session_idx"]
        for r in gap_sessionize(df, gap_sec=1800).collect()
    }
    assert got[(1, _ts("2024-01-01 10:00:00"))] == 1
    assert got[(1, _ts("2024-01-01 10:10:00"))] == 1
    assert got[(1, _ts("2024-01-01 11:00:00"))] == 2
    assert got[(2, _ts("2024-01-01 10:00:00"))] == 1


def test_gap_boundary_is_exclusive(spark):
    # exactly gap_sec apart -> same session (> not >=), matching the SQL oracle
    rows = [(1, _ts("2024-01-01 10:00:00")), (1, _ts("2024-01-01 10:30:00"))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = gap_sessionize(df, gap_sec=1800).collect()
    assert {r["session_idx"] for r in out} == {1}


@pytest.fixture(scope="module")
def asof_sides(spark):
    clicks = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "ad-a"),
            (1, _ts("2024-01-01 10:05:00"), "ad-b"),
            (2, _ts("2024-01-01 09:00:00"), "ad-c"),
        ],
        "user_id long, ts timestamp, campaign string",
    )
    purchases = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:03:00"), 9.99),   # after ad-a, before ad-b
            (1, _ts("2024-01-01 10:05:00"), 5.00),   # ties ad-b exactly
            (2, _ts("2024-01-01 08:00:00"), 1.00),   # before any click
            (3, _ts("2024-01-01 12:00:00"), 2.00),   # user with no clicks
        ],
        "user_id long, ts timestamp, amount double",
    )
    return clicks, purchases


def test_asof_join_picks_latest_at_or_before(asof_sides):
    clicks, purchases = asof_sides
    out = asof_join(purchases, clicks, on="user_id").collect()
    by_amount = {r["amount"]: r for r in out}
    assert len(out) == 4  # exactly left's rows
    assert by_amount[9.99]["campaign"] == "ad-a"
    assert by_amount[5.00]["campaign"] == "ad-b"      # non-strict: tie matches
    assert by_amount[1.00]["campaign"] is None        # click came later
    assert by_amount[2.00]["campaign"] is None        # no clicks at all
    assert by_amount[9.99]["ts_asof"] == _ts("2024-01-01 10:00:00")


def test_asof_join_strict_excludes_ties(asof_sides):
    clicks, purchases = asof_sides
    out = asof_join(purchases, clicks, on="user_id", strict=True).collect()
    by_amount = {r["amount"]: r for r in out}
    assert by_amount[5.00]["campaign"] == "ad-a"      # strict: tie excluded
    assert by_amount[9.99]["campaign"] == "ad-a"


def test_asof_join_suffixes_colliding_columns(asof_sides):
    clicks, purchases = asof_sides
    cols = asof_join(purchases, clicks, on="user_id").columns
    assert cols == ["user_id", "ts", "amount", "campaign", "ts_asof"]


def test_asof_join_single_shuffle(asof_sides):
    clicks, purchases = asof_sides
    plan = asof_join(purchases, clicks, on="user_id")._jdf.queryExecution().executedPlan().toString()
    # union-window formulation: no join operator at all, no range explosion
    assert "Join" not in plan


def test_asof_join_ignores_null_right_timestamps(spark, asof_sides):
    clicks, purchases = asof_sides
    dirty = clicks.unionByName(
        spark.createDataFrame(
            [(2, None, "ad-ghost")], "user_id long, ts timestamp, campaign string"
        )
    )
    out = {r["amount"]: r for r in asof_join(purchases, dirty, on="user_id").collect()}
    # user 2's purchase predates every real click; the NULL-ts click must
    # NOT be carried into it (NULLs sort first in the window order)
    assert out[1.00]["campaign"] is None
    assert out[9.99]["campaign"] == "ad-a"  # real matches unaffected
