"""windowFunnel / retention / sequenceMatch vs a pure-python port of the
reference algorithm (AggregateFunctionWindowFunnel.h:154-215, default mode)."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.operators.funnel import retention, sequence_match, window_funnel

TYPES = ["view", "click", "purchase"]
W_S = 7200


def _py_funnel(evs, window_us):
    """evs: [(ts_us, idx)] — the C++ getEventLevel, default flags."""
    evs = sorted(evs)
    l = [None, None, None]
    for ts, idx in evs:
        if idx == 1:
            l[0] = ts
        elif l[idx - 2] is not None and ts <= l[idx - 2] + window_us:
            l[idx - 1] = l[idx - 2]
            if idx == 3:
                break
    for k in (3, 2, 1):
        if l[k - 1] is not None:
            return k
    return 0


@pytest.fixture(scope="module")
def py_events(spark):
    rows = (
        spark.table("events")
        .filter(F.col("event_type").isin(*TYPES))
        .select("user_id", F.unix_micros("ts").alias("ts"), "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, TYPES.index(r.event_type) + 1))
    return by_user


def test_window_funnel_matches_reference(spark, py_events):
    conds = [F.col("event_type") == t for t in TYPES]
    got = {
        r.user: r.level
        for r in window_funnel(spark.table("events"), "ts", "user_id", conds, W_S).collect()
    }
    want = {u: _py_funnel(evs, W_S * 1_000_000) for u, evs in py_events.items()}
    assert got == want


def test_sequence_match(spark, py_events):
    conds = [F.col("event_type") == t for t in TYPES]
    got = {
        r.user: r.matched
        for r in sequence_match(spark.table("events"), "ts", "user_id", conds).collect()
    }
    want = {u: int(_py_funnel(evs, 10**18) == 3) for u, evs in py_events.items()}
    assert got == want


def test_retention(spark):
    conds = [
        F.col("event_type") == "signup",
        F.col("event_type") == "click",
        F.col("event_type") == "error",
    ]
    r = retention(spark.table("events"), "user_id", conds).collect()
    raw = spark.table("events").select("user_id", "event_type").collect()
    seen = defaultdict(set)
    for row in raw:
        seen[row.user_id].add(row.event_type)
    for row in r:
        s = seen[row.user]
        assert row.r1 == int("signup" in s)
        assert row.r2 == int("signup" in s and "click" in s)
        assert row.r3 == int("signup" in s and "error" in s)
