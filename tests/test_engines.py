"""MergeTree engine-family FINAL semantics + TTL + OPTIMIZE DEDUPLICATE.

Reference: src/Processors/Merges/Algorithms/{Collapsing,VersionedCollapsing,
Summing}SortedAlgorithm.cpp, src/Processors/TTL/*,
src/Interpreters/InterpreterOptimizeQuery.cpp.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.operators.engines import (
    collapsing_final,
    optimize_deduplicate,
    summing_final,
    ttl_column_default,
    ttl_delete,
    ttl_group_by,
    versioned_collapsing_final,
)


def test_collapsing_cancelled_group_vanishes(spark):
    # key 'a': +1 then -1 → nets to 0 → no row. key 'b': +1,+1,-1 → last +1.
    df = spark.createDataFrame(
        [("a", 1, 1, 10.0), ("a", 2, -1, 10.0),
         ("b", 3, 1, 1.0), ("b", 4, 1, 2.0), ("b", 5, -1, 1.0)],
        "k string, seq long, sign int, v double",
    )
    out = collapsing_final(df, ["k"], "sign", "seq").collect()
    assert len(out) == 1
    assert out[0]["k"] == "b" and out[0]["seq"] == 4 and out[0]["v"] == 2.0


def test_collapsing_dangling_cancel_drops(spark):
    # More cancels than states: net < 0 → group vanishes (read path has no
    # state row to show).
    df = spark.createDataFrame(
        [("a", 1, -1, 0.0), ("a", 2, -1, 0.0), ("a", 3, 1, 0.0)],
        "k string, seq long, sign int, v double",
    )
    assert collapsing_final(df, ["k"], "sign", "seq").count() == 0


def test_versioned_collapsing_per_version_cancellation(spark):
    # (a, v1) +1/-1 cancel; (a, v2) survives — plain Collapsing would have
    # netted the whole key to +1 with the v1 cancel eating the v2 state.
    df = spark.createDataFrame(
        [("a", 1, 1, 100), ("a", 1, -1, 101), ("a", 2, 1, 102)],
        "k string, ver int, sign int, seq long",
    )
    out = versioned_collapsing_final(df, ["k"], "sign", "ver", "seq").collect()
    assert len(out) == 1
    assert out[0]["ver"] == 2 and out[0]["seq"] == 102


def test_summing_sums_and_pins_first(spark):
    df = spark.createDataFrame(
        [("a", 1, 10, "x"), ("a", 2, 5, "y"), ("b", 3, 0, "z")],
        "k string, seq long, amt long, tag string",
    )
    out = {r["k"]: r for r in summing_final(df, ["k"], ["amt"], "seq").collect()}
    assert out["a"]["amt"] == 15 and out["a"]["tag"] == "x"  # first by seq
    # all-zero sums → row deleted (SummingSortedAlgorithm isZero path)
    assert "b" not in out


def test_summing_requires_first_by_for_other_columns(spark):
    df = spark.createDataFrame([("a", 1, 2)], "k string, amt long, extra long")
    with pytest.raises(ValueError):
        summing_final(df, ["k"], ["amt"])


def test_ttl_delete_and_column_default(spark):
    now = F.lit("2024-01-10 00:00:00").cast("timestamp")
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5.0), (2, "2024-01-09 00:00:00", 7.0)],
        "id long, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    alive = ttl_delete(df, F.col("ts") + F.expr("INTERVAL 5 DAYS"), now)
    assert [r["id"] for r in alive.collect()] == [2]
    defaulted = ttl_column_default(
        df, "v", F.col("ts") + F.expr("INTERVAL 5 DAYS"), now, F.lit(-1.0)
    )
    got = {r["id"]: r["v"] for r in defaulted.collect()}
    assert got == {1: -1.0, 2: 7.0}  # row 1 expired → default; row survives


def test_ttl_group_by_rolls_up_only_expired(spark):
    now = F.lit("2024-01-10 00:00:00").cast("timestamp")
    df = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", 1), ("u1", "2024-01-01 06:00:00", 2),
         ("u1", "2024-01-09 00:00:00", 4)],
        "k string, ts string, n long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    day = df.withColumn("day", F.date_trunc("day", "ts")).drop("ts")
    out = ttl_group_by(
        day,
        ttl=F.col("day") + F.expr("INTERVAL 5 DAYS"),
        now=now,
        keys=["k", "day"],
        set_aggs={"n": F.sum("n")},
    ).collect()
    # expired day (Jan 1) collapses to one row n=3; fresh row passes through
    by_n = sorted(r["n"] for r in out)
    assert by_n == [3, 4] and len(out) == 2


def test_ttl_group_by_rejects_uncovered_columns(spark):
    df = spark.createDataFrame([("a", 1, 2)], "k string, n long, stray long")
    with pytest.raises(ValueError, match="stray"):
        ttl_group_by(df, F.lit(True), F.lit(True), ["k"], {"n": F.sum("n")})


def test_optimize_deduplicate_full_and_subset(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (3, "b")], "id long, g string"
    )
    assert optimize_deduplicate(df).count() == 3  # full-row DISTINCT
    by_g = optimize_deduplicate(df, by=["g"], order="id").collect()
    assert sorted((r["g"], r["id"]) for r in by_g) == [("a", 1), ("b", 3)]
    with pytest.raises(ValueError):
        optimize_deduplicate(df, by=["g"])


def test_any_join_one_match_and_requires_order(spark):
    from myscaledb_spark.operators.relational import any_join

    left = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 5, "b"), (2, 7, "c")], "k long, seq long, v string"
    )
    out = any_join(left, right, ["k"], "left", "seq").collect()
    got = {r["k"]: (r["seq"], r["v"]) for r in out}
    assert len(out) == 3  # never multiplies left rows
    assert got[1] == (5, "b")  # min by seq wins
    assert got[2] == (7, "c")
    assert got[3] == (None, None)  # left-outer keeps unmatched
    inner = any_join(left, right, ["k"], "inner", "seq")
    assert inner.count() == 2
    with pytest.raises(ValueError):
        any_join(left, right, ["k"])


def test_ttl_null_rows_never_expire(spark):
    now = F.lit("2024-01-10 00:00:00").cast("timestamp")
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5.0), (2, None, 7.0)],
        "id long, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ttl = F.col("ts") + F.expr("INTERVAL 5 DAYS")
    # NULL ttl row survives deletion, keeps its value, and passes through
    # ttl_group_by untouched (was silently dropped from both slices)
    assert sorted(r["id"] for r in ttl_delete(df, ttl, now).collect()) == [2]
    kept = {r["id"]: r["v"] for r in ttl_column_default(df, "v", ttl, now, F.lit(-1.0)).collect()}
    assert kept == {1: -1.0, 2: 7.0}
    g = ttl_group_by(
        df.select("id", "ts", "v"),
        ttl=ttl, now=now, keys=["id", "ts"], set_aggs={"v": F.sum("v")},
    ).collect()
    assert sorted(r["id"] for r in g) == [1, 2]


def test_summing_rejects_empty_sum_cols(spark):
    df = spark.createDataFrame([("a", 1, 2)], "k string, seq long, amt long")
    with pytest.raises(ValueError, match="at least one"):
        summing_final(df, ["k"], [], first_by="seq")


def test_versioned_collapsing_keeps_unpaired_rows(spark):
    # ADVICE r4: the reference's FIFO queue emits unpaired rows of EITHER
    # sign — a dangling -1 survives, and two same-version +1 rows both
    # survive (VersionedCollapsingAlgorithm.cpp).
    df = spark.createDataFrame(
        [
            ("a", 1, -1, 10),                      # lone cancel → emitted
            ("b", 1, 1, 20), ("b", 1, 1, 21),      # double state → both out
            ("c", 1, 1, 30), ("c", 1, -1, 31),     # exact pair → gone
            ("d", 1, 1, 40), ("d", 1, 1, 41), ("d", 1, -1, 42),  # net +1 → last state
        ],
        "k string, ver int, sign int, seq long",
    )
    out = versioned_collapsing_final(df, ["k"], "sign", "ver", "seq").collect()
    got = sorted((r["k"], r["sign"], r["seq"]) for r in out)
    assert got == [("a", -1, 10), ("b", 1, 20), ("b", 1, 21), ("d", 1, 41)]
