"""Strict windowFunnel modes vs hand-computed expectations
(AggregateFunctionWindowFunnel.h strict_order/strict_dedup/strict_increase)."""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.operators.funnel import window_funnel, window_funnel_strict


def _df(spark, rows):
    return spark.createDataFrame(rows, "u long, t string, et string").withColumn(
        "t", F.col("t").cast("timestamp")
    )


def _conds():
    return [F.col("et") == x for x in ("A", "B", "C")]


def _lv(df, modes):
    out = window_funnel_strict(df, "t", "u", _conds(), 86400 * 30, modes)
    return {r["user"]: r["level"] for r in out.collect()}


def test_strict_order_freezes_on_foreign_event(spark):
    rows = [
        (1, "2024-01-01 00:00:01", "A"),
        (1, "2024-01-01 00:00:02", "B"),
        (1, "2024-01-01 00:00:03", "D"),  # foreign — freezes at level 2
        (1, "2024-01-01 00:00:04", "C"),
        (2, "2024-01-01 00:00:00", "D"),  # foreign BEFORE chain: harmless
        (2, "2024-01-01 00:00:01", "A"),
        (2, "2024-01-01 00:00:02", "B"),
        (2, "2024-01-01 00:00:03", "C"),
    ]
    df = _df(spark, rows)
    assert _lv(df, ["strict_order"]) == {1: 2, 2: 3}
    # default mode ignores the foreign event entirely
    dflt = window_funnel(df, "t", "u", _conds(), 86400 * 30)
    assert {r["user"]: r["level"] for r in dflt.collect()} == {1: 3, 2: 3}


def test_strict_dedup_freezes_on_repeat(spark):
    rows = [
        (1, "2024-01-01 00:00:01", "A"),
        (1, "2024-01-01 00:00:02", "A"),  # repeat of achieved level 1
        (1, "2024-01-01 00:00:03", "B"),
        (1, "2024-01-01 00:00:04", "C"),
        (2, "2024-01-01 00:00:01", "A"),
        (2, "2024-01-01 00:00:02", "B"),
        (2, "2024-01-01 00:00:03", "C"),
    ]
    assert _lv(_df(spark, rows), ["strict_dedup"]) == {1: 1, 2: 3}


def test_strict_increase_requires_growing_timestamps(spark):
    rows = [
        (1, "2024-01-01 00:00:01", "A"),
        (1, "2024-01-01 00:00:01", "B"),  # same ts as A: no chain
        (1, "2024-01-01 00:00:02", "C"),
        (2, "2024-01-01 00:00:01", "A"),
        (2, "2024-01-01 00:00:02", "B"),
        (2, "2024-01-01 00:00:03", "C"),
    ]
    df = _df(spark, rows)
    assert _lv(df, ["strict_increase"]) == {1: 1, 2: 3}
    # default: equal timestamps chain (sorted by (ts, idx))
    dflt = window_funnel(df, "t", "u", _conds(), 86400 * 30)
    assert {r["user"]: r["level"] for r in dflt.collect()}[1] == 3


def test_modes_compose_and_validate(spark):
    import pytest

    rows = [(1, "2024-01-01 00:00:01", "A")]
    df = _df(spark, rows)
    assert _lv(df, ["strict_order", "strict_dedup", "strict_increase"]) == {1: 1}
    with pytest.raises(ValueError, match="unknown"):
        window_funnel_strict(df, "t", "u", _conds(), 10, ["bogus"])


def test_sequence_match_gap_constraint_backtracks(spark):
    from myscaledb_spark.operators.funnel import sequence_match_t

    # A(0s) A(10s) B(12s), gap <= 5s: the FIRST A fails but the second
    # works — the latest-ts DP must find it (greedy-first would miss)
    rows = [
        (1, "2024-01-01 00:00:00", "A"),
        (1, "2024-01-01 00:00:10", "A"),
        (1, "2024-01-01 00:00:12", "B"),
        (2, "2024-01-01 00:00:00", "A"),
        (2, "2024-01-01 00:00:30", "B"),
    ]
    df = _df(spark, rows)
    conds = [F.col("et") == "A", F.col("et") == "B"]
    out = {r["user"]: r["matched"] for r in
           sequence_match_t(df, "t", "u", conds, [5]).collect()}
    assert out == {1: 1, 2: 0}
    # unconstrained: both match
    out = {r["user"]: r["matched"] for r in
           sequence_match_t(df, "t", "u", conds).collect()}
    assert out == {1: 1, 2: 1}


def test_sequence_count_non_overlapping(spark):
    from myscaledb_spark.operators.funnel import sequence_count

    # A B A B A → two complete A->B chains, trailing A incomplete
    rows = [
        (1, "2024-01-01 00:00:0%d" % i, et)
        for i, et in enumerate(["A", "B", "A", "B", "A"])
    ]
    df = _df(spark, rows)
    conds = [F.col("et") == "A", F.col("et") == "B"]
    out = sequence_count(df, "t", "u", conds).collect()
    assert out[0]["n_matches"] == 2


def test_sequence_gap_validation(spark):
    import pytest

    from myscaledb_spark.operators.funnel import sequence_match_t

    df = _df(spark, [(1, "2024-01-01 00:00:00", "A")])
    conds = [F.col("et") == "A", F.col("et") == "B"]
    with pytest.raises(ValueError, match="gap"):
        sequence_match_t(df, "t", "u", conds, [1, 2])


def test_sequence_next_node_forward_first_match(spark):
    from myscaledb_spark.operators.funnel import sequence_next_node
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            # u1: A B C D → chain (A,B) matched at pos 1 → next = C
            (1, 1, "A"), (1, 2, "B"), (1, 3, "C"), (1, 4, "D"),
            # u2: A X B → A at pos1 but next is X (not consecutive) → NULL
            (2, 1, "A"), (2, 2, "X"), (2, 3, "B"),
            # u3: X A B → chain at pos 2, next absent → NULL
            (3, 1, "X"), (3, 2, "A"), (3, 3, "B"),
            # u4: only 2 events (== n) → NULL by the size guard
            (4, 1, "A"), (4, 2, "B"),
        ],
        "u int, t long, ev string",
    ).withColumn("ts", F.timestamp_seconds("t"))
    out = {
        r["user"]: r["next_node"]
        for r in sequence_next_node(
            df, "ts", "u", "ev",
            [F.col("ev") == "A", F.col("ev") == "B"],
        ).collect()
    }
    assert out == {1: "C", 2: None, 3: None, 4: None}


def test_sequence_next_node_bases_and_backward(spark):
    from myscaledb_spark.operators.funnel import sequence_next_node
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 1, "Z"), (1, 2, "A"), (1, 3, "B"), (1, 4, "C"), (1, 5, "A"), (1, 6, "B"), (1, 7, "D")],
        "u int, t long, ev string",
    ).withColumn("ts", F.timestamp_seconds("t"))
    conds = [F.col("ev") == "A", F.col("ev") == "B"]

    def run(**kw):
        return sequence_next_node(df, "ts", "u", "ev", conds, **kw).collect()[0]["next_node"]

    assert run(base="first_match") == "C"       # chain at pos 2 → next C
    assert run(base="last_match") == "D"        # chain at pos 5 → next D
    assert run(base="head") is None             # head is Z, not A
    # backward from tail: events walked to the past — tail D, cond0 must
    # match D → no. first_match backward: first A (pos 2), walk back needs
    # B at pos 1 → Z, no; the reference then yields NULL
    assert run(base="tail", direction="backward") is None
    # backward chain that does match: conds reversed (B then A) from
    # last_match base: last B at pos 6, pos 5 = A → next node pos 4 = C
    assert (
        sequence_next_node(
            df, "ts", "u", "ev",
            [F.col("ev") == "B", F.col("ev") == "A"],
            direction="backward", base="last_match",
        ).collect()[0]["next_node"]
        == "C"
    )


def test_sequence_next_node_head_tail_base_cond(spark):
    from myscaledb_spark.operators.funnel import sequence_next_node
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 1, "A"), (1, 2, "B"), (1, 3, "C")],
        "u int, t long, ev string",
    ).withColumn("ts", F.timestamp_seconds("t"))
    conds = [F.col("ev") == "A"]
    assert (
        sequence_next_node(df, "ts", "u", "ev", conds, base="head").collect()[0][
            "next_node"
        ]
        == "B"
    )
    # base_cond false on the head row → no base → NULL
    assert (
        sequence_next_node(
            df, "ts", "u", "ev", conds, base="head",
            base_cond=F.col("ev") == "Q",
        ).collect()[0]["next_node"]
        is None
    )
