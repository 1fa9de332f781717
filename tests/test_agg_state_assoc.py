"""Pins the -State → -Merge associativity of the portable-HLL uniq state
at the API level: registers built per (key, day) part with uniq_states,
merged across parts with uniq_merge_state_agg / uniq_merge_states_multi,
must equal the registers built in one pass over all rows — the property
that makes the state STORABLE (AggregatingMergeTree parts, MV rollups).

Reference: src/AggregateFunctions/AggregateFunctionUniq.h (HLL state
merge = elementwise register max), src/DataTypes/DataTypeAggregateFunction.h.

The uniq_hll_state_events gate itself runs the fused 2-shuffle build
(suite/agg_state_gate.py); this test keeps the un-fused build→store→merge
path covered.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.operators.agg_state import (
    uniq_finalize,
    uniq_merge_state_agg,
    uniq_merge_states_multi,
    uniq_state,
    uniq_states,
)


def _events(spark):
    from myscaledb_spark.catalog import load_table

    return load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )


def test_per_day_states_merge_to_global(spark):
    ev = _events(spark)
    per_day = uniq_states(
        ev, ["event_type", "day"], {"su": "user_id", "se": "event_id"}
    )
    merged = per_day.groupBy("event_type").agg(
        uniq_merge_state_agg("su").alias("su"),
        uniq_merge_state_agg("se").alias("se"),
    )
    direct = uniq_states(ev, ["event_type"], {"su": "user_id", "se": "event_id"})
    got = {r["event_type"]: (r["su"], r["se"]) for r in merged.collect()}
    want = {r["event_type"]: (r["su"], r["se"]) for r in direct.collect()}
    assert got == want and len(got) > 0


def test_posexplode_merge_matches_fold_merge(spark):
    ev = _events(spark)
    per_day = uniq_states(
        ev, ["event_type", "day"], {"su": "user_id", "se": "event_id"}
    )
    via_posexplode = uniq_merge_states_multi(
        per_day, ["event_type"], ["su", "se"]
    )
    via_fold = per_day.groupBy("event_type").agg(
        uniq_merge_state_agg("su").alias("su"),
        uniq_merge_state_agg("se").alias("se"),
    )
    a = {r["event_type"]: (r["su"], r["se"]) for r in via_posexplode.collect()}
    b = {r["event_type"]: (r["su"], r["se"]) for r in via_fold.collect()}
    assert a == b


def test_single_column_uniq_state_estimate(spark):
    ev = _events(spark)
    st = uniq_state(ev, ["event_type"], "user_id", alias="s")
    est = st.select(
        "event_type", F.round(uniq_finalize("s"), 4).alias("u")
    ).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in est:
        # HLL with m=256 → ~6.5% relative error; allow 3σ
        assert abs(r["u"] - exact[r["event_type"]]) <= max(
            5.0, 0.2 * exact[r["event_type"]]
        )
