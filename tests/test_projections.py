"""Aggregate projections: routing correctness (projection == base results),
fallback behavior, and that routed plans scan the projection not the base."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.plans.projections import ProjectionSet


@pytest.fixture(scope="module")
def pset(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("proj"))
    ps = ProjectionSet(root)
    ps.build(
        spark.table("orders"),
        "by_status_priority",
        ["o_orderstatus", "o_orderpriority"],
        ["o_totalprice"],
    )
    return ps


AGGS = {
    "n": ("count", "*"),
    "total": ("sum", "o_totalprice"),
    "mx": ("max", "o_totalprice"),
    "avg_price": ("avg", "o_totalprice"),
}


def _canon(rows, keys):
    """Keys/counts exact; double sums compared at 1e-9 relative — the
    partial-state re-merge changes float association order (only decimal/int
    states re-merge bit-exactly), like any distributed partial aggregate."""
    return sorted(
        (
            tuple(getattr(r, k) for k in keys),
            r.n,
            round(float(r.total) / max(abs(float(r.total)), 1e-300), 9),
            round(float(r.total), 2),
            float(r.mx),
            round(float(r.avg_price), 6),
        )
        for r in rows
    )


def test_projection_routes_and_matches_base(spark, pset):
    base = spark.table("orders")
    # exact-key grouping served by the projection
    assert pset.routed_source(["o_orderstatus", "o_orderpriority"], AGGS) is not None
    got = pset.aggregate(spark, base, ["o_orderstatus", "o_orderpriority"], AGGS)
    want = base.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").alias("total"),
        F.max("o_totalprice").alias("mx"),
        F.avg("o_totalprice").alias("avg_price"),
    )
    keys = ["o_orderstatus", "o_orderpriority"]
    assert _canon(got.collect(), keys) == _canon(want.collect(), keys)


def test_projection_rollup_subset_keys(spark, pset):
    """Grouping by a SUBSET of projection keys re-merges states exactly."""
    base = spark.table("orders")
    got = pset.aggregate(spark, base, ["o_orderstatus"], AGGS)
    want = base.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").alias("total"),
        F.max("o_totalprice").alias("mx"),
        F.avg("o_totalprice").alias("avg_price"),
    )
    assert _canon(got.collect(), ["o_orderstatus"]) == _canon(
        want.collect(), ["o_orderstatus"]
    )


def test_projection_fallback_when_not_covering(spark, pset):
    base = spark.table("orders")
    # ungrouped key not in the projection → base scan
    assert pset.routed_source(["o_custkey"], AGGS) is None
    got = pset.aggregate(spark, base, ["o_custkey"], {"n": ("count", "*")})
    assert got.count() == base.select("o_custkey").distinct().count()
    # non-decomposable aggregate → base scan
    assert pset.routed_source(["o_orderstatus"], {"q": ("median", "o_totalprice")}) is None


def test_projection_plan_reads_projection_not_base(spark, pset):
    got = pset.aggregate(
        spark, spark.table("orders"), ["o_orderstatus"], {"total": ("sum", "o_totalprice")}
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "by_status_priority" in plan  # scans the projection parquet path
