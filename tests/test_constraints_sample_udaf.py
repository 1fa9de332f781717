"""CHECK constraints, deterministic SAMPLE BY, grouped-agg pandas UDAF."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from myscaledb_spark.operators.constraints import (
    CheckConstraintViolation,
    check_constraints,
    write_with_checks,
)
from myscaledb_spark.operators.relational import sample_by


def test_check_constraints_pass_and_fail(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id int, v double"
    )
    ok = check_constraints(df, {"id_pos": F.col("id") > 0})
    assert ok.count() == 3  # returned unchanged

    with pytest.raises(CheckConstraintViolation) as ei:
        check_constraints(df, {"v_nonneg": F.col("v") >= 0})
    # -5 violates; NULL counts as violation (reference casts CHECK to UInt8)
    assert ei.value.violations == {"v_nonneg": 2}
    assert len(ei.value.samples["v_nonneg"]) == 2


def test_write_with_checks_blocks_bad_insert(spark, tmp_path):
    good = spark.createDataFrame([(1, 1.0)], "id int, v double")
    bad = spark.createDataFrame([(2, -1.0)], "id int, v double")
    dest = str(tmp_path / "t")
    write_with_checks(good, dest, {"v_nonneg": F.col("v") >= 0})
    with pytest.raises(CheckConstraintViolation):
        write_with_checks(bad, dest, {"v_nonneg": F.col("v") >= 0})
    # nothing from the failed insert landed
    assert spark.read.parquet(dest).count() == 1


def test_sample_by_deterministic_and_proportional(spark):
    o = spark.table("orders")
    a = {r.o_orderkey for r in sample_by(o, "o_orderkey", 0.2).select("o_orderkey").collect()}
    b = {r.o_orderkey for r in sample_by(o, "o_orderkey", 0.2).select("o_orderkey").collect()}
    assert a == b  # same rows every run
    n = o.count()
    assert 0.15 * n < len(a) < 0.25 * n  # roughly proportional
    # nested property: SAMPLE 0.1 ⊂ SAMPLE 0.2 (same key ordering by hash)
    s01 = {r.o_orderkey for r in sample_by(o, "o_orderkey", 0.1).select("o_orderkey").collect()}
    assert s01 <= a
    # different seed → different subset
    s_seed = {r.o_orderkey for r in sample_by(o, "o_orderkey", 0.2, seed=7).select("o_orderkey").collect()}
    assert s_seed != a


def test_avg_vector_udaf(spark):
    from myscaledb_spark.functions.udaf import avg_vector

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [10.0, 20.0]), (2, None)],
        "g int, v array<double>",
    )
    got = {r.g: r.c for r in df.groupBy("g").agg(avg_vector("v").alias("c")).collect()}
    assert got[1] == [2.0, 3.0]
    assert got[2] == [10.0, 20.0]  # NULL skipped like AVG

    # matches the explode-based native formulation on real embeddings
    emb = spark.table("embeddings").withColumn("g", F.col("vec_id") % 3)
    udaf = {
        r.g: np.array(r.c)
        for r in emb.groupBy("g").agg(avg_vector("embedding").alias("c")).collect()
    }
    native = (
        emb.select("g", F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy("g", "pos")
        .agg(F.avg("col").alias("m"))
        .groupBy("g")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("arr"))
        .collect()
    )
    for r in native:
        want = np.array([x.m for x in r.arr])
        np.testing.assert_allclose(udaf[r.g], want, rtol=1e-12)
