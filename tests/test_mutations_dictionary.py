"""Mutations (lightweight delete / rewrite update) + dictGet lookups +
format round-trips (CSV/JSON/ORC — §2.1 formats coverage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.operators.dictionary import Dictionary
from myscaledb_spark.operators.mutations import VersionedTable


@pytest.fixture()
def vt(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(spark.table("orders").select("o_orderkey", "o_custkey", "o_totalprice"))
    return t


def test_lightweight_delete(spark, vt):
    n0 = vt.read().count()
    masked = vt.delete_where(F.col("o_totalprice") > 200000, ["o_orderkey"])
    assert masked > 0
    n1 = vt.read().count()
    assert n1 == n0 - masked
    assert vt.read().filter(F.col("o_totalprice") > 200000).count() == 0
    # version unchanged — mask-only (lightweight)
    assert vt.current_version() == 0


def test_mutation_rewrite_update(spark, vt):
    vt.delete_where(F.col("o_totalprice") > 200000, ["o_orderkey"])
    before = vt.read().count()
    v = vt.mutate(
        delete_cond=F.col("o_custkey") < 10,
        set_exprs={"o_totalprice": F.col("o_totalprice") * 2},
    )
    assert v == 1
    after = vt.read()
    assert after.filter(F.col("o_custkey") < 10).count() == 0
    assert after.count() < before
    # masked deletes folded in: rewrite kept them deleted
    assert after.filter(F.col("o_totalprice") > 800000).count() == \
        after.filter(F.col("o_totalprice") / 2 > 400000).count()


def test_dict_get(spark):
    nation = spark.table("nation")
    d = Dictionary(nation, "n_nationkey", default={"n_name": "UNKNOWN"})
    cust = spark.table("customer").limit(50)
    out = d.get(cust, "n_name", "c_nationkey")
    joined = {
        r.c_custkey: r.n_name
        for r in cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "n_name")
        .collect()
    }
    for r in out.collect():
        assert r.n_name == joined.get(r.c_custkey, "UNKNOWN")
    # missing key → default
    bad = d.get(cust.withColumn("c_nationkey", F.lit(9999)), "n_name", "c_nationkey")
    assert all(r.n_name == "UNKNOWN" for r in bad.collect())


def test_dict_get_is_broadcast(spark):
    nation = spark.table("nation")
    d = Dictionary(nation, "n_nationkey")
    out = d.get(spark.table("customer"), "n_name", "c_nationkey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dict_has(spark):
    nation = spark.table("nation").filter(F.col("n_nationkey") < 10)
    d = Dictionary(nation, "n_nationkey")
    out = d.has(spark.table("customer").limit(100), "c_nationkey")
    for r in out.select("c_nationkey", "dict_has").collect():
        assert r.dict_has == (r.c_nationkey < 10)


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_roundtrip(spark, tmp_path, fmt):
    """142 I/O formats in the reference (registerFormats.cpp) → Spark's
    format registry; round-trip the orders table through each."""
    src = spark.table("orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    path = str(tmp_path / f"rt.{fmt}")
    w = src.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", True)
    w.format(fmt).save(path)
    r = spark.read
    if fmt == "csv":
        r = r.option("header", True).option("inferSchema", True)
    back = r.format(fmt).load(path)
    assert back.count() == src.count()
    a = sorted([tuple(x) for x in src.collect()])
    b = sorted([tuple(x) for x in back.select(*src.columns).collect()])
    assert a == b


def test_vacuum_keeps_current(spark, vt):
    vt.mutate(set_exprs={"o_totalprice": F.col("o_totalprice") * 1})  # v1
    vt.mutate(set_exprs={"o_totalprice": F.col("o_totalprice") * 1})  # v2
    assert vt.current_version() == 2
    removed = vt.vacuum(keep_last=1)
    assert 0 in removed and 2 not in removed
    # current still readable
    assert vt.read().count() > 0


def test_array_enumerate_uniq(spark):
    from myscaledb_spark.functions import ch_compat as ch

    r = (
        spark.range(1)
        .select(
            ch.arrayEnumerateUniq(
                F.array(F.lit(10), F.lit(20), F.lit(10), F.lit(10), F.lit(20))
            ).alias("e")
        )
        .first()
    )
    assert r.e == [1, 1, 2, 3, 2]


def test_optimize_compact_merges_small_files(spark, tmp_path):
    from myscaledb_spark.operators.mutations import optimize_compact

    p = str(tmp_path / "frag")
    # 40 tiny files
    spark.range(4000).selectExpr("id", "id % 7 AS k").repartition(40).write.parquet(p)
    import os as _os

    n_before = sum(
        1 for f in _os.listdir(p) if f.endswith(".parquet")
    )
    assert n_before >= 30
    stats = optimize_compact(spark, p, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] >= 30 and stats["files_after"] <= 4
    df = spark.read.parquet(p)
    assert df.count() == 4000
    assert df.agg({"id": "sum"}).collect()[0][0] == 4000 * 3999 // 2
    # sorted compaction clusters the sort key per file for min/max pruning
    stats = optimize_compact(spark, p, target_file_bytes=64 * 1024 * 1024, sort_cols=["id"])
    assert spark.read.parquet(p).count() == 4000


def test_optimize_compact_preserves_partitioned_layout(spark, tmp_path):
    import os as _os

    from myscaledb_spark.operators.mutations import optimize_compact

    p = str(tmp_path / "parts")
    (
        spark.range(2000)
        .selectExpr("id", "id % 3 AS day")
        .repartition(20)
        .write.partitionBy("day")
        .parquet(p)
    )
    stats = optimize_compact(spark, p)
    # k=v directories survive, data intact, partition pruning still works
    assert sorted(
        d for d in _os.listdir(p) if d.startswith("day=")
    ) == ["day=0", "day=1", "day=2"]
    assert stats["files_after"] < stats["files_before"]
    df = spark.read.parquet(p)
    assert df.count() == 2000 and df.filter("day = 1").count() == 667
