"""JDBC federation end-to-end against embedded Derby: write → partitioned
read → predicate pushdown into the remote query."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.sources.jdbc import derby_url, read_jdbc, write_jdbc

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def derby_nation(spark):
    from myscaledb_spark.catalog import load_table

    db = tempfile.mkdtemp(prefix="derby_test_") + "/db"
    n = load_table(spark, SF, "nation")
    write_jdbc(n, derby_url(db), "nation")
    return db, n


def test_roundtrip_equality(spark, derby_nation):
    db, n = derby_nation
    back = read_jdbc(spark, derby_url(db, create=False), "nation")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect()))


def test_partitioned_read_parallelism(spark, derby_nation):
    db, _ = derby_nation
    back = read_jdbc(
        spark,
        derby_url(db, create=False),
        "nation",
        partition_column="n_nationkey",
        lower_bound=0,
        upper_bound=25,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 25


def test_filter_pushdown_into_remote_sql(spark, derby_nation):
    db, _ = derby_nation
    back = read_jdbc(spark, derby_url(db, create=False), "nation").where(
        F.col("n_regionkey") == 2
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_regionkey" in plan
    assert back.count() == 5


def test_append_mode(spark, derby_nation):
    db, n = derby_nation
    extra = spark.createDataFrame(
        [(99, "ATLANTIS", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    write_jdbc(extra, derby_url(db, create=False), "nation", mode="append")
    back = read_jdbc(spark, derby_url(db, create=False), "nation")
    assert back.count() == 26
    # restore for other tests (module fixture order isn't guaranteed)
    write_jdbc(n, derby_url(db, create=False), "nation", mode="overwrite")
