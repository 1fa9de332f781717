"""Hive-metastore catalog end-to-end.

The reference registers tables in a persistent DDL catalog
(src/Storages/registerStorages.cpp); Spark's production analog is the Hive
metastore. The spark-hive + Derby jars ship in this container, so this is
exercised for real: a managed table written through `enableHiveSupport()`
must survive into a SECOND SparkSession process reading the same metastore —
that persistence across processes is what the in-memory session catalog
can't do and why the row counts as covered.

Runs in subprocesses because a JVM pins its catalog implementation at first
session; the shared test session uses the in-memory catalog.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

SCRIPT = r"""
import sys
mode, root = sys.argv[1], sys.argv[2]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .appName("hive-e2e-" + mode)
    .config("spark.sql.warehouse.dir", root + "/warehouse")
    .config(
        "javax.jdo.option.ConnectionURL",
        f"jdbc:derby:;databaseName={root}/metastore_db;create=true",
    )
    .enableHiveSupport()
    .getOrCreate()
)
if mode == "write":
    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    df.write.mode("overwrite").bucketBy(4, "k").sortBy("id").format(
        "parquet"
    ).saveAsTable("hive_e2e_tbl")
    print("WROTE", spark.table("hive_e2e_tbl").count())
else:
    assert any(t.name == "hive_e2e_tbl" for t in spark.catalog.listTables()), (
        "table not found in metastore"
    )
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM hive_e2e_tbl WHERE k = 3"
    ).collect()[0]["n"]
    print("READ", n)
spark.stop()
"""


def test_hive_metastore_table_survives_process_restart(tmp_path):
    root = str(tmp_path)
    env = dict(os.environ)
    env.pop("SPARK_HOME", None)
    # range(100) with k = id % 7: k==3 hits ids 3, 10, ..., 94 → 14 rows
    for mode, expect in (("write", "WROTE 100"), ("read", "READ 14")):
        out = subprocess.run(
            [sys.executable, "-c", SCRIPT, mode, root],
            capture_output=True,
            text=True,
            timeout=300,
            env=env,
            cwd=root,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert expect in out.stdout, (out.stdout, out.stderr[-1000:])
