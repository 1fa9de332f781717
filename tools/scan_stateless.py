"""Batch scanner for 0_stateless conformance candidates.

Runs a slice of /root/reference/tests/queries/0_stateless/*.sql through
tools/conformance.run_file and prints per-file status, so the next pin
batch can be chosen from files that already PASS or fail with a small,
fixable gap.

Usage:
    python tools/scan_stateless.py 300 400        # files [300, 400) by sorted index
    python tools/scan_stateless.py --name 00300   # substring filter
    python tools/scan_stateless.py --failures     # print only FAIL/RAN

Skips known-out-of-scope shapes cheaply (replication zk tests, file()/url()
table functions needing network, long/deterministic-id tests) by filename
pattern before spinning the statement loop.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import conformance  # noqa: E402

DIR = "/root/reference/tests/queries/0_stateless"

#: filename patterns that are out of scope for a Spark-side dialect —
#: skip without running (each costs a full statement loop otherwise)
SKIP = re.compile(
    r"(zookeeper|replica|shard|remote|cluster|distributed|url|s3|hdfs|mysql|"
    r"postgres|odbc|jdbc|kafka|rabbit|nats|live_view|window_view|dictionar|"
    r"format_(avro|orc|parquet|protobuf|capn|msgpack|arrow|native)|"
    r"log_family|merge_tree_setting|system_(logs|metrics|events|asynchronous)|"
    r"access|rbac|role|quota|grant|ldap|kerberos|ssl|tls|x509|"
    r"backup|restore|disk|filesystem|part_log|query_log|trace_log|"
    r"deadlock|race|stress|benchmark|performance|memory_limit|timeout)",
    re.IGNORECASE,
)


def main(argv):
    names = [a for a in argv if not a.startswith("-") and not a.isdigit()]
    nums = [int(a) for a in argv if a.isdigit()]
    failures_only = "--failures" in argv
    include_skipped = "--all" in argv

    files = sorted(f for f in os.listdir(DIR) if f.endswith(".sql"))
    if names:
        files = [f for f in files if any(n in f for n in names)]
    if len(nums) == 2:
        files = files[nums[0] : nums[1]]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("scan_stateless")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    counts = {"PASS": 0, "RAN": 0, "FAIL": 0, "SKIP": 0}

    def _alive() -> bool:
        try:
            spark.sql("SELECT 1").collect()
            return True
        except Exception:
            return False

    for f in files:
        if not include_skipped and SKIP.search(f):
            counts["SKIP"] += 1
            continue
        path = os.path.join(DIR, f)
        t0 = time.time()
        try:
            status, detail = conformance.run_file(spark, path)
        except Exception as e:  # harness-level crash
            status, detail = "FAIL", f"harness: {type(e).__name__}: {e}"
        dt = time.time() - t0
        counts[status] += 1
        if not failures_only or status != "PASS":
            print(f"{status:4} {f:60} {str(detail)[:110]}  [{dt:.0f}s]", flush=True)
        if status == "FAIL" and not _alive():
            # a stress statement killed the JVM — restart so one crash
            # cannot poison every later file's verdict (same recovery as
            # tools/conformance.main)
            print(".... session died; restarting JVM", flush=True)
            try:
                spark.stop()
            except Exception:
                pass
            from pyspark import SparkContext

            SparkContext._active_spark_context = None
            SparkContext._gateway = None
            SparkContext._jvm = None
            SparkSession._instantiatedSession = None
            SparkSession._activeSession = None
            spark = (
                SparkSession.builder.master("local[8]")
                .appName("scan_stateless")
                .config("spark.sql.shuffle.partitions", "8")
                .config("spark.ui.enabled", "false")
                .config("spark.driver.memory", "8g")
                .getOrCreate()
            )
    print(f"\ntotal: {counts}")


if __name__ == "__main__":
    main(sys.argv[1:])
