"""Benchmark harness — runs headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Mirrors the reference benchmark structure (tests/vector_search/benchmark.py:
QPS per query shape) on the driver's TPC-H-ish + vector/text tables.
Each query is fully materialized (count/collect) so the measured time includes
scan → compute → merge, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from myscaledb_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("myscaledb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()

    # warm the JVM + parquet footer caches once with a trivial action
    t0 = time.time()
    from myscaledb_spark.catalog import load_table

    load_table(spark, SF_DIR, "lineitem").count()
    warm = time.time() - t0

    timings: dict[str, float] = {}
    for name, fn in sorted(queries.items()):
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            df.collect()
            timings[name] = round(time.time() - t0, 4)
        except Exception as e:  # never let one query kill the bench line
            timings[name] = -1.0
            print(f"# bench error {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "warmup_scan_sec": round(warm, 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
