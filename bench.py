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

# Representative query shapes, one per operator family (full-suite
# correctness runs in the driver's t2 gate at sf0.01; bench measures the
# scan/shuffle/topk cost profiles at sf0.1).
HEADLINE = [
    "vec_l2_topk",          # narrow scan + TakeOrdered
    "vec_l2_filtered",      # pushed filter + topk
    "vec_cosine_topk",      # heavier per-row expression
    "batch_distance_l2",    # row explosion + per-query window topk
    "two_stage_l2",         # candidate gen + re-rank
    "bm25_topk",            # corpus stats + broadcast + scoring
    "hybrid_search_rsf",    # two candidate pipelines + fusion join
    "pricing_summary",      # full-scan decimal aggregation
    "revenue_by_nation",    # 5-way join w/ broadcast dims
    "top_customers",        # join + agg + topk
    "window_rank_orders",   # window shuffle
    "limit_by_customer",    # per-group topk window
    "asof_events_orders",   # union + window asof
    "minhash_lsh_pairs",    # explode/groupBy hash pipeline
    "window_funnel_levels", # sorted-array state machine
    "exact_dedup_groups",   # hash groupBy dedup
]


def main() -> None:
    from myscaledb_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("myscaledb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    all_queries = entrymod.queries()
    queries = {k: all_queries[k] for k in HEADLINE if k in all_queries}

    # warm the JVM + parquet footer caches once with a trivial action
    t0 = time.time()
    from myscaledb_spark.catalog import load_table

    load_table(spark, SF_DIR, "lineitem").count()
    warm = time.time() - t0

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, fn in sorted(queries.items()):
        try:
            t0 = time.time()
            fn(spark, SF_DIR).collect()  # cold: includes codegen compile
            cold[name] = round(time.time() - t0, 4)
            t0 = time.time()
            fn(spark, SF_DIR).collect()  # steady-state: the per-query cost
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
                "cold_total_sec": round(sum(cold.values()), 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
