"""Query suite registry — every entry is (spark_fn, duckdb_oracle_sql|None).

The driver's correctness gate runs each registered query on Spark and its
oracle on DuckDB side-by-side (row-count + schema + order-insensitive
value-hash). Registration keeps __spark_entry__ a thin shim.

Float discipline (makes the value-hash deterministic):
  - money arithmetic in DECIMAL on both sides (exact, order-independent),
  - float expressions computed with the SAME double association order on
    both sides, then ROUND(x, 4),
  - every top-k / LIMIT tie-broken by a unique id column on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate suite entry {name}")
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def load_all() -> None:
    """Import every suite module (side effect: fills REGISTRY)."""
    from myscaledb_spark.suite import (  # noqa: F401
        search,
        search2,
        hybrid,
        dedup,
        text_pipeline,
        pipeline,
        funnel,
        stat_tests,
        bitmap,
        window_ext,
        streaming,
        dialect,
        analytics,
        analytics2,
        combinators,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        functions_gate,
        agg_tail,
        geo_gate,
        jdbc_gate,
        datamix,
        multimodal_gate,
        engines_gate,
        bucketed_gate,
        dialect2,
        dialect3,
        dialect4,
        search3,
        quality_gate,
        agg_state_gate,
    )


# The driver checks only a prefix window of the registry (first 50 of N), so
# ordering decides which queries get a driver verdict of record.  Names
# absent from the registry are skipped; registry entries absent from this
# list follow in registration order.
PRIORITY: list[str] = [
    # =========== r11 window ===========
    # Rotation per the r10 VERDICT item 4: (a) every entry whose code this
    # round TOUCHES (window hygiene: touched code leads the window) plus
    # the r10-touched-but-uncertified names the VERDICT lists explicitly
    # (hybrid family, text_search_routed, bm25_cjk_topk,
    # quantile_tdigest_qty, mv_agg_state_hourly); then (b) the stalest
    # driver records — all 23 entries whose latest record is r02, then
    # r03 fill to 50.  Computed from the CORRECTNESS_r01..r10 windows
    # (every registry entry has a record; after this rotation the oldest
    # uncovered record is r03).
    # --- (a) r11-touched + r10-touched-but-uncertified ---
    "hybrid_search_indexed",
    "hybrid_search_indexed_exhaustive",
    "hybrid_search_rsf",
    "hybrid_search_rrf",
    "text_search_routed",
    "bm25_cjk_topk",
    "bm25_cjk_indexed",
    "quantile_tdigest_qty",
    "mv_agg_state_hourly",
    "revenue_by_nation",
    "pricing_summary",
    "vec_cosine_topk",
    "ivf_search_topk",
    "mstg_search_topk",
    "dedup_clusters",
    "agg_state_merge_orders",
    # --- (b) stalest driver records: latest = r02 (all 23) ---
    "exact_dedup_groups",
    "geo_distance_topk",
    "groups_frame_sum",
    "histogram_totalprice",
    "lang_id_scores",
    "pii_scrub",
    "pq_rerank_topk",
    "projection_rollup",
    "retention_cohort",
    "sample_deterministic",
    "sequence_match_users",
    "sequence_next_node",
    "simhash_fingerprints",
    "sq_rerank_topk",
    "student_ttest_segments",
    "theils_u_priority_status",
    "token_counts",
    "two_stage_l2",
    "uniq_up_to",
    "vec_ip_topk",
    "vec_l2_filtered",
    "welch_ttest_purchase_vs_view",
    "window_funnel_levels",
    # --- (b cont.) latest = r03, alphabetical fill to 50 ---
    "agg_combinators",
    "auc_value_vs_purchase",
    "avg_vector_centroids",
    "bm25_stopword_topk",
    "ch_sql_monthly_stats",
    "ch_sql_vector_search",
    "check_constraint_counts",
    "delete_mutation_counts",
    "interval_length_sum",
    "json_object_cols",
    "max_intersections",
    # ======= past the window (position 51+): the remaining r03 records
    # (mstg_search_exhaustive, mv_push_hourly, numbers_table_agg, the
    # stream_* trio, ...) rotate in next round; registry entries absent
    # from this list follow in registration order =======
]


def _ordered(keys) -> list[str]:
    keyset = set(keys)
    head = [k for k in PRIORITY if k in keyset]
    headset = set(head)
    return head + [k for k in keys if k not in headset]


def _tuned(fn: SparkQuery) -> SparkQuery:
    """Apply runtime engine confs (UTC session TZ, AQE, nanosAsLong, ...)
    before running — the driver's session may carry different defaults, and
    timestamp collection / date_trunc are session-TZ-sensitive."""

    def wrapped(spark: SparkSession, sf_dir: str):
        from myscaledb_spark.session import tune_session

        tune_session(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


def queries() -> dict[str, SparkQuery]:
    load_all()
    return {k: _tuned(REGISTRY[k][0]) for k in _ordered(REGISTRY.keys())}


def oracles() -> dict[str, str]:
    load_all()
    return {
        k: REGISTRY[k][1]
        for k in _ordered(REGISTRY.keys())
        if REGISTRY[k][1] is not None
    }
