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
    # =========== r10 window ===========
    # The r9 driver window was NOT rotated (CORRECTNESS_r09 is byte-identical
    # to r08 — r9 VERDICT finding #2), so this window leads with (a) the
    # entries whose PLANS were rewritten in r9/r10 and therefore carry no
    # driver certification of the CURRENT code: pricing_summary /
    # revenue_by_nation (integer-cents two-level sums, r10 decimal(38,0)
    # _sq), rank_corr (per-axis tiers + r10 NaN-key normalization), the
    # MinHash sliver pipeline, pack_sequences, cost-based t-digest,
    # portable-HLL, and the BM25 direct gates (r9 single-scan fast path,
    # r10 routing) — these are also the four >2x perf seats the r10 bench
    # must re-measure on a quiet host; then (b) the stalest driver records:
    # every entry whose latest record is r01, then r02 fill.
    # --- (a) reworked after the last rotated window (r7) ---
    "pricing_summary",
    "revenue_by_nation",
    "rank_corr_qty_price",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "pack_sequences_docs",
    "quantile_tdigest_grouped",
    "uniq_hll_state_events",
    "bm25_topk",
    "bm25_phrase_topk",
    # --- (b) stalest driver records: latest = r01 ---
    "array_join_token_counts",
    "cte_top_nations",
    "customers_without_recent_orders_anti",
    "date_funcs_orders",
    "delta_sum_per_user",
    "exp_time_decayed_sum",
    "final_latest_event",
    "grouping_sets_events",
    "having_distinct_suppliers",
    "nonneg_derivative",
    "offset_pagination",
    "orders_above_avg",
    "orders_with_early_ship_semi",
    "parameterized_query",
    "posexplode_tokens",
    "q6_forecast_revenue",
    "quantiles_quantity",
    "setops_partkeys",
    "simple_linear_regression",
    "stats_lineitem",
    "string_funcs_part",
    "top_customers",
    "top_event_type_per_user",
    "union_distinct_keys",
    "window_first_last_nth",
    "window_moving_avg",
    "window_range_30d",
    "with_fill_daily",
    # --- (b cont.) latest = r02, alphabetical fill to 50 ---
    "batch_distance_l2",
    "binary_hamming_topk",
    "binary_jaccard_topk",
    "bitmap_retention",
    "cramers_v_status_priority",
    "curation_pipeline",
    "curation_stats",
    "dedup_clusters",
    "doc_fingerprints",
    "doc_quality_scores",
    "embedding_neardup_pairs",
    "entropy_event_types",
    # ======= past the window (position 51+): the remaining r02/r03 records
    # rotate in next round; registry entries absent from this list follow
    # in registration order =======
    "exact_dedup_groups",
    "geo_distance_topk",
    "groups_frame_sum",
    "histogram_totalprice",
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
    "pii_scrub",
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
