"""Funnel / retention / sequence suite entries. The DuckDB oracle replicates
the windowFunnel state machine (AggregateFunctionWindowFunnel.h:154-215) with
a struct-state list_reduce — same sort, same chain-start propagation."""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register

FUNNEL_TYPES = ["view", "click", "purchase"]
WINDOW_S = 7200  # 2 hours


def _funnel_level_sql(window_s: int) -> str:
    """DuckDB: level per user for the view→click→purchase funnel.

    Window-function formulation of the reference state machine (equivalent to
    the fold because chain state only ever carries the LAST l1 / last
    successful-l2 chain start):
      l1run(t) = ts of last idx-1 event ≤ t,
      s2       = chain start for a *successful* idx-2 event (ts ≤ l1run + W),
      l2run(t) = s2 of last successful idx-2 event ≤ t,
      level 3 iff any idx-3 event with ts ≤ l2run + W.
    (NOT expressed with list_reduce: DuckDB 1.0's list_reduce returns
    row-order-dependent results under vectorized multi-row execution — found
    by cross-checking against a pure-python reference run.)
    """
    win_us = window_s * 1_000_000
    idx_case = (
        "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 "
        "WHEN 'purchase' THEN 3 END"
    )
    return f"""
    ent AS (
      SELECT user_id AS u, epoch_us(ts) AS ts, {idx_case} AS idx
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    w1 AS (
      SELECT u, ts, idx,
             MAX(CASE WHEN idx = 1 THEN ts END)
               OVER (PARTITION BY u ORDER BY ts, idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l1run
      FROM ent
    ),
    w2 AS (
      SELECT u, ts, idx,
             CASE WHEN idx = 2 AND ts <= l1run + {win_us} THEN l1run END AS s2
      FROM w1
    ),
    w3 AS (
      SELECT u, ts, idx, s2,
             LAST_VALUE(s2 IGNORE NULLS)
               OVER (PARTITION BY u ORDER BY ts, idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l2run
      FROM w2
    ),
    levels AS (
      SELECT u AS user,
             MAX(CASE WHEN idx = 3 AND ts <= l2run + {win_us} THEN 3
                      WHEN s2 IS NOT NULL THEN 2
                      WHEN idx = 1 THEN 1 ELSE 0 END) AS level
      FROM w3 GROUP BY u
    )
    """


@register(
    "window_funnel_levels",
    f"""
    WITH {_funnel_level_sql(WINDOW_S)}
    SELECT level, COUNT(*) AS n_users FROM levels GROUP BY level
    """,
)
def window_funnel_levels(spark, sf_dir):
    from myscaledb_spark.operators.funnel import window_funnel

    ev = load_table(spark, sf_dir, "events")
    conds = [F.col("event_type") == t for t in FUNNEL_TYPES]
    lv = window_funnel(ev, "ts", "user_id", conds, WINDOW_S)
    return lv.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "retention_cohort",
    """
    WITH per_user AS (
      SELECT user_id AS user,
             MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
             MAX(CASE WHEN event_type = 'click' AND ts >= TIMESTAMP '2024-01-10' THEN 1 ELSE 0 END) AS c2,
             MAX(CASE WHEN event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-20' THEN 1 ELSE 0 END) AS c3
      FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(r1) AS BIGINT) AS n_r1, CAST(SUM(r1 * c2) AS BIGINT) AS n_r2,
           CAST(SUM(r1 * c3) AS BIGINT) AS n_r3, COUNT(*) AS n_users
    FROM per_user
    """,
)
def retention_cohort(spark, sf_dir):
    from myscaledb_spark.operators.funnel import retention

    ev = load_table(spark, sf_dir, "events")
    conds = [
        F.col("event_type") == "signup",
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-10").cast("timestamp")),
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.lit("2024-01-20").cast("timestamp")),
    ]
    r = retention(ev, "user_id", conds)
    return r.agg(
        F.sum("r1").alias("n_r1"),
        F.sum("r2").alias("n_r2"),
        F.sum("r3").alias("n_r3"),
        F.count(F.lit(1)).alias("n_users"),
    )


@register(
    "sequence_match_users",
    f"""
    WITH {_funnel_level_sql(10**12)}
    SELECT CAST(SUM(CASE WHEN level = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched, COUNT(*) AS n_users
    FROM levels
    """,
)
def sequence_match_users(spark, sf_dir):
    from myscaledb_spark.operators.funnel import sequence_match

    ev = load_table(spark, sf_dir, "events")
    conds = [F.col("event_type") == t for t in FUNNEL_TYPES]
    m = sequence_match(ev, "ts", "user_id", conds)
    return m.agg(
        F.sum("matched").alias("n_matched"), F.count(F.lit(1)).alias("n_users")
    )


@register(
    "sequence_next_node",
    """
    WITH ent AS (
      SELECT user_id AS u, ts, event_type
      FROM events WHERE event_type IN ('view', 'click', 'purchase', 'signup', 'error')
    ),
    nxt AS (
      SELECT u, event_type,
             LEAD(event_type) OVER (PARTITION BY u ORDER BY ts, event_type) AS next_type
      FROM ent
    )
    SELECT next_type, COUNT(*) AS n
    FROM nxt WHERE event_type = 'view' AND next_type IS NOT NULL
    GROUP BY next_type
    """,
)
def sequence_next_node(spark, sf_dir):
    """sequenceNextNode: the event that follows a matched event (head mode,
    forward direction — AggregateFunctionSequenceNextNode.h). Distribution of
    what users do right after a 'view'."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_type")
    nxt = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        nxt.filter((F.col("event_type") == "view") & F.col("next_type").isNotNull())
        .groupBy("next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "uniq_up_to",
    """
    SELECT (user_id % 7) AS bucket,
           LEAST(COUNT(DISTINCT event_type), 3 + 1) AS uniq_upto_3
    FROM events GROUP BY (user_id % 7)
    """,
)
def uniq_up_to(spark, sf_dir):
    """uniqUpTo(N): exact distinct count capped at N+1 (the reference's
    'more than N' marker)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy((F.col("user_id") % 7).alias("bucket")).agg(
        F.least(F.countDistinct("event_type"), F.lit(4)).alias("uniq_upto_3")
    )


# --- strict windowFunnel modes (AggregateFunctionWindowFunnel.h:239-247) -----
# Oracle: a recursive CTE replays the SAME per-user state machine row by row
# (an independent formulation — iteration over rows, not an array fold).

_IDX = (
    "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 "
    "WHEN 'purchase' THEN 3 ELSE 0 END"
)
_W_US = 2 * 86400 * 1_000_000  # 2-day window, micros


def _strict_oracle(s_order: bool, s_dedup: bool, s_inc: bool) -> str:
    frz = "(s.frz"
    if s_order:
        frz += " OR (e.idx = 0 AND s.s1 IS NOT NULL)"
    if s_dedup:
        frz += (
            " OR (e.idx = 1 AND s.s1 IS NOT NULL)"
            " OR (e.idx = 2 AND s.s2 IS NOT NULL)"
            " OR (e.idx = 3 AND s.s3 IS NOT NULL)"
        )
    frz += ")"
    inc2 = " AND e.tsu > s.p1" if s_inc else ""
    inc3 = " AND e.tsu > s.p2" if s_inc else ""
    ok2 = (
        f"(e.idx = 2 AND NOT {frz} AND s.s1 IS NOT NULL "
        f"AND e.tsu <= s.s1 + {_W_US}{inc2})"
    )
    ok3 = (
        f"(e.idx = 3 AND NOT {frz} AND s.s2 IS NOT NULL "
        f"AND e.tsu <= s.s2 + {_W_US}{inc3})"
    )
    return f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, epoch_us(ts) AS tsu, {_IDX} AS idx,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), {_IDX}) AS rn
      FROM events
    ),
    step AS (
      SELECT user_id, 0 AS rn,
             CAST(NULL AS BIGINT) AS s1, CAST(NULL AS BIGINT) AS s2,
             CAST(NULL AS BIGINT) AS s3, CAST(NULL AS BIGINT) AS p1,
             CAST(NULL AS BIGINT) AS p2, CAST(NULL AS BIGINT) AS p3,
             false AS frz
      FROM (SELECT DISTINCT user_id FROM ev WHERE idx > 0)
      UNION ALL
      SELECT e.user_id, e.rn,
             CASE WHEN e.idx = 1 AND NOT {frz} THEN e.tsu ELSE s.s1 END,
             CASE WHEN {ok2} THEN s.s1 ELSE s.s2 END,
             CASE WHEN {ok3} THEN s.s2 ELSE s.s3 END,
             CASE WHEN e.idx = 1 AND NOT {frz} THEN e.tsu ELSE s.p1 END,
             CASE WHEN {ok2} THEN e.tsu ELSE s.p2 END,
             CASE WHEN {ok3} THEN e.tsu ELSE s.p3 END,
             {frz}
      FROM step s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1
    ),
    last_step AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY rn DESC) AS rr
        FROM step
      ) WHERE rr = 1
    ),
    levels AS (
      SELECT user_id,
             CASE WHEN s3 IS NOT NULL THEN 3 WHEN s2 IS NOT NULL THEN 2
                  WHEN s1 IS NOT NULL THEN 1 ELSE 0 END AS level
      FROM last_step
    )
    SELECT level, COUNT(*) AS n_users FROM levels WHERE level > 0 GROUP BY level
    """


def _strict_gate(modes):
    from myscaledb_spark.operators.funnel import window_funnel_strict

    def fn(spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        conds = [F.col("event_type") == x for x in ("view", "click", "purchase")]
        lv = window_funnel_strict(ev, "ts", "user_id", conds, 2 * 86400, modes)
        return (
            lv.filter(F.col("level") > 0)
            .groupBy("level")
            .agg(F.count(F.lit(1)).alias("n_users"))
        )

    return fn


register("window_funnel_strict_order", _strict_oracle(True, False, False))(
    _strict_gate(["strict_order"])
)
register("window_funnel_strict_dedup", _strict_oracle(False, True, False))(
    _strict_gate(["strict_dedup"])
)
register("window_funnel_strict_increase", _strict_oracle(False, False, True))(
    _strict_gate(["strict_increase"])
)


# --- sequenceCount / gap-constrained sequenceMatch ---------------------------
# (AggregateFunctionSequenceMatch.h; oracle = recursive row replay of the
# same latest-ts DP, independent of the Spark fold)

_G2D = 2 * 86400 * 1_000_000
_G3D = 3 * 86400 * 1_000_000


@register(
    "sequence_count_view_purchase",
    f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, epoch_us(ts) AS tsu,
             CASE event_type WHEN 'view' THEN 1 WHEN 'purchase' THEN 2
                  ELSE 0 END AS idx,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts),
                  CASE event_type WHEN 'view' THEN 1 WHEN 'purchase' THEN 2
                       ELSE 0 END) AS rn
      FROM events
    ),
    step AS (
      SELECT user_id, 0 AS rn, CAST(NULL AS BIGINT) AS l1,
             CAST(NULL AS BIGINT) AS l2, 0 AS cnt
      FROM (SELECT DISTINCT user_id FROM ev WHERE idx > 0)
      UNION ALL
      SELECT e.user_id, e.rn,
        CASE WHEN (e.idx = 2 AND s.l1 IS NOT NULL AND e.tsu - s.l1 <= {_G3D})
             THEN NULL
             ELSE CASE WHEN e.idx = 1 THEN e.tsu ELSE s.l1 END END,
        CASE WHEN (e.idx = 2 AND s.l1 IS NOT NULL AND e.tsu - s.l1 <= {_G3D})
             THEN NULL ELSE s.l2 END,
        CASE WHEN (e.idx = 2 AND s.l1 IS NOT NULL AND e.tsu - s.l1 <= {_G3D})
             THEN s.cnt + 1 ELSE s.cnt END
      FROM step s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1
    ),
    last_step AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rr
        FROM step
      ) WHERE rr = 1
    )
    SELECT cnt AS n_matches, COUNT(*) AS n_users
    FROM last_step WHERE cnt > 0 GROUP BY cnt
    """,
)
def sequence_count_view_purchase(spark, sf_dir):
    """sequenceCount('(?1)(?t<=3d)(?2)') — non-overlapping view→purchase
    chains per user, summarized as a distribution."""
    from myscaledb_spark.operators.funnel import sequence_count

    ev = load_table(spark, sf_dir, "events")
    conds = [F.col("event_type") == "view", F.col("event_type") == "purchase"]
    out = sequence_count(ev, "ts", "user_id", conds, [3 * 86400])
    return (
        out.filter(F.col("n_matches") > 0)
        .groupBy("n_matches")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "sequence_match_gaps",
    f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, epoch_us(ts) AS tsu,
             CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                  WHEN 'purchase' THEN 3 ELSE 0 END AS idx,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts),
                  CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                       WHEN 'purchase' THEN 3 ELSE 0 END) AS rn
      FROM events
    ),
    step AS (
      SELECT user_id, 0 AS rn, CAST(NULL AS BIGINT) AS l1,
             CAST(NULL AS BIGINT) AS l2, CAST(NULL AS BIGINT) AS l3
      FROM (SELECT DISTINCT user_id FROM ev WHERE idx > 0)
      UNION ALL
      SELECT e.user_id, e.rn,
        CASE WHEN e.idx = 1 THEN e.tsu ELSE s.l1 END,
        CASE WHEN (e.idx = 2 AND s.l1 IS NOT NULL AND e.tsu - s.l1 <= {_G2D})
             THEN e.tsu ELSE s.l2 END,
        CASE WHEN (e.idx = 3 AND s.l2 IS NOT NULL AND e.tsu - s.l2 <= {_G2D})
             THEN e.tsu ELSE s.l3 END
      FROM step s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1
    ),
    last_step AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rr
        FROM step
      ) WHERE rr = 1
    )
    SELECT CAST(COUNT(*) FILTER (WHERE l3 IS NOT NULL) AS BIGINT) AS n_matched,
           COUNT(*) AS n_users
    FROM last_step
    """,
)
def sequence_match_gaps(spark, sf_dir):
    """sequenceMatch('(?1)(?t<=2d)(?2)(?t<=2d)(?3)') over
    view→click→purchase; single-row rollup (matched users / total users
    with at least one tagged event)."""
    from myscaledb_spark.operators.funnel import sequence_match_t

    ev = load_table(spark, sf_dir, "events")
    conds = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    out = sequence_match_t(ev, "ts", "user_id", conds, [2 * 86400, 2 * 86400])
    return out.agg(
        F.sum("matched").cast("bigint").alias("n_matched"),
        F.count(F.lit(1)).alias("n_users"),
    )


@register(
    "sequence_next_node_chain",
    """
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS n1,
             lead(event_type, 2) OVER w AS n2,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
    ),
    c AS (SELECT user_id, COUNT(*) AS m FROM events GROUP BY 1),
    f AS (
      -- the base is the FIRST cond-1 row; the chain is checked ONCE from
      -- there (no retry at later bases — getNextNodeIndex runs once)
      SELECT user_id, n1, n2,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS k
      FROM o WHERE event_type = 'click'
    )
    SELECT c.user_id AS user,
           CASE WHEN c.m > 2 AND f.n1 = 'view' THEN f.n2 END AS next_node
    FROM c LEFT JOIN f ON c.user_id = f.user_id AND f.k = 1
    """,
)
def sequence_next_node_gate(spark, sf_dir):
    """sequenceNextNode('forward', 'first_match')(ts, event_type, true,
    event_type = 'click', event_type = 'view') — the event following the
    first CONSECUTIVE click→view pair per user
    (AggregateFunctionSequenceNextNode.h:336-408; the oracle replays the
    same scan with lead() windows over the identical (ts, event) ordering)."""
    from myscaledb_spark.operators.funnel import sequence_next_node

    ev = load_table(spark, sf_dir, "events")
    return sequence_next_node(
        ev, "ts", "user_id", "event_type",
        [F.col("event_type") == "click", F.col("event_type") == "view"],
        direction="forward", base="first_match",
    )
