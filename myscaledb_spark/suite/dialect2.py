"""Clause-level CH-SQL dialect gates: FROM t FINAL, SAMPLE f, LIMIT n BY.

Each entry runs the reference's verbatim clause syntax through
`ch_sql` (sql_dialect.py structural rewrites driven by
`register_table_engine` metadata — the stand-in for the table DDL the
reference consults) and is checked against a DuckDB oracle that spells the
same semantics out longhand.
"""

from __future__ import annotations

from myscaledb_spark.catalog import load_table
from myscaledb_spark.sql_dialect import ch_sql, register_table_engine
from myscaledb_spark.suite import register

_SAMPLE_02 = int(0.2 * (1 << 48))


@register(
    "ch_sql_final_replacing",
    """
    SELECT user_id, event_type, event_id AS last_event_id,
           ROUND(value, 4) AS last_value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND user_id < 40
    """,
)
def ch_sql_final_replacing(spark, sf_dir):
    """`SELECT ... FROM t FINAL` with a ReplacingMergeTree registration —
    verbatim reference read syntax (00039_test_final.sh)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_chf_events")
    register_table_engine(
        "_chf_events", "replacing", ["user_id", "event_type"], version="event_id"
    )
    return ch_sql(
        spark,
        """
        SELECT user_id, event_type, event_id AS last_event_id,
               round(value, 4) AS last_value
        FROM _chf_events FINAL
        WHERE user_id < 40
        """,
    )


@register(
    "ch_sql_final_summing",
    """
    SELECT l_suppkey, l_returnflag,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           ARG_MIN(l_orderkey, l_orderkey * 100000 + l_linenumber) AS first_orderkey
    FROM lineitem
    GROUP BY 1, 2
    HAVING l_suppkey < 50
    """,
)
def ch_sql_final_summing(spark, sf_dir):
    """SummingMergeTree FINAL through SQL: l_quantity sums per key (exact —
    integer-valued doubles), every other column pinned to the first row in
    insertion order. Exercises the schema-aware rewrite path."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_chf_li")
    register_table_engine(
        "_chf_li",
        "summing",
        ["l_suppkey", "l_returnflag"],
        sum_cols=["l_quantity"],
        order="l_orderkey * 100000 + l_linenumber",
    )
    return ch_sql(
        spark,
        """
        SELECT l_suppkey, l_returnflag,
               cast(l_quantity as double) AS sum_qty,
               l_orderkey AS first_orderkey
        FROM _chf_li FINAL
        WHERE l_suppkey < 50
        """,
    )


@register(
    "ch_sql_sample_orders",
    f"""
    WITH s AS (
      SELECT * FROM orders
      WHERE CAST(('0x' || substr(md5('0:' || CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT)
            < {_SAMPLE_02}
    )
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM s
    """,
)
def ch_sql_sample_orders(spark, sf_dir):
    """`FROM t SAMPLE 0.2` — deterministic SAMPLE BY key sampling in SQL,
    identical row selection to operators.relational.sample_by."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_chs_orders")
    register_table_engine(
        "_chs_orders", "none", [], sample_by="o_orderkey"
    )
    return ch_sql(
        spark,
        """
        SELECT count(*) AS n,
               cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total,
               min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        FROM _chs_orders SAMPLE 0.2
        """,
    )


@register(
    "ch_sql_asof_join",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         m AS (
           SELECT p.event_id, p.user_id, p.ts,
                  (SELECT MAX(c.ts) FROM c
                   WHERE c.user_id = p.user_id AND c.ts < p.ts) AS click_ts
           FROM p WHERE p.user_id < 20
         )
    SELECT m.event_id, m.ts, m.click_ts, c2.event_id AS click_id
    FROM m LEFT JOIN c c2
      ON c2.user_id = m.user_id AND c2.ts = m.click_ts
    """,
)
def ch_sql_asof_join(spark, sf_dir):
    """Verbatim `ASOF LEFT JOIN` syntax — per purchase, the latest strictly
    earlier click of the same user — rewritten to a correlated LATERAL
    lookup (HashJoin.cpp asof strictness). (user_id, ts) is unique among
    clicks in the testdata, so the kept row is well-defined."""
    ev = load_table(spark, sf_dir, "events")
    ev.filter("event_type = 'purchase'").createOrReplaceTempView("_asof_p")
    ev.filter("event_type = 'click'").createOrReplaceTempView("_asof_c")
    return ch_sql(
        spark,
        """
        SELECT l.event_id, l.ts, r.ts AS click_ts, r.event_id AS click_id
        FROM _asof_p l ASOF LEFT JOIN _asof_c r
          ON l.user_id = r.user_id AND l.ts > r.ts
        WHERE l.user_id < 20
        """,
    )


@register(
    "ch_sql_with_fill_daily",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    grid AS (
      SELECT unnest(generate_series((SELECT MIN(day) FROM daily),
                                    (SELECT MAX(day) FROM daily),
                                    INTERVAL 1 DAY)) AS day
    )
    SELECT CAST(grid.day AS TIMESTAMP) AS day, COALESCE(daily.n, 0) AS n
    FROM grid LEFT JOIN daily ON grid.day = daily.day
    """,
)
def ch_sql_with_fill_daily(spark, sf_dir):
    """`ORDER BY day WITH FILL STEP INTERVAL 1 DAY` in verbatim CH syntax —
    the grid-join rewrite (FillingTransform.cpp). Fill rows carry NULL; the
    COALESCE to the reference's 0-default happens on the result frame."""
    from pyspark.sql import functions as F

    load_table(spark, sf_dir, "events").createOrReplaceTempView("_chw_events")
    filled = ch_sql(
        spark,
        """
        SELECT toStartOfDay(ts) AS day, count(*) AS n
        FROM _chw_events
        WHERE event_type = 'purchase'
        GROUP BY toStartOfDay(ts)
        ORDER BY day WITH FILL STEP INTERVAL 1 DAY
        """,
    )
    return filled.select("day", F.coalesce("n", F.lit(0)).alias("n"))


@register(
    "ch_sql_limit_by_orders",
    """
    SELECT o_custkey, o_orderkey, o_totalprice AS price
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders WHERE o_custkey < 200
    ) WHERE rn <= 2
    """,
)
def ch_sql_limit_by_orders(spark, sf_dir):
    """`ORDER BY ... LIMIT 2 BY o_custkey` — the reference's per-group
    top-n clause, rewritten to a ranked window (LimitByTransform.cpp).

    The oracle intentionally drops the rewrite's trailing global ORDER BY:
    the gate compares order-insensitively, and the kept-rows set is what
    LIMIT BY defines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_chl_orders")
    return ch_sql(
        spark,
        """
        SELECT o_custkey, o_orderkey, o_totalprice AS price
        FROM _chl_orders
        WHERE o_custkey < 200
        ORDER BY price DESC, o_orderkey ASC
        LIMIT 2 BY o_custkey
        """,
    )


@register(
    "ch_sql_datetime_funcs",
    """
    SELECT CAST(quarter(o_orderdate) AS INT) AS q,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS band,
           COUNT(*) AS n,
           CAST(MIN(date_diff('day', o_orderdate,
                              o_orderdate + INTERVAL 30 DAY)) AS BIGINT) AS dd,
           MIN(strftime(o_orderdate, '%Y-%m')) AS fm,
           CAST(MIN(weekofyear(o_orderdate)) AS INT) AS wk
    FROM orders
    GROUP BY 1, 2
    """,
)
def ch_sql_datetime_funcs(spark, sf_dir):
    """dateDiff / multiIf / formatDateTime / addDays / toQuarter / toWeek —
    the dialect's special handlers end-to-end (reference:
    src/Functions/formatDateTime.cpp, dateDiff.cpp, multiIf.cpp)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_chd_orders")
    return ch_sql(
        spark,
        """
        SELECT cast(toQuarter(o_orderdate) as int) AS q,
               multiIf(o_totalprice > 200000, 'high',
                       o_totalprice > 100000, 'mid', 'low') AS band,
               count(*) AS n,
               cast(min(dateDiff('day', o_orderdate,
                                 addDays(o_orderdate, 30))) as bigint) AS dd,
               min(formatDateTime(o_orderdate, '%Y-%m')) AS fm,
               cast(min(toISOWeek(o_orderdate)) as int) AS wk
        FROM _chd_orders
        GROUP BY toQuarter(o_orderdate), 2
        """,
    )


@register(
    "ch_sql_array_funcs",
    r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[^\p{L}\p{N}]+'),
                         t -> len(t) > 0) AS toks
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(len(list_distinct(toks)) AS BIGINT) AS uniq_toks,
           toks[list_position(list_transform(toks, t -> len(t) > 5), true)]
             AS first_long,
           CAST(COALESCE(list_position(list_transform(toks, t -> len(t) > 5),
                                       true), 0) AS BIGINT) AS first_long_idx,
           CAST(to_json((list_concat(toks[1:3], ['_', '_', '_', '_', '_']))[1:5]) AS VARCHAR) AS first5
    FROM tk
    """,
)
def ch_sql_array_funcs(spark, sf_dir):
    """tokens / arrayUniq / arrayFirst / arrayFirstIndex / arrayResize /
    arraySlice through the dialect (FunctionsStringArray / array family)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_cha_docs")
    return ch_sql(
        spark,
        """
        SELECT doc_id,
               cast(arrayUniq(tokens(text)) as bigint) AS uniq_toks,
               arrayFirst(t -> length(t) > 5, tokens(text)) AS first_long,
               arrayFirstIndex(t -> length(t) > 5, tokens(text)) AS first_long_idx,
               to_json(arrayResize(arraySlice(tokens(text), 1, 3), 5, '_')) AS first5
        FROM _cha_docs
        WHERE doc_id < 50
        """,
    )


@register(
    "ch_sql_time_buckets",
    """
    WITH b AS (
      SELECT TIMESTAMP '1970-01-01 00:00:00'
               + CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) * INTERVAL 1 SECOND
               AS bucket,
             value
      FROM events
    )
    SELECT bucket, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM b GROUP BY bucket
    """,
)
def ch_sql_time_buckets(spark, sf_dir):
    """toStartOfInterval(ts, INTERVAL 6 HOUR) — epoch-aligned time-series
    bucketing in verbatim CH syntax (src/Functions/toStartOfInterval.cpp)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_chb_events")
    return ch_sql(
        spark,
        """
        SELECT toStartOfInterval(ts, INTERVAL 6 HOUR) AS bucket,
               count(*) AS n,
               cast(sum(cast(round(value, 4) as decimal(18,4))) as double) AS total
        FROM _chb_events
        GROUP BY toStartOfInterval(ts, INTERVAL 6 HOUR)
        """,
    )


@register(
    "ch_sql_with_totals",
    """
    SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN ''
                ELSE o_orderpriority END AS o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), ())
    """,
)
def ch_sql_with_totals(spark, sf_dir):
    """`GROUP BY ... WITH TOTALS` in verbatim CH syntax — rewritten to
    GROUPING SETS with the empty set as the totals row, whose key columns
    carry the reference's TYPE DEFAULTS (''/0, TotalsHavingTransform.cpp) —
    the r4 NULL-key deviation is closed via the schema-aware rewrite."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_cht_orders")
    return ch_sql(
        spark,
        """
        SELECT o_orderpriority, count(*) AS n,
               cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total
        FROM _cht_orders
        GROUP BY o_orderpriority WITH TOTALS
        """,
    )
