"""Round-8 SQL-surface gates — multi-array ARRAY JOIN zip, WITH TOTALS over
subquery FROMs, ClickHouse default-value semantics (outer joins + INSERT),
and tuple-literal field access. Each runs VERBATIM ClickHouse SQL through
ch_sql/ch_ddl against the driver tables, with an independent DuckDB oracle.

Reference parity:
  - ArrayJoinAction.cpp (multi-array zip — 00013_create_table_with_arrays)
  - TotalsHavingTransform.cpp (totals key defaults — 00015/00016)
  - HashJoin.cpp join_use_nulls=0 (00049/00055_join_two_numbers)
  - 00071_insert_fewer_columns (omitted columns = type defaults)
  - 00027_argMinMax (tuple literals, `.N` access)
"""

from __future__ import annotations

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register


@register(
    "ch_sql_array_join_zip",
    """
    SELECT l_orderkey AS k, l_linenumber AS a,
           CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                   ORDER BY l_linenumber) AS BIGINT) AS n
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def ch_sql_array_join_zip(spark, sf_dir):
    """Multi-array ARRAY JOIN zips positionally (ArrayJoinAction.cpp;
    00013): the per-order sorted linenumber array zipped with its
    arrayEnumerate index reproduces ROW_NUMBER over the flat rows."""
    from myscaledb_spark.sql_dialect import ch_sql

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_ajz_l")
    return ch_sql(
        spark,
        """
        SELECT k, a, CAST(n AS Int64) AS n
        FROM (
          SELECT l_orderkey AS k, arraySort(groupArray(l_linenumber)) AS arr
          FROM _ajz_l WHERE l_orderkey < 200 GROUP BY l_orderkey
        ) ARRAY JOIN arr AS a, arrayEnumerate(arr) AS n
        """,
    )


@register(
    "ch_sql_totals_subquery",
    """
    WITH b AS (
      SELECT o_orderkey % 7 AS g, COUNT(*) AS n
      FROM orders WHERE o_orderkey < 2000 GROUP BY 1
    )
    SELECT g, n FROM b
    UNION ALL
    SELECT 0 AS g, CAST(SUM(n) AS BIGINT) AS n FROM b
    """,
)
def ch_sql_totals_subquery(spark, sf_dir):
    """WITH TOTALS over a SUBQUERY FROM: the totals row's key takes the
    TYPE DEFAULT (0), resolved via plan analysis since no table schema is
    in scope (TotalsHavingTransform.cpp; 00015_totals_having_constants)."""
    from myscaledb_spark.sql_dialect import ch_sql

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_tot_o")
    return ch_sql(
        spark,
        """
        SELECT g, count() AS n
        FROM (SELECT o_orderkey % 7 AS g FROM _tot_o WHERE o_orderkey < 2000)
        GROUP BY g WITH TOTALS
        ORDER BY g
        """,
    )


@register(
    "ch_sql_left_join_defaults",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS k, CAST(n_regionkey AS BIGINT) AS v,
           COALESCE(CASE WHEN n_regionkey < 3 THEN r_name END, '') AS rname
    FROM nation LEFT JOIN region
      ON n_regionkey = r_regionkey AND r_regionkey < 3
    ORDER BY k
    """,
)
def ch_sql_left_join_defaults(spark, sf_dir):
    """join_use_nulls=0 (the ClickHouse DEFAULT): non-matched LEFT JOIN
    rows fill with TYPE DEFAULTS ('' here), never NULL (HashJoin.cpp;
    00049/00055). Applies because both sides are ch_ddl tables — parquet
    catalog views keep SQL NULL semantics."""
    from myscaledb_spark.plans.table_ddl import ch_ddl
    from myscaledb_spark.sql_dialect import ch_sql

    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_ljd_nv")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("_ljd_rv")
    ch_ddl(spark, "DROP TABLE IF EXISTS _ljd_n")
    ch_ddl(spark, "DROP TABLE IF EXISTS _ljd_r")
    ch_ddl(spark,
           "CREATE TABLE _ljd_n (k Int64, v Int64) ENGINE = MergeTree ORDER BY k")
    ch_ddl(spark,
           "CREATE TABLE _ljd_r (rk Int64, rname String) ENGINE = MergeTree ORDER BY rk")
    ch_ddl(spark, "INSERT INTO _ljd_n SELECT n_nationkey, n_regionkey FROM _ljd_nv")
    ch_ddl(spark, "INSERT INTO _ljd_r SELECT r_regionkey, r_name FROM _ljd_rv")
    return ch_sql(
        spark,
        """
        SELECT n.k AS k, n.v AS v, r.rname AS rname
        FROM _ljd_n n LEFT JOIN _ljd_r r ON n.v = r.rk AND r.rk < 3
        ORDER BY k
        """,
    )


@register(
    "ch_sql_insert_defaults",
    """
    SELECT s_suppkey AS k, '' AS note, CAST(0 AS DOUBLE) AS score
    FROM supplier WHERE s_suppkey <= 20 ORDER BY k
    """,
)
def ch_sql_insert_defaults(spark, sf_dir):
    """INSERT with omitted columns writes TYPE DEFAULTS (''/0), never NULL
    (00071_insert_fewer_columns)."""
    from myscaledb_spark.plans.table_ddl import ch_ddl
    from myscaledb_spark.sql_dialect import ch_sql

    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("_insd_s")
    ch_ddl(spark, "DROP TABLE IF EXISTS _insd_t")
    ch_ddl(spark,
           "CREATE TABLE _insd_t (k Int64, note String, score Float64) "
           "ENGINE = MergeTree ORDER BY k")
    ch_ddl(spark,
           "INSERT INTO _insd_t (k) SELECT s_suppkey FROM _insd_s WHERE s_suppkey <= 20")
    return ch_sql(spark, "SELECT k, note, score FROM _insd_t ORDER BY k")


@register(
    "ch_sql_tuple_access",
    """
    SELECT arg_min(l_partkey, (l_orderkey * 10 + l_linenumber) * 1000000 + l_partkey) AS amin,
           arg_max(l_partkey, (l_orderkey * 10 + l_linenumber) * 1000000 + l_partkey) AS amax,
           COUNT(*) AS n
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def ch_sql_tuple_access(spark, sf_dir):
    """Aliased tuple literal + `.N` field access feeding argMin/argMax
    (ExpressionElementParsers tuple; 00027_argMinMax): `(a, b) AS t` maps
    to struct fields col1..colN, the `t.1`/`t.2` accesses resolve to them.
    The order axis folds the answer column in, so axis ties imply equal
    answers and the picks are exact at every scale factor."""
    from myscaledb_spark.sql_dialect import ch_sql

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_tup_l")
    return ch_sql(
        spark,
        """
        SELECT argMin(t.1, t.2) AS amin, argMax(t.1, t.2) AS amax,
               count() AS n
        FROM (
          SELECT (l_partkey, (l_orderkey * 10 + l_linenumber) * 1000000 + l_partkey) AS t
          FROM _tup_l WHERE l_orderkey < 500
        )
        """,
    )
