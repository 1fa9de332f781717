"""Regression tests for the round-7 ADVICE findings plus the computed
INTERPOLATE form (r7 VERDICT ask #5).

1. (medium) WITH FILL INTERPOLATE must keep the head query's select-item
   order — `* EXCEPT` used to move interpolated columns to the end.
2. (low) GROUPS-frame SQL rewrite must reject JOIN / multi-table shapes
   instead of ranking the first table alone.
3. (low) SESSION_SETTINGS must reset per conformance file (client-session
   scope), not leak across files.
4. (low) Compound ALTER must raise on a leading non-index action instead
   of silently dropping it.
5. (low) EXPLAIN SYNTAX must not fabricate a PREWHERE print for WHERE
   shapes beyond the conservatively-modelable 00024 heuristic.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.plans.table_ddl import (
    SESSION_SETTINGS,
    ch_script,
    reset_session_settings,
    set_statement,
)
from myscaledb_spark.sql_dialect import ChSqlError, ch_sql


def test_interpolate_preserves_column_order(spark):
    out = ch_sql(
        spark,
        """
        SELECT o_orderkey AS d, round(sum(o_totalprice), 2) AS rev,
               count(*) AS n
        FROM orders WHERE o_orderkey BETWEEN 1 AND 29 GROUP BY o_orderkey
        ORDER BY d WITH FILL FROM 1 TO 30 INTERPOLATE (rev)
        """,
    )
    assert out.columns == ["d", "rev", "n"]  # rev mid-list, not appended
    rows = out.collect()
    assert len(rows) == 29
    # fill rows carry the closest preceding original rev
    by_d = {r.d: r for r in rows}
    carried = None
    for d in range(1, 30):
        r = by_d[d]
        if r.n is not None:
            carried = r.rev
        else:
            assert r.rev == carried


def test_interpolate_computed_expr_compounds(spark):
    out = ch_sql(
        spark,
        """
        SELECT o_orderkey AS d, round(sum(o_totalprice), 2) AS rev,
               count(*) AS n
        FROM orders WHERE o_orderkey < 8 GROUP BY o_orderkey
        ORDER BY d WITH FILL FROM 1 TO 12 INTERPOLATE (rev AS rev * 2)
        """,
    ).collect()
    by_d = {r.d: r for r in out}
    carried, k = None, 0
    for d in sorted(by_d):
        r = by_d[d]
        if r.n is not None:
            carried, k = r.rev, 0
        else:
            k += 1
            assert r.rev == carried * (2 ** k)  # exact binary scaling


def test_interpolate_other_column_reads_previous_output_row(spark):
    """r7 pinned this shape as a refusal; r8 implements the reference's
    actual semantics (02233_interpolate_1: `inter AS inter2 + inter`):
    the referenced column reads the PREVIOUS OUTPUT row — the anchor's
    value on a gap's first fill, the column default (n = 0) on later
    fills."""
    rows = {
        r["d"]: (r["n"], r["rev"])
        for r in ch_sql(
            spark,
            """
            SELECT o_orderkey AS d, count(*) AS n, sum(o_totalprice) AS rev
            FROM orders WHERE o_orderkey IN (1, 6) GROUP BY o_orderkey
            ORDER BY d WITH FILL FROM 1 TO 8 INTERPOLATE (rev AS rev + n)
            """,
        ).collect()
    }
    n1, rev1 = rows[1]
    assert rows[2] == (0, rev1 + n1)          # first fill: anchor's n
    assert rows[3] == (0, rev1 + n1)          # later fills add default 0
    assert rows[5] == (0, rev1 + n1)
    n6, rev6 = rows[6]
    assert n6 >= 1
    assert rows[7] == (0, rev6 + n6)


def test_with_fill_api_computed_interpolate(spark):
    from myscaledb_spark.operators.relational import with_fill

    df = spark.createDataFrame(
        [(1, 10.0), (5, 80.0)], "x int, v double"
    )
    rows = {
        r.x: r.v
        for r in with_fill(
            df, "x", 1, interpolate={"v": lambda c: c * 2}
        ).collect()
    }
    assert rows == {1: 10.0, 2: 20.0, 3: 40.0, 4: 80.0, 5: 80.0}


def test_groups_frame_rejects_join(spark):
    with pytest.raises(ChSqlError, match="single-table"):
        ch_sql(
            spark,
            """
            SELECT o_orderkey,
                   sum(o_totalprice) OVER (ORDER BY o_orderdate
                     GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s
            FROM orders JOIN customer ON o_custkey = c_custkey
            """,
        )


def test_session_settings_reset():
    set_statement("SET optimize_move_to_prewhere_for_vector_search = 0")
    assert (
        SESSION_SETTINGS["optimize_move_to_prewhere_for_vector_search"] == "0"
    )
    reset_session_settings()
    assert "optimize_move_to_prewhere_for_vector_search" not in SESSION_SETTINGS


def test_compound_alter_rejects_leading_non_index_action(spark, tmp_path):
    from myscaledb_spark.errors import InvalidSearchQuery
    from myscaledb_spark.plans.ddl import alter_index_ddl

    df = spark.range(10).select(
        F.col("id"), F.array(F.rand(1), F.rand(2)).alias("vec")
    )
    with pytest.raises(InvalidSearchQuery, match="compound ALTER"):
        alter_index_ddl(
            spark,
            "ALTER TABLE t MODIFY SETTING x = 1, "
            "ADD VECTOR INDEX vi vec TYPE FLAT",
            df,
            "id",
            str(tmp_path),
        )


def test_explain_syntax_falls_back_beyond_pinned_shape(spark):
    ch_script(spark, """
        DROP TABLE IF EXISTS adv7_vec;
        CREATE TABLE adv7_vec (id UInt32, label String, v UInt32)
          ENGINE = MergeTree ORDER BY id;
        INSERT INTO adv7_vec SELECT number, 'x', number FROM numbers(10)
    """)
    try:
        # three conjuncts: beyond the 00024 two-single-column-conjunct
        # heuristic — the print must NOT fabricate a PREWHERE
        out = [
            r[0]
            for r in ch_script(
                spark,
                "EXPLAIN SYNTAX SELECT id FROM adv7_vec "
                "WHERE id > 1 AND label = 'x' AND v < 9",
            ).collect()
        ]
        assert not any("PREWHERE" in line for line in out)
        # the pinned two-conjunct shape still prints the 00024 form
        out2 = [
            r[0]
            for r in ch_script(
                spark,
                "EXPLAIN SYNTAX SELECT id FROM adv7_vec "
                "WHERE id > 1 AND label = 'x'",
            ).collect()
        ]
        assert "PREWHERE id > 1" in out2
    finally:
        ch_script(spark, "DROP TABLE adv7_vec")


def test_groups_frame_multiple_window_specs(spark, duck):
    """r7: GROUPS windows with DIFFERENT (PARTITION BY, ORDER BY) specs in
    one query each get their own dense_rank — checked against DuckDB's
    longhand emulation of both frames."""
    got = ch_sql(
        spark,
        """
        SELECT o_orderkey,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_orderpriority ORDER BY o_orderdate
                 GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS s1,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_custkey
                 GROUPS BETWEEN CURRENT ROW AND 2 FOLLOWING), 2) AS s2
        FROM orders WHERE o_custkey < 60
        """,
    ).collect()
    want = duck.sql(
        """
        WITH r AS (
          SELECT o_orderkey, o_totalprice, o_orderpriority, o_orderstatus,
                 DENSE_RANK() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_orderdate) AS g1,
                 DENSE_RANK() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_custkey) AS g2
          FROM orders WHERE o_custkey < 60
        )
        SELECT o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                 PARTITION BY o_orderpriority ORDER BY g1
                 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS s1,
               ROUND(SUM(o_totalprice) OVER (
                 PARTITION BY o_orderstatus ORDER BY g2
                 RANGE BETWEEN CURRENT ROW AND 2 FOLLOWING), 2) AS s2
        FROM r
        """
    ).fetchall()
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in want)
