"""Regression pins for the r9 ADVICE findings.

1 (high)   sql_dialect._rewrite_div_zero absorbed clause keywords (SELECT,
           WHERE, HAVING, ON, ...) before a parenthesized numerator as call
           heads, emitting invalid SQL for '(expr)/(expr)' right after the
           keyword.
2 (medium) operators.stats.rank_corr value-tier cells path keyed driver
           dicts by raw collected floats: distinct float('nan') objects
           split a NaN tie-group spanning >1 cell of the other axis.
3 (medium) tools.conformance._cleanup_file_state left NESTED_TABLES /
           TABLES registry entries behind, so one file's undropped Nested
           table backtick-mangled later files' `alias.col` references.
4 (low)    run_file's finally cleaned with a stale module-global artifact
           path; "" evicted the ENTIRE persisted frame cache.
"""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_div_zero_keywords_not_call_heads():
    """'(a)/(b)' directly after a clause keyword must wrap only the paren
    group, never absorb the keyword as a function name."""
    from myscaledb_spark.sql_dialect import _rewrite_div_zero as rw

    for sql, keyword in [
        ("SELECT (a+b)/(c-d) FROM t", "SELECT"),
        ("SELECT x FROM t WHERE (a)/(b) > 1", "WHERE"),
        ("SELECT x FROM t HAVING (s)/(c) < 2", "HAVING"),
        ("SELECT a FROM t1 JOIN t2 ON (t1.a)/(t2.b) > 1", "ON"),
        ("SELECT DISTINCT (a)/(b) FROM t", "DISTINCT"),
    ]:
        out = rw(sql)
        assert "CASE WHEN" in out, sql
        # the keyword survives as a clause word followed by the wrap —
        # never glued into a call like `SELECT(...)`-as-function or moved
        assert f"{keyword} (CASE" in out, f"{sql!r} -> {out!r}"

    # genuine call heads (including word-shaped aggregate names) ARE
    # absorbed so the aggregate is not pushed inside the per-row CASE
    out = rw("SELECT any(a)/(b) FROM t")
    assert "(any(a)) / ((b))" in out and "any((CASE" not in out
    out = rw("SELECT sum(a)/count() FROM t")
    assert "(sum(a)) / (count())" in out


def test_div_zero_keyword_forms_execute(spark):
    """End-to-end through the dialect: the rewritten forms must parse and
    produce ClickHouse IEEE semantics (x/0 = Inf, 0/0 = NaN)."""
    from myscaledb_spark.sql_dialect import ch_sql

    r = ch_sql(
        spark,
        "SELECT (number + 1)/(number - number) AS v FROM numbers(1)",
    ).first()
    assert math.isinf(r.v) and r.v > 0
    # WHERE (a)/(b): the paren group right after WHERE must stay a plain
    # predicate operand (number=0 row excluded: 0/0=NaN and Spark orders
    # NaN greatest, a documented comparison deviation from IEEE)
    rows = ch_sql(
        spark,
        "SELECT number FROM numbers(5) "
        "WHERE (number + number)/(number) > 1 AND number != 0",
    ).collect()
    assert [r.number for r in rows] == [1, 2, 3, 4]


def test_rank_corr_value_tier_nan_single_tie_group(spark):
    """A value-tier (low-cardinality) axis containing NaN spread over
    several cells of the other axis must treat all NaN as ONE tie group
    (Spark groupBy normalizes NaN; the driver-side dicts must too)."""
    from myscaledb_spark.operators.stats import rank_corr

    nan = float("nan")
    # x: 3 distinct values incl. NaN -> value tier; y: unique -> NaN cells
    # of x span many distinct y cells
    data = [
        (1.0, 10.0), (1.0, 20.0), (2.0, 30.0), (2.0, 40.0),
        (nan, 50.0), (nan, 60.0), (nan, 70.0), (nan, 80.0),
        (1.0, 90.0), (2.0, 100.0),
    ]
    df = spark.createDataFrame(data, "x double, y double")
    got = rank_corr(df, "x", "y").first().rank_corr

    pdf = df.toPandas()
    # oracle: average ranks with NaN as a real tie group ranked last —
    # matches the engine's NULL-first / NaN-last ordering
    want = (
        pdf["x"].rank(na_option="bottom").corr(pdf["y"].rank())
    )
    assert got == pytest.approx(want, abs=1e-12)


def test_conformance_cleanup_pops_nested_registry(spark, tmp_path):
    """A conformance file that CREATEs a Nested table and never DROPs it
    must not leave NESTED_TABLES / TABLES entries to contaminate later
    files' `alias.col` references."""
    from myscaledb_spark.plans.table_ddl import TABLES as DDL_TABLES
    from myscaledb_spark.sql_dialect import NESTED_TABLES
    from tools.conformance import run_file

    f = tmp_path / "nested_no_drop.sql"
    f.write_text(
        "CREATE TABLE nst_leak (x UInt32, n Nested(i8 Int8, s String)) "
        "ENGINE = MergeTree ORDER BY x;\n"
        "INSERT INTO nst_leak VALUES (1, [1, 2], ['a', 'b']);\n"
        "SELECT x FROM nst_leak;\n"
    )
    status, _ = run_file(spark, str(f))
    assert status in ("PASS", "RAN")
    assert "nst_leak" not in NESTED_TABLES
    assert "nst_leak" not in DDL_TABLES
    assert not any(
        t.name.startswith("nst_leak") for t in spark.catalog.listTables()
    )
    # a later query using alias `n` with column `i8` must NOT be
    # backtick-mangled into a nonexistent `n.i8` dotted column
    from myscaledb_spark.sql_dialect import ch_sql

    r = ch_sql(
        spark,
        "SELECT n.i8 FROM (SELECT 42 AS i8) AS n",
    ).first()
    assert r[0] == 42


def test_frame_cache_empty_prefix_is_noop():
    """evict_prefix('') must not clear the whole cache (every key
    startswith(''))."""
    from myscaledb_spark.plans import frame_cache

    class _Fake:
        unpersisted = False

        def unpersist(self):
            self.unpersisted = True
            return self

    key = ("/tmp/advice_r9_fake_root/idx", "frame")
    frame_cache._CACHE[key] = _Fake()
    try:
        frame_cache.evict_prefix("")
        assert key in frame_cache._CACHE
        frame_cache.evict_prefix("/tmp/advice_r9_fake_root")
        assert key not in frame_cache._CACHE
    finally:
        frame_cache._CACHE.pop(key, None)
