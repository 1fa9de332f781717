"""CREATE LIVE VIEW / WATCH DDL (r7; reference
`src/Storages/LiveView/StorageLiveView.cpp`): the stored query re-evaluates
against current source data on every read, `_version` advances per applied
source write, WATCH EVENTS returns the bare version, and both DROP VIEW
and DROP TABLE remove the view.  Each read is checked against the same
query run directly on the table (the batch oracle)."""

from __future__ import annotations

import pytest

from myscaledb_spark.plans.table_ddl import ch_script
from myscaledb_spark.sql_dialect import ChSqlError


@pytest.fixture()
def lv(spark):
    ch_script(spark, """
        DROP TABLE IF EXISTS lvt;
        CREATE TABLE lvt (k Int64, v Int64) ENGINE = MergeTree ORDER BY k;
        INSERT INTO lvt VALUES (1, 10), (2, 20);
        CREATE LIVE VIEW lv_tot AS SELECT sum(v) AS s, count(*) AS n FROM lvt
    """)
    yield "lv_tot"
    ch_script(spark, "DROP VIEW IF EXISTS lv_tot; DROP TABLE IF EXISTS lvt")


def _watch(spark, name):
    return ch_script(spark, f"WATCH {name}").collect()[0]


def test_live_view_refreshes_and_versions(spark, lv):
    r = _watch(spark, lv)
    assert (r.s, r.n, r._version) == (30, 2, 1)

    # plain SELECT reads the refreshed result (no _version column)
    sel = ch_script(spark, "SELECT s, n FROM lv_tot").collect()[0]
    assert (sel.s, sel.n) == (30, 2)

    ch_script(spark, "INSERT INTO lvt VALUES (3, 30)")
    r = _watch(spark, lv)
    oracle = ch_script(spark, "SELECT sum(v) AS s FROM lvt").collect()[0]
    assert (r.s, r.n, r._version) == (oracle.s, 3, 2)

    # DELETE is a write too
    ch_script(spark, "DELETE FROM lvt WHERE k = 1")
    r = _watch(spark, lv)
    assert (r.s, r.n, r._version) == (50, 2, 3)

    ev = ch_script(spark, "WATCH lv_tot EVENTS").collect()
    assert ev == [ev[0].__class__(version=3)] or ev[0].version == 3


def test_live_view_in_joins_and_nesting(spark, lv):
    ch_script(spark, "CREATE LIVE VIEW lv_top AS SELECT s + 1 AS s1 FROM lv_tot")
    try:
        r = ch_script(spark, "SELECT s1 FROM lv_top").collect()[0]
        assert r.s1 == 31
        ch_script(spark, "INSERT INTO lvt VALUES (9, 100)")
        assert ch_script(spark, "SELECT s1 FROM lv_top").collect()[0].s1 == 131
    finally:
        ch_script(spark, "DROP VIEW lv_top")


def test_live_view_errors(spark, lv):
    with pytest.raises(ChSqlError, match="already exists"):
        ch_script(spark, "CREATE LIVE VIEW lv_tot AS SELECT 1 AS x")
    ch_script(spark, "CREATE LIVE VIEW IF NOT EXISTS lv_tot AS SELECT 1 AS x")
    with pytest.raises(ChSqlError, match="does not exist"):
        ch_script(spark, "WATCH lv_nope")
    with pytest.raises(ChSqlError, match="_version"):
        ch_script(spark, "SELECT _version FROM lv_tot")
    # DROP TABLE works on a live view like the reference
    ch_script(spark, "CREATE LIVE VIEW lv_tmp AS SELECT 1 AS x")
    ch_script(spark, "DROP TABLE lv_tmp")
    with pytest.raises(ChSqlError, match="does not exist"):
        ch_script(spark, "WATCH lv_tmp")
