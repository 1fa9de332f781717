"""CREATE WINDOW VIEW DDL → Structured Streaming (r5 VERDICT ask #8).

Reference: `src/Storages/WindowView/StorageWindowView.h:21-93` — a WINDOW
VIEW watches its source table, applies a tumble()/hop() windowed aggregate
to inserted rows, and (with TO) pushes fired windows into a target table.

Spark mapping: the source table is a parquet directory consumed with the
file-source `readStream` (≈ FileLog engine; a Kafka source is the identical
code shape with `format("kafka")` when the connector jar is present); the
window clause maps to `F.window`, `WATERMARK=BOUNDED(i)` to
`withWatermark`, and the TO target is materialized by running the streaming
aggregation to completion with an availableNow trigger — batch-
deterministic, which is what the pytest oracle (the same aggregate as a
plain batch query) checks.  At scale the same plan runs continuously with a
real trigger; the fired-window semantics are Spark's watermark semantics,
pinned separately in tests/test_allowed_lateness.py.

Supported DDL shape (the reference's canonical form):

    CREATE WINDOW VIEW wv [TO tgt] [WATERMARK=BOUNDED(INTERVAL n UNIT)]
    AS SELECT tumble(ts, INTERVAL n UNIT) AS w, <aggs...> [, keys...]
    FROM src GROUP BY w [, keys...]

    hop(ts, INTERVAL slide UNIT, INTERVAL size UNIT) likewise (reference
    arg order slide-then-size, StorageWindowView.h:39-51).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: source table name → parquet path for the file-source stream; tests and
#: callers register paths before running the DDL (the reference reads its
#: source table's own storage — here streams need a directory source)
STREAM_SOURCES: dict[str, str] = {}

#: view name → dict(target, result DataFrame) for introspection
WINDOW_VIEWS: dict[str, dict] = {}

_WV_RE = re.compile(
    r"^\s*CREATE\s+WINDOW\s+VIEW\s+(?P<name>\w+)"
    r"(?:\s+TO\s+(?P<to>\w+))?"
    r"(?:\s+WATERMARK\s*=\s*BOUNDED\s*\(\s*INTERVAL\s+'?(?P<wmn>\d+)'?\s+"
    r"(?P<wmu>\w+)\s*\))?"
    r"\s+AS\s+(?P<select>SELECT\b.*)$",
    re.IGNORECASE | re.DOTALL,
)

_WIN_RE = re.compile(
    r"\b(?P<fn>tumble|hop)\s*\(\s*(?P<ts>\w+)\s*,\s*"
    r"INTERVAL\s+'?(?P<n1>\d+)'?\s+(?P<u1>\w+)\s*"
    r"(?:,\s*INTERVAL\s+'?(?P<n2>\d+)'?\s+(?P<u2>\w+)\s*)?\)"
    r"(?:\s+AS\s+(?P<alias>\w+))?",
    re.IGNORECASE,
)


def register_stream_source(table: str, path: str) -> None:
    """Map a source table name to the parquet directory its stream reads."""
    STREAM_SOURCES[table] = path


def is_window_view_ddl(stmt: str) -> bool:
    return bool(re.match(r"^\s*CREATE\s+WINDOW\s+VIEW\b", stmt, re.IGNORECASE))


def window_view_ddl(spark: SparkSession, stmt: str) -> DataFrame:
    """Execute CREATE WINDOW VIEW: build the streaming windowed aggregate,
    run it to completion (availableNow), register the result as the target
    view, and return it.  The window lands as `<alias>_start`/`<alias>_end`
    columns (the reference's tumbleStart/tumbleEnd accessors over its
    window tuple)."""
    from myscaledb_spark.sql_dialect import ChSqlError, _rewrite_calls, _split_args

    m = _WV_RE.match(stmt.strip().rstrip(";"))
    if m is None:
        raise ChSqlError(
            "unsupported CREATE WINDOW VIEW shape; expected CREATE WINDOW "
            "VIEW name [TO tgt] [WATERMARK=BOUNDED(INTERVAL n UNIT)] AS "
            "SELECT tumble(ts, INTERVAL n UNIT) AS w, aggs FROM src GROUP BY w"
        )
    name, target = m.group("name"), m.group("to") or m.group("name")
    select = m.group("select")
    sm = re.match(
        r"SELECT\s+(?P<items>.*?)\s+FROM\s+(?P<src>\w+)"
        r"(?:\s+GROUP\s+BY\s+(?P<gb>.*?))?\s*$",
        select, re.IGNORECASE | re.DOTALL,
    )
    if sm is None:
        raise ChSqlError("WINDOW VIEW query must be SELECT ... FROM src GROUP BY ...")
    src = sm.group("src")
    if src not in STREAM_SOURCES:
        raise ChSqlError(
            f"WINDOW VIEW source {src!r} has no registered stream directory "
            "— call streaming.window_view.register_stream_source(table, path)"
        )
    wm_ = _WIN_RE.search(sm.group("items"))
    if wm_ is None:
        raise ChSqlError("WINDOW VIEW needs a tumble()/hop() select item")
    ts_col = wm_.group("ts")
    alias = wm_.group("alias") or "w"
    unit1 = wm_.group("u1").lower().rstrip("s")
    if wm_.group("fn").lower() == "hop":
        if wm_.group("n2") is None:
            raise ChSqlError("hop() needs (ts, INTERVAL slide, INTERVAL size)")
        unit2 = wm_.group("u2").lower().rstrip("s")
        # reference order is (slide, size); Spark's window(size, slide)
        win = F.window(
            F.col(ts_col),
            f"{wm_.group('n2')} {unit2}",
            f"{wm_.group('n1')} {unit1}",
        )
    else:
        win = F.window(F.col(ts_col), f"{wm_.group('n1')} {unit1}")

    # remaining select items: aggregates and plain grouping keys
    items = _split_args(sm.group("items"))
    aggs, keys = [], []
    for it in items:
        it = it.strip()
        if _WIN_RE.match(it):
            continue
        am = re.match(r"(?P<expr>.*?)(?:\s+AS\s+(?P<al>\w+))?$", it,
                      re.IGNORECASE | re.DOTALL)
        expr = _rewrite_calls(am.group("expr").strip())
        col = F.expr(expr)
        if am.group("al"):
            col = col.alias(am.group("al"))
        if re.fullmatch(r"\w+", am.group("expr").strip()) and am.group("al") is None:
            keys.append(am.group("expr").strip())
        else:
            aggs.append(col)
    gb = [g.strip() for g in (sm.group("gb") or alias).split(",")]
    extra_keys = [g for g in gb if g and g != alias and g != ts_col]
    keys = list(dict.fromkeys(keys + extra_keys))
    if not aggs:
        raise ChSqlError("WINDOW VIEW needs at least one aggregate select item")

    from myscaledb_spark.streaming.windows import run_to_memory

    path = STREAM_SOURCES[src]
    batch_schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(batch_schema).parquet(path)
    # naive parquet timestamps arrive as TIMESTAMP_NTZ; windows want TIMESTAMP
    if dict((f.name, f.dataType.simpleString()) for f in batch_schema).get(
        ts_col
    ) == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if m.group("wmn"):
        stream = stream.withWatermark(
            ts_col, f"{m.group('wmn')} {m.group('wmu').lower().rstrip('s')}"
        )
    grouped = stream.groupBy(win.alias("_win"), *keys).agg(*aggs)
    flat = grouped.select(
        F.col("_win.start").alias(f"{alias}_start"),
        F.col("_win.end").alias(f"{alias}_end"),
        *[c for c in grouped.columns if c != "_win"],
    )
    out = run_to_memory(flat, f"_wv_{name}", mode="complete")
    out.createOrReplaceTempView(target)
    WINDOW_VIEWS[name] = {"target": target, "source": src, "ddl": stmt}
    return out
