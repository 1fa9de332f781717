"""CREATE LIVE VIEW / WATCH — the reference's continuously-refreshed query
result (`src/Storages/LiveView/StorageLiveView.cpp`).

ClickHouse stores the query, keeps its CURRENT result materialized, bumps a
``_version`` counter whenever a source-table write changes the result, and
streams (result, _version) pairs to WATCH clients.  The Spark-first batch
emulation keeps the query TEXT and re-evaluates on read — Catalyst re-plans
against the source tables' current state, so a SELECT over the view is
always the refreshed result (what StorageLiveView's refresh would have
produced), with no push machinery:

  - ``CREATE LIVE VIEW lv AS SELECT ...`` records the query and a snapshot
    of each source table's write epoch.
  - Reading ``FROM lv`` in any ch_sql query substitutes the stored query
    text as a subquery (textual, so it always sees current data — a Spark
    temp view would freeze the resolved plan of the CREATE-time store).
  - ``WATCH lv`` returns the current result plus ``_version``;
    ``WATCH lv EVENTS`` returns just the version row.  The version is
    1 + the number of source-table writes since CREATE — the same
    "bump per applied write" the reference's counter performs (its
    deduplication of no-op refreshes is not reproduced; documented).

The continuous/streaming WATCH surface maps to the Structured-Streaming
materialized-view chain (streaming/materialized_views.py) — LIVE VIEW DDL
here is the batch-script face of the same semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

#: name → {"sql": stored query text, "epochs": {table: write epoch at create}}
LIVE_VIEWS: dict[str, dict] = {}

#: table → number of writes (INSERT / DELETE / TRUNCATE) applied via ch_ddl
WRITE_EPOCH: dict[str, int] = {}


def note_write(table: str) -> None:
    """Called by table_ddl on every applied write — advances live-view
    versions of views reading ``table``."""
    WRITE_EPOCH[table] = WRITE_EPOCH.get(table, 0) + 1


def _err(msg: str):
    from myscaledb_spark.sql_dialect import ChSqlError

    return ChSqlError(msg)


def _source_tables(query_sql: str) -> list[str]:
    from myscaledb_spark.sql_dialect import _string_mask

    mask = _string_mask(query_sql)
    return [
        m.group(2)
        for m in re.finditer(r"\b(FROM|JOIN)\s+([A-Za-z_]\w*)", mask,
                             re.IGNORECASE)
    ]


_CREATE_LV_RE = re.compile(
    r"^\s*CREATE\s+LIVE\s+VIEW\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)"
    r"(?:\s+WITH\s+TIMEOUT(?:\s+\d+)?)?\s+AS\s+(?P<query>.+)$",
    re.IGNORECASE | re.DOTALL,
)


def is_live_view_stmt(sql: str) -> bool:
    return bool(re.match(
        r"^\s*(CREATE\s+LIVE\s+VIEW|WATCH)\b", sql, re.IGNORECASE))


def create_live_view(sql: str) -> None:
    m = _CREATE_LV_RE.match(sql.strip().rstrip(";"))
    if m is None:
        raise _err(f"cannot parse CREATE LIVE VIEW statement {sql[:80]!r}")
    name = m.group("name")
    if name in LIVE_VIEWS:
        if m.group("ine"):
            return
        raise _err(f"live view {name!r} already exists")
    query = m.group("query").strip()
    LIVE_VIEWS[name] = {
        "sql": query,
        "epochs": {t: WRITE_EPOCH.get(t, 0) for t in _source_tables(query)},
    }


def drop_live_view(name: str, if_exists: bool = False) -> bool:
    """True if a live view was dropped (callers fall through otherwise)."""
    if name in LIVE_VIEWS:
        del LIVE_VIEWS[name]
        return True
    if not if_exists:
        raise _err(f"live view {name!r} does not exist")
    return False


def live_view_version(name: str) -> int:
    rec = LIVE_VIEWS[name]
    return 1 + sum(
        WRITE_EPOCH.get(t, 0) - e0 for t, e0 in rec["epochs"].items()
    )


def substitute_live_views(sql: str) -> str:
    """Replace every ``FROM/JOIN <live view>`` reference with the stored
    query as a named subquery — textual, so the view re-evaluates against
    the source tables' CURRENT contents (StorageLiveView's refresh
    semantics).  Nested views resolve by fixpoint."""
    if not LIVE_VIEWS:
        return sql
    from myscaledb_spark.sql_dialect import _string_mask

    for _ in range(10):
        mask = _string_mask(sql)
        repl = None
        for name, rec in LIVE_VIEWS.items():
            m = re.search(
                rf"\b(FROM|JOIN)\s+{re.escape(name)}\b", mask, re.IGNORECASE
            )
            if m:
                repl = (m, name, rec)
                break
        if repl is None:
            return sql
        m, name, rec = repl
        if re.search(r"\b_version\b", _string_mask(sql)):
            raise _err(
                "_version is only available through WATCH "
                f"{name} — plain SELECTs read the refreshed result without "
                "the version counter"
            )
        kw = m.group(1)
        sql = (
            sql[: m.start()]
            + f"{kw} ({rec['sql']}) AS {name}"
            + sql[m.end():]
        )
    raise _err("live view nesting deeper than 10 levels")


def watch_live_view(spark: SparkSession, sql: str) -> DataFrame:
    m = re.match(
        r"^\s*WATCH\s+(\w+)(\s+EVENTS)?(?:\s+LIMIT\s+\d+)?\s*$",
        sql.strip().rstrip(";"), re.IGNORECASE,
    )
    if m is None:
        raise _err(f"cannot parse WATCH statement {sql[:80]!r}")
    name = m.group(1)
    if name not in LIVE_VIEWS:
        raise _err(f"live view {name!r} does not exist")
    ver = live_view_version(name)
    if m.group(2):
        return spark.createDataFrame([(ver,)], "version bigint")
    from myscaledb_spark.sql_dialect import ch_sql

    inner = substitute_live_views(LIVE_VIEWS[name]["sql"])
    return ch_sql(
        spark,
        f"SELECT *, CAST({ver} AS BIGINT) AS _version FROM ({inner}) _lvw",
    )
