"""Introspection — the reference's system tables (`system.tables`,
`system.columns`, `system.vector_indices`, `attachSystemTables.cpp:144-145`)
as DataFrames over the Spark catalog + our index registries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def system_tables(spark: SparkSession) -> DataFrame:
    """≈ SELECT * FROM system.tables."""
    rows = [
        (t.namespace[0] if t.namespace else "", t.name, t.tableType, t.isTemporary)
        for t in spark.catalog.listTables()
    ]
    return spark.createDataFrame(
        rows, "database string, name string, engine string, is_temporary boolean"
    )


def system_columns(spark: SparkSession, table: str) -> DataFrame:
    """≈ SELECT * FROM system.columns WHERE table = ..."""
    rows = [
        (table, c.name, c.dataType, c.nullable)
        for c in spark.catalog.listColumns(table)
    ]
    return spark.createDataFrame(
        rows, "table string, name string, type string, nullable boolean"
    )


def explain_estimate(df: DataFrame) -> dict:
    """≈ EXPLAIN ESTIMATE (row/byte estimates from optimizer statistics,
    `src/Interpreters/InterpreterExplainQuery.cpp`)."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    row_count = stats.rowCount()
    return {
        "size_in_bytes": int(stats.sizeInBytes().longValue())
        if hasattr(stats.sizeInBytes(), "longValue")
        else int(str(stats.sizeInBytes())),
        "row_count": int(str(row_count.get())) if row_count.isDefined() else None,
    }


def system_vector_indices(spark: SparkSession, artifact_dir: str) -> DataFrame:
    """≈ SELECT * FROM system.vector_indices — from the index registry."""
    from myscaledb_spark.plans.vector_index import IndexRegistry

    recs = IndexRegistry(artifact_dir).list()
    rows = [
        (
            r.get("name"),
            r.get("column"),
            r.get("index_type"),
            str(r.get("params")),
            r.get("status"),
        )
        for r in recs
    ]
    return spark.createDataFrame(
        rows, "name string, column string, type string, params string, status string"
    )


#: ch_sql statement log — ≈ system.query_log (the reference records every
#: query with its normalized form; we record the CH statement, the Spark SQL
#: it rewrote to, and the rewrite/planning wall time. Execution time lives
#: with the action, which Spark's own listener/UI already tracks.)
QUERY_LOG: list[dict] = []


def log_query(statement: str, translated: str, rewrite_ms: float, kind: str = "select") -> None:
    import time

    QUERY_LOG.append(
        {
            "event_time": time.time(),
            "kind": kind,
            "query": statement,
            "translated": translated,
            "rewrite_ms": round(rewrite_ms, 3),
        }
    )


def system_query_log(spark: SparkSession) -> DataFrame:
    """≈ SELECT * FROM system.query_log (attachSystemTables.cpp)."""
    schema = (
        "event_time double, kind string, query string, translated string, "
        "rewrite_ms double"
    )
    rows = [
        (r["event_time"], r["kind"], r["query"], r["translated"], r["rewrite_ms"])
        for r in QUERY_LOG
    ]
    return spark.createDataFrame(rows, schema)


def system_vector_index_event_log(spark: SparkSession, artifact_dir: str) -> DataFrame:
    """≈ SELECT * FROM system.vector_index_event_log — the status-transition
    history the registry records on every set_status
    (src/VectorIndex/Interpreters/VIEventLog.cpp: NotBuilt → InProgress →
    Built/Dropped rows with timestamps)."""
    from myscaledb_spark.plans.vector_index import IndexRegistry

    rows = [
        (r.get("name"), e.get("status"), float(e.get("event_time", 0.0)))
        for r in IndexRegistry(artifact_dir).list()
        for e in r.get("events", [])
    ]
    return spark.createDataFrame(
        rows, "name string, status string, event_time double"
    )
