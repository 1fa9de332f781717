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


def system_vector_index_event_log(
    spark: SparkSession, artifact_dir: str | None
) -> DataFrame:
    """≈ SELECT * FROM system.vector_index_event_log — the status-transition
    history the registry records on every set_status
    (src/VectorIndex/Interpreters/VIEventLog.cpp: NotBuilt → InProgress →
    Built/Dropped rows with timestamps)."""
    from myscaledb_spark.plans.vector_index import IndexRegistry

    # registry lifecycle → the reference's VIEventLog event_type vocabulary
    # (load/cache events don't exist here: artifacts are read per query, not
    # cached server-side — documented row-set difference)
    event_type = {
        "Defined": "DefinitionCreated",
        "NotBuilt": "DefinitionCreated",
        "InProgress": "BuildStart",
        "Built": "BuildSucceed",
        "Dropped": "DefinitionDroped",  # [sic] — reference spelling
    }
    reg = IndexRegistry(artifact_dir) if artifact_dir else None
    # live records + archived histories of reset definitions (VIEventLog
    # rows outlive the index definition — 00030_mqvs_vector_event_log)
    sources = (reg.list() + reg.archived_events()) if reg else []
    rows = [
        (
            "default",
            r.get("table", ""),
            r.get("name"),
            e.get("status"),
            event_type.get(e.get("status"), e.get("status")),
            float(e.get("event_time", 0.0)),
            float(e.get("event_time", 0.0)) * 1e6,
        )
        for r in sources
        for e in r.get("events", [])
    ]
    return spark.createDataFrame(
        rows,
        "database string, table string, name string, status string, "
        "event_type string, event_time double, event_time_microseconds double",
    )


#: canonical index-type spellings as the reference's system.vector_indices
#: prints them (Search::IndexType names — pinned by the 00041/00038
#: .reference outputs); the `type` column shows the RESOLVED type even for
#: `TYPE default` declarations (VIUtils getDefaultIndexType)
_CANON_VI_TYPE = {
    "MSTG": "MSTG", "BINARYMSTG": "BinaryMSTG", "FLAT": "FLAT",
    "BINARYFLAT": "BinaryFLAT", "IVFFLAT": "IVFFLAT", "IVFPQ": "IVFPQ",
    "IVFSQ": "IVFSQ", "HNSWFLAT": "HNSWFLAT", "HNSWPQ": "HNSWPQ",
    "HNSWSQ": "HNSWSQ", "SCANN": "SCANN",
}


def _vi_type_display(r: dict) -> str:
    decl = r.get("declared_type")
    if decl and str(decl).upper() not in ("DEFAULT",):
        # an explicit TYPE is shown as WRITTEN ('IVFFlat' stays, 00018)
        return str(decl)
    resolved = r.get("index_type") or "FLAT"
    return _CANON_VI_TYPE.get(str(resolved).upper(), str(resolved))


def system_vector_indices_ddl(
    spark: SparkSession, artifact_dir: str | None
) -> DataFrame:
    """≈ SELECT * FROM system.vector_indices with the REFERENCE's columns
    (StorageSystemVIs.cpp:40-52: database/table/name/type/expr/total_parts/
    parts_with_vector_index/small_parts/status/host_name/latest_failed_part/
    latest_fail_reason) — the shape its own test scripts select. Dropped
    indexes fall out of the listing, as in the reference. Artifacts here are
    whole-table (Spark has no part granularity), so total_parts ==
    parts_with_vector_index == 1 and small_parts == 0 once Built."""
    import socket

    from myscaledb_spark.plans.vector_index import IndexRegistry

    host = socket.gethostname()

    def _part_counts(r: dict) -> tuple[int, int]:
        """(total_parts, parts_with_vector_index). With the part tracker:
        total = active parts; covered = parts whose OWN index segment is
        live (a decoupled merged part counts 0 — its self-segment is
        PENDING until the rebuild lands: 00034/00037_support_multiple).
        API-built whole-table artifacts keep the 1/1 shape."""
        try:
            from myscaledb_spark.plans.table_ddl import TABLES, _part_label
        except ImportError:  # pragma: no cover
            return 1, 1 if r.get("status") == "Built" else 0
        parts = TABLES.get(r.get("table", ""), {}).get("parts")
        if parts is None:
            return 1, 1 if r.get("status") == "Built" else 0
        total = len(parts)
        segs = r.get("segments")
        if segs is not None:
            owned = {p for p, o, _i, st in segs if p == o and st != "PENDING"}
            covered = sum(1 for p in parts if _part_label(p) in owned)
        else:
            covered = total if r.get("status") == "Built" else 0
        return total, covered

    rows = []
    for r in (IndexRegistry(artifact_dir).list() if artifact_dir else []):
        if r.get("status") == "Dropped":
            continue
        total_parts, covered_parts = _part_counts(r)
        rows.append((
            "default",
            r.get("table", ""),
            r.get("name"),
            _vi_type_display(r),
            r.get("expr")
            or f"{r.get('name')} {r.get('column', '')} TYPE "
            f"{r.get('declared_type') or r.get('index_type') or 'FLAT'}",
            total_parts,
            covered_parts,
            0,
            r.get("status"),
            host,
            r.get("latest_failed_part", ""),
            r.get("latest_fail_reason", ""),
        ))
    # replicas surface the primary's indexes under their own table name
    # (ReplicatedMergeTree metadata replication; 00034)
    try:
        from myscaledb_spark.plans.table_ddl import TABLES

        replicas = {
            t: meta["replica_of"] for t, meta in TABLES.items()
            if meta.get("replica_of")
        }
        rows += [
            (row[0], rep) + row[2:]
            for rep, primary in replicas.items()
            for row in rows
            if row[1] == primary
        ]
    except ImportError:  # pragma: no cover
        pass
    return spark.createDataFrame(
        rows,
        "database string, table string, name string, type string, expr string, "
        "total_parts bigint, parts_with_vector_index bigint, small_parts bigint, "
        "status string, host_name string, latest_failed_part string, "
        "latest_fail_reason string",
    )


def system_data_skipping_indices(spark: SparkSession) -> DataFrame:
    """≈ SELECT * FROM system.data_skipping_indices — the skipping-index
    declarations ch_ddl recorded (StorageSystemDataSkippingIndices.cpp)."""
    from myscaledb_spark.plans.table_ddl import SKIP_INDICES

    rows = [
        ("default", t, r["name"], r["type"], r["expr"], r["granularity"])
        for t, recs in SKIP_INDICES.items()
        for r in recs
    ]
    return spark.createDataFrame(
        rows,
        "database string, table string, name string, type string, expr string, "
        "granularity bigint",
    )


def system_vector_index_segments(
    spark: SparkSession, artifact_dir: str | None
) -> DataFrame:
    """≈ system.vector_index_segments (StorageSystemVIsWithPart.cpp:43-56).
    Records carrying part-model ``segments`` lineage (ch_ddl tables —
    table_ddl part tracker) report one row per (part, owner_part): LOADED
    while cache-resident, BUILT when the artifact was evicted
    (DETACH/ATTACH — VICacheManager residency, 00031), PENDING for a
    decoupled merged part's own not-yet-rebuilt index (00032/00034/00037).
    Detached tables disappear from the listing. API-built whole-table
    artifacts keep the single compact-part BUILT row."""
    from myscaledb_spark.plans.ddl import compact_part_name
    from myscaledb_spark.plans.table_ddl import TABLES
    from myscaledb_spark.plans.vector_index import IndexRegistry

    rows = []
    for r in (IndexRegistry(artifact_dir).list() if artifact_dir else []):
        if r.get("status") == "Dropped":
            continue
        table = r.get("table", "")
        if TABLES.get(table, {}).get("detached"):
            continue
        segs = r.get("segments")
        if segs is not None:
            # an EMPTY list is real state (post-TRUNCATE: parts gone, no
            # segments) — only records that never tracked parts fall back
            # to the legacy whole-table row
            resident = r.get("cache_resident", True)
            for part, owner, oid, st in segs:
                disp = st if st == "PENDING" else (
                    "LOADED" if resident else "BUILT"
                )
                rows.append((
                    "default", table, part, owner, int(oid), r.get("name"),
                    _vi_type_display(r), 0, disp, 0, 0, 0, 100, 0, "",
                ))
        elif r.get("status") == "Built":
            rows.append((
                "default", table, compact_part_name(table),
                compact_part_name(table), 0, r.get("name"),
                _vi_type_display(r), 0, "BUILT", 0, 0, 0, 100, 0, "",
            ))
    return spark.createDataFrame(
        rows,
        "database string, table string, part string, owner_part string, "
        "owner_part_id int, name string, type string, dimension int, "
        "status string, total_vectors bigint, memory_usage_bytes bigint, "
        "disk_usage_bytes bigint, progress int, elapsed bigint, error string",
    )


def system_parts(spark: SparkSession) -> DataFrame:
    """≈ system.parts — one row per ACTIVE part from the part tracker
    (real `all_min_max_level[_mut]` names — 00022 pins the merge lineage);
    tables without tracked parts keep the legacy one-compact-part row
    (StorageSystemParts.cpp surface, reduced)."""
    from myscaledb_spark.plans.ddl import compact_part_name
    from myscaledb_spark.plans.table_ddl import TABLES, _part_label

    rows = []
    for t, meta in TABLES.items():
        if meta.get("detached"):
            continue
        parts = meta.get("parts")
        if parts:
            rows += [("default", t, _part_label(p), True, 1) for p in parts]
        elif parts is None:
            rows.append((
                "default", t, compact_part_name(t), True,
                int(meta.get("n_parts", 0) > 0),
            ))
    # ``active`` is UInt8-as-boolean in the reference and appears as a bare
    # predicate (`... AND active`) in its test scripts — BOOLEAN here
    return spark.createDataFrame(
        rows, "database string, table string, name string, active boolean, has_rows int"
    )


def system_merge_tree_settings(spark: SparkSession) -> DataFrame:
    """≈ SELECT name FROM system.merge_tree_settings — the vector-search
    MergeTree settings the reference registers (MergeTreeSettings.h; the
    engine accepts them as no-ops, plans/table_ddl._NOOP_SETTINGS)."""
    names = [
        "min_rows_to_build_vector_index",
        "min_bytes_to_build_vector_index",
        "build_vector_index_on_random_single_replica",
        "enable_rebuild_for_decouple",
        "disable_rebuild_for_decouple",
        "float_vector_search_metric_type",
        "binary_vector_search_metric_type",
        "index_granularity",
        "enable_brute_force_vector_search",
        "max_rows_in_building_vector_index",
        "slow_mode_build_vector_index_in_merge",
    ]
    return spark.createDataFrame([(n, "") for n in names], "name string, value string")


def system_zookeeper(
    spark: SparkSession, artifact_dir: str | None = None
) -> DataFrame:
    """≈ system.zookeeper — replication coordination state. Replication is
    a no-op here, but the per-replica ``vidx_info`` node is real metadata:
    one ``<part>\\t<index>\\n`` entry per (active part, built vector index),
    part names WITHOUT the mutation suffix (VIDescriptions::toString over
    getPartNameWithoutMutation — 00032_mqvs_vector_index_autoload). The
    node appears with the first build, survives DROP VECTOR INDEX as an
    empty value, and vanishes with DROP TABLE."""
    rows: list[tuple[str, str, str]] = []
    if artifact_dir is not None:
        from myscaledb_spark.plans.table_ddl import (
            TABLES,
            _part_base_label,
            _part_label,
        )
        from myscaledb_spark.plans.vector_index import IndexRegistry

        recs = IndexRegistry(artifact_dir).list()
        for t, meta in TABLES.items():
            zkp = meta.get("zk_replica_path")
            if not zkp or meta.get("detached"):
                continue
            trecs = [r for r in recs if r.get("table") == t and "segments" in r]
            if not trecs:
                continue  # node is created by the first index build
            live = sorted(
                (r for r in trecs if r.get("status") != "Dropped"),
                key=lambda r: r.get("seq", 0),
            )
            entries = []
            for p in meta.get("parts") or []:
                lbl = _part_label(p)
                for r in live:
                    if any(seg[0] == lbl for seg in r.get("segments") or []):
                        entries.append(f"{_part_base_label(p)}\t{r['name']}\n")
            rows.append(("vidx_info", "".join(entries), zkp))
    return spark.createDataFrame(
        rows, "name string, value string, path string"
    )


def system_one(spark: SparkSession) -> DataFrame:
    """≈ system.one — exactly one row with `dummy UInt8 = 0`; the implicit
    FROM of a table-less SELECT (StorageSystemOne.cpp)."""
    return spark.createDataFrame([(0,)], "dummy smallint")


def system_numbers(spark: SparkSession) -> DataFrame:
    """≈ system.numbers — the reference streams an UNBOUNDED counter that
    only terminates under LIMIT (StorageSystemNumbers.cpp); a lazy 2^32
    range is the practical analog: LIMIT prunes it to a few splits, and an
    unbounded full scan is as pathological as it is on the reference.
    ONE partition, like the reference's single ordered stream — with many
    partitions a per-partition LocalLimit evaluates projections on rows
    near 2^32 (00179: sequence(0, number) explodes on partition 31)."""
    return spark.range(0, 1 << 32, 1, 1).toDF("number")


def system_data_type_families(spark: SparkSession) -> DataFrame:
    """≈ SELECT name FROM system.data_type_families — every ClickHouse type
    name ch_type_to_spark maps, plus the parametric families and the
    multimodal ObjectToFetch type (StorageSystemDataTypeFamilies.cpp)."""
    canon = {
        "Int8", "Int16", "Int32", "Int64", "UInt8", "UInt16", "UInt32",
        "UInt64", "Float32", "Float64", "String", "FixedString", "Date",
        "Date32", "DateTime", "DateTime64", "Bool", "UUID", "Decimal",
        "Enum8", "Enum16", "Array", "Map", "Tuple", "Nullable",
        "LowCardinality", "AggregateFunction", "SimpleAggregateFunction",
        "Object", "ObjectToFetch",
    }
    # SQL-standard synonyms ParserDataType registers case-insensitively
    # (table_ddl._SIMPLE_TYPES accepts them); list the canonical uppercase
    # spellings only — .capitalize() would fabricate names like 'Uint8'
    # that the reference never prints.
    canon.update({
        "INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT", "FLOAT",
        "DOUBLE", "VARCHAR", "TEXT",
    })
    return spark.createDataFrame(
        [(n,) for n in sorted(canon)], "name string"
    )


def system_connections(spark: SparkSession) -> DataFrame:
    """≈ system.connections — CREATE CONNECTION records
    (InterpreterCreateConnectionQuery.cpp; columns per its storage:
    name, provider, arn, external_id)."""
    from myscaledb_spark.plans.table_ddl import CONNECTIONS

    rows = [
        (n, p.get("provider", ""), p.get("aws_role_arn", ""),
         p.get("aws_role_external_id", ""))
        for n, p in CONNECTIONS.items()
    ]
    return spark.createDataFrame(
        rows, "name string, provider string, arn string, external_id string"
    )


def system_functions(spark: SparkSession) -> DataFrame:
    """≈ SELECT name FROM system.functions — every function name the dialect
    rewrites plus the search/multimodal table functions
    (StorageSystemFunctions.cpp)."""
    from myscaledb_spark import sql_dialect as d

    names = set()
    for attr in ("TEMPLATES", "SPECIAL"):
        names.update(getattr(d, attr, {}) or {})
    names.update(getattr(d, "USER_FUNCTIONS", {}) or {})
    names.update(
        {"distance", "batch_distance", "textsearch", "hybridsearch",
         "getObject", "ObjectToFetch", "full_text_search"}
    )
    return spark.createDataFrame(
        [(n,) for n in sorted(names, key=str)], "name string"
    )
