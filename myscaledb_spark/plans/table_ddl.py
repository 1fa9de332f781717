"""CREATE TABLE ... ENGINE = <MergeTree family> and INSERT INTO — the
reference's table DDL surface (`src/Parsers/ParserCreateQuery.cpp`,
`src/Storages/MergeTree/registerStorageMergeTree.cpp`) so a user can stand a
table up and populate it with their statements verbatim:

    CREATE TABLE t (k Int64, price Float64, ver Int64)
        ENGINE = ReplacingMergeTree(ver) ORDER BY k [SAMPLE BY k]
    INSERT INTO t VALUES (1, 1.5, 1), (2, 7.0, 1)
    INSERT INTO t SELECT o_orderkey, o_totalprice, 1 FROM orders
    SELECT * FROM t FINAL          -- via ch_sql; collapse uses the DDL

Engine metadata lands in sql_dialect.TABLE_ENGINES (what the reference reads
from the DDL at query time), so FROM t FINAL / SAMPLE f work immediately.

Spark mapping:
  - the table is a session temp view; rows live in a backing view
    ``<t>__store`` carrying a hidden monotonically increasing insertion
    sequence ``_ch_iseq`` — the stand-in for the reference's within-part row
    order that Collapsing/Summing merges depend on. The logical view ``t``
    excludes it, so ``SELECT *`` matches the declared schema.
  - INSERT appends by unioning DataFrames (each insert is one "part");
    every append localCheckpoints the store when the union lineage grows
    past a threshold, which is exactly the reference's part-merge moment.
  - PARTITION BY / SETTINGS / index clauses parse and are recorded but do
    not change the plan (Spark handles physical layout; indexes go through
    plans/ddl.py).

At scale the same surface would write a real catalog table (saveAsTable /
insertInto); the temp-view store keeps the gate hermetic.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myscaledb_spark.sql_dialect import (
    ChSqlError,
    TABLE_ENGINES,
    _split_args,
    _top_level_mask,
    register_table_engine,
)

ISEQ = "_ch_iseq"
_CHECKPOINT_EVERY = 16  # parts before the store lineage is squashed

#: ClickHouse type → Spark SQL type (ParserDataType; the unsigned widths
#: widen one step since Spark has no unsigned integers)
_SIMPLE_TYPES = {
    "int8": "tinyint", "int16": "smallint", "int32": "int", "int64": "bigint",
    "uint8": "int", "uint16": "int", "uint32": "bigint", "uint64": "bigint",
    "float32": "float", "float64": "double", "string": "string",
    "date": "date", "date32": "date", "datetime": "timestamp",
    "datetime64": "timestamp", "bool": "boolean", "boolean": "boolean",
    "uuid": "string",
}


def ch_type_to_spark(t: str) -> str:
    t = t.strip()
    low = t.lower()
    if low in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[low]
    m = re.fullmatch(r"(nullable|lowcardinality)\s*\((.*)\)", low, re.DOTALL)
    if m:
        return ch_type_to_spark(m.group(2))  # everything is nullable in Spark
    m = re.fullmatch(r"array\s*\((.*)\)", low, re.DOTALL)
    if m:
        return f"array<{ch_type_to_spark(m.group(1))}>"
    m = re.fullmatch(r"decimal\s*\((\d+)\s*,\s*(\d+)\)", low)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    m = re.fullmatch(r"fixedstring\s*\(\d+\)", low)
    if m:
        return "string"
    m = re.fullmatch(r"datetime64\s*\(.*\)", low)
    if m:
        return "timestamp"
    raise ChSqlError(f"unsupported ClickHouse type {t!r}")


_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<table>\w+)\s*\(",
    re.IGNORECASE,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<table>\w+)\s*(?:\((?P<cols>[\w\s,]*)\))?\s*"
    r"(?P<rest>VALUES|SELECT|WITH)\b",
    re.IGNORECASE | re.DOTALL,
)

#: created tables: name → {"schema": [(col, spark_type)...], "n_parts": int}
TABLES: dict[str, dict] = {}
_SEQ: dict[str, int] = {}


def _parse_engine(clause: str) -> tuple[str, list[str]]:
    m = re.match(r"\s*(\w+)\s*(?:\((?P<args>.*?)\))?\s*$", clause, re.DOTALL)
    if not m:
        raise ChSqlError(f"cannot parse ENGINE clause {clause!r}")
    args = [a.strip() for a in _split_args(m.group("args") or "") if a.strip()]
    return m.group(1), args


def _parse_key_list(raw: str) -> list[str]:
    raw = raw.strip()
    if raw.startswith("(") and raw.endswith(")"):
        raw = raw[1:-1]
    keys = [k.strip() for k in _split_args(raw) if k.strip()]
    if not keys or not all(re.fullmatch(r"\w+", k) for k in keys):
        raise ChSqlError(f"ORDER BY must be plain columns, got {raw!r}")
    return keys


def create_table(spark: SparkSession, sql: str) -> dict:
    """Execute a CREATE TABLE ... ENGINE statement; returns the metadata."""
    m = _CREATE_RE.match(sql)
    if not m:
        raise ChSqlError("not a CREATE TABLE statement")
    table = m.group("table")
    open_idx = sql.index("(", m.start())
    # match the column-list parens
    depth, i = 0, open_idx
    while i < len(sql):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                break
        i += 1
    cols_raw, tail = sql[open_idx + 1 : i], sql[i + 1 :]

    schema: list[tuple[str, str]] = []
    for item in _split_args(cols_raw):
        it = item.strip()
        if not it or re.match(r"(CONSTRAINT|INDEX|PRIMARY\s+KEY)\b", it, re.IGNORECASE):
            continue  # constraints/indexes parse but route through their own ops
        cm = re.match(r"(\w+)\s+(.+?)(?:\s+DEFAULT\s+.+)?$", it, re.DOTALL)
        if not cm:
            raise ChSqlError(f"cannot parse column declaration {it!r}")
        schema.append((cm.group(1), ch_type_to_spark(cm.group(2))))
    if not schema:
        raise ChSqlError("CREATE TABLE needs at least one plain column")

    em = re.search(r"\bENGINE\s*=\s*", tail, re.IGNORECASE)
    if not em:
        raise ChSqlError("CREATE TABLE needs ENGINE = <MergeTree family>")
    ekind_end = re.search(
        r"\b(PRIMARY\s+KEY|ORDER\s+BY|PARTITION\s+BY|SAMPLE\s+BY|TTL|SETTINGS)\b|$",
        tail[em.end() :],
        re.IGNORECASE,
    )
    engine, eargs = _parse_engine(tail[em.end() : em.end() + ekind_end.start()])
    rest = tail[em.end() + ekind_end.start() :]

    def clause(kw: str) -> str | None:
        cm = re.search(
            rf"\b{kw}\b\s+(.*?)(?=\b(PRIMARY\s+KEY|ORDER\s+BY|PARTITION\s+BY|"
            rf"SAMPLE\s+BY|TTL|SETTINGS)\b|$)",
            rest,
            re.IGNORECASE | re.DOTALL,
        )
        return cm.group(1).strip() if cm else None

    order_raw = clause("ORDER\\s+BY") or clause("PRIMARY\\s+KEY")
    sample_raw = clause("SAMPLE\\s+BY")
    colnames = [c for c, _ in schema]

    eng = engine.lower()
    kind, version, sign, sum_cols = "none", None, None, ()
    keys: list[str] = _parse_key_list(order_raw) if order_raw else []
    if eng in ("mergetree", "memory", "tinylog", "log"):
        kind = "none"
    elif eng == "replacingmergetree":
        kind = "replacing"
        version = eargs[0] if eargs else None
        if version is None:
            # versionless Replacing keeps the LAST inserted row — insertion
            # sequence is the version (ReplacingSortedAlgorithm default)
            version = ISEQ
    elif eng == "collapsingmergetree":
        kind, sign = "collapsing", (eargs[0] if eargs else None)
        if not sign:
            raise ChSqlError("CollapsingMergeTree(sign) needs the sign column")
    elif eng == "versionedcollapsingmergetree":
        if len(eargs) != 2:
            raise ChSqlError("VersionedCollapsingMergeTree(sign, version)")
        kind, sign, version = "versioned_collapsing", eargs[0], eargs[1]
    elif eng == "summingmergetree":
        kind = "summing"
        if eargs:
            sum_cols = tuple(_parse_key_list(eargs[0]))
        else:
            # default: every numeric non-key column is summed
            numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}
            sum_cols = tuple(
                c for c, t in schema
                if c not in keys and (t in numeric or t.startswith("decimal"))
            )
    else:
        raise ChSqlError(f"unsupported ENGINE {engine!r}")
    if kind != "none" and not keys:
        raise ChSqlError(f"ENGINE {engine} needs ORDER BY (the merge key)")
    for k in keys:
        if k not in colnames:
            raise ChSqlError(f"ORDER BY column {k!r} not in the table schema")

    store = f"{table}__store"
    fields = ", ".join(f"{c} {t}" for c, t in schema)
    empty_store = spark.createDataFrame([], f"{fields}, {ISEQ} bigint")
    empty_store.createOrReplaceTempView(store)
    spark.sql(f"SELECT * EXCEPT ({ISEQ}) FROM {store}").createOrReplaceTempView(table)

    register_table_engine(
        table, kind, keys,
        version=version, sign=sign, sum_cols=list(sum_cols),
        order=ISEQ if kind != "none" else None,
        sample_by=(sample_raw if sample_raw else None),
        store=store,
    )
    TABLES[table] = {"schema": schema, "n_parts": 0}
    _SEQ[table] = 0
    return {"table": table, "engine": engine, "keys": keys, "schema": schema}


def insert_into(spark: SparkSession, sql: str) -> int:
    """INSERT INTO t [(cols)] VALUES (...), ... | SELECT ... — appends one
    "part"; returns the number of rows inserted."""
    m = _INSERT_RE.match(sql)
    if not m:
        raise ChSqlError("not an INSERT INTO statement")
    table = m.group("table")
    if table not in TABLES:
        raise ChSqlError(
            f"table {table!r} was not created via create_table / ch_ddl"
        )
    schema = TABLES[table]["schema"]
    colnames = [c for c, _ in schema]
    ins_cols = (
        [c.strip() for c in m.group("cols").split(",")] if m.group("cols") else colnames
    )
    unknown = set(ins_cols) - set(colnames)
    if unknown:
        raise ChSqlError(f"INSERT columns not in table: {sorted(unknown)}")

    body = sql[m.start("rest") :]
    if body[:6].upper() == "VALUES":
        from myscaledb_spark.sql_dialect import _rewrite_array_literals

        # CH VALUES rows use bracket array literals — rewrite like the
        # SELECT path does (string literals are respected)
        rows_sql = _rewrite_array_literals(body[6:].strip())
        src = spark.sql(
            f"SELECT * FROM VALUES {rows_sql} AS _ins({', '.join(ins_cols)})"
        )
    else:
        from myscaledb_spark.sql_dialect import ch_sql

        src = ch_sql(spark, body)
        if len(src.columns) != len(ins_cols):
            raise ChSqlError(
                f"INSERT SELECT produces {len(src.columns)} columns, "
                f"table expects {len(ins_cols)}"
            )
        src = src.toDF(*ins_cols)

    types = dict(schema)
    out_cols = []
    for c in colnames:
        if c in ins_cols:
            out_cols.append(F.col(c).cast(types[c]).alias(c))
        else:
            out_cols.append(F.lit(None).cast(types[c]).alias(c))
    part = src.select(*out_cols)

    # assign the hidden insertion sequence: (part_number << 50) | row id,
    # where the row id is monotonically_increasing_id() — partition-major
    # within the part (VALUES literals are a single LocalRelation partition,
    # so literal order is preserved), strictly above every earlier part.
    # Pure JVM expression: no Python, no extra pass over the data.
    n = part.count()
    part_no = _SEQ[table]
    _SEQ[table] = part_no + 1
    w_part = part.withColumn(
        ISEQ,
        (F.lit(part_no).cast("bigint") * F.lit(1 << 50))
        + F.monotonically_increasing_id(),
    )

    store = f"{table}__store"
    merged = spark.table(store).unionByName(w_part)
    TABLES[table]["n_parts"] += 1
    if TABLES[table]["n_parts"] % _CHECKPOINT_EVERY == 0:
        merged = merged.localCheckpoint(eager=True)  # squash union lineage
    merged.createOrReplaceTempView(store)
    spark.sql(f"SELECT * EXCEPT ({ISEQ}) FROM {store}").createOrReplaceTempView(table)
    return n


def drop_table(spark: SparkSession, table: str) -> None:
    spark.catalog.dropTempView(table)
    spark.catalog.dropTempView(f"{table}__store")
    TABLES.pop(table, None)
    _SEQ.pop(table, None)
    TABLE_ENGINES.pop(table, None)


def ch_ddl(spark: SparkSession, sql: str):
    """Single entry point for the DDL/DML statements ch_sql does not cover:
    CREATE TABLE → metadata dict, INSERT INTO → row count, DROP TABLE →
    None."""
    s = sql.strip().rstrip(";")
    if _CREATE_RE.match(s):
        return create_table(spark, s)
    if _INSERT_RE.match(s):
        return insert_into(spark, s)
    dm = re.match(r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\w+)\s*$", s, re.IGNORECASE)
    if dm:
        return drop_table(spark, dm.group(1))
    if re.match(r"^\s*CREATE\s+FUNCTION\b", s, re.IGNORECASE):
        from myscaledb_spark.sql_dialect import create_sql_function

        return create_sql_function(s)
    if re.match(r"^\s*DROP\s+FUNCTION\b", s, re.IGNORECASE):
        from myscaledb_spark.sql_dialect import drop_sql_function

        return drop_sql_function(s)
    raise ChSqlError(f"unrecognized DDL statement: {s[:80]!r}")


def ch_script(spark: SparkSession, script: str, artifact_dir: str | None = None):
    """Run a multi-statement ClickHouse SQL script — the shape of the
    reference's own .sql test files (statements separated by top-level
    semicolons; string literals respected). Routing per statement:
    CREATE TABLE / INSERT / DROP TABLE → ch_ddl; ALTER TABLE ... ADD|DROP
    [VECTOR] INDEX and CREATE VECTOR INDEX → plans/ddl.alter_index_ddl
    against the statement's table (index artifacts land under
    ``artifact_dir``, a per-script temp dir by default); everything else →
    ch_sql. Returns the LAST statement's result."""
    import tempfile

    from myscaledb_spark.sql_dialect import TABLE_ENGINES, _string_mask, ch_sql

    mask = _string_mask(script)
    stmts, last = [], 0
    for i, c in enumerate(mask):
        if c == ";":
            stmts.append(script[last:i])
            last = i + 1
    stmts.append(script[last:])
    result = None
    for stmt in stmts:
        s = stmt.strip()
        if not s or s.startswith("--"):
            continue
        im = re.match(
            r"^\s*(?:ALTER\s+TABLE\s+(?P<t1>\w+)\s+(?:ADD|DROP)\s+(?:VECTOR\s+)?INDEX"
            r"|CREATE\s+VECTOR\s+INDEX\s+(?:IF\s+NOT\s+EXISTS\s+)?\w+\s+ON\s+(?P<t2>\w+))",
            s,
            re.IGNORECASE,
        )
        if im:
            from myscaledb_spark.plans.ddl import alter_index_ddl

            table = im.group("t1") or im.group("t2")
            if artifact_dir is None:
                artifact_dir = tempfile.mkdtemp(prefix="ch_script_idx_")
            meta = TABLE_ENGINES.get(table) or {}
            id_col = (meta.get("keys") or [None])[0]
            df = spark.table(table)
            if id_col is None:
                for c in ("id", "doc_id", "vec_id"):
                    if c in df.columns:
                        id_col = c
                        break
                else:
                    id_col = df.columns[0]
            result = alter_index_ddl(spark, s, df, id_col, artifact_dir)
            continue
        if (
            _CREATE_RE.match(s)
            or _INSERT_RE.match(s)
            or re.match(r"^\s*(DROP\s+TABLE|CREATE\s+FUNCTION|DROP\s+FUNCTION)\b", s, re.IGNORECASE)
        ):
            result = ch_ddl(spark, s)
        else:
            result = ch_sql(spark, s)
    return result


_ENGINE_NAMES = {
    "none": "MergeTree",
    "replacing": "ReplacingMergeTree",
    "collapsing": "CollapsingMergeTree",
    "versioned_collapsing": "VersionedCollapsingMergeTree",
    "summing": "SummingMergeTree",
}

_SPARK_TO_CH = {
    "tinyint": "Int8", "smallint": "Int16", "int": "Int32", "bigint": "Int64",
    "float": "Float32", "double": "Float64", "string": "String",
    "date": "Date", "timestamp": "DateTime", "boolean": "Bool",
}


def _spark_type_to_ch(t: str) -> str:
    if t in _SPARK_TO_CH:
        return _SPARK_TO_CH[t]
    m = re.fullmatch(r"array<(.*)>", t)
    if m:
        return f"Array({_spark_type_to_ch(m.group(1))})"
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", t)
    if m:
        return f"Decimal({m.group(1)}, {m.group(2)})"
    return t


def show_create_table(table: str) -> str:
    """≈ SHOW CREATE TABLE — reconstructed ClickHouse DDL from the metadata
    ch_ddl recorded (InterpreterShowCreateQuery.cpp renders the stored AST
    the same way). Round-trippable: the output parses back through ch_ddl."""
    if table not in TABLES:
        raise ChSqlError(f"table {table!r} was not created via ch_ddl")
    meta = TABLE_ENGINES[table]
    cols = ",\n    ".join(
        f"{c} {_spark_type_to_ch(t)}" for c, t in TABLES[table]["schema"]
    )
    eng = _ENGINE_NAMES[meta["kind"]]
    args = []
    if meta["kind"] == "collapsing":
        args = [meta["sign"]]
    elif meta["kind"] == "versioned_collapsing":
        args = [meta["sign"], meta["version"]]
    elif meta["kind"] == "replacing" and meta["version"] != ISEQ:
        args = [meta["version"]]
    elif meta["kind"] == "summing" and meta["sum_cols"]:
        args = ["(" + ", ".join(meta["sum_cols"]) + ")"]
    engine = eng + (f"({', '.join(args)})" if args else "")
    out = f"CREATE TABLE {table}\n(\n    {cols}\n)\nENGINE = {engine}"
    if meta["keys"]:
        out += f"\nORDER BY ({', '.join(meta['keys'])})"
    if meta.get("sample_by"):
        out += f"\nSAMPLE BY {meta['sample_by']}"
    return out
