"""Verbatim SQL forms of the search table-functions through ch_sql
(sql_search.py) — the last reference query shapes the dialect refused
(r4 VERDICT ask #2).

Each entry pastes the reference's own query syntax
(tests/queries/2_vector_search/00040_mqvs_hybrid_search.sql,
00002_mqvs_batch_distance.sh) and checks it against the same longhand DuckDB
oracles as the API-path entries — SQL form and operator form must agree
bit-for-bit because the SQL handler routes INTO those operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.sql_dialect import ch_sql
from myscaledb_spark.suite import register
from myscaledb_spark.suite.hybrid import _bm25_scored_sql
from myscaledb_spark.suite.search import QV, QV2, QV3, _bm25_oracle_sql, sql_qvec

_QV_LIT = "[" + ", ".join(repr(v) for v in QV) + "]"


@register("ch_sql_textsearch", _bm25_oracle_sql(["vector", "search", "fast"], 15))
def ch_sql_textsearch(spark, sf_dir):
    """`SELECT doc_id, textsearch(text, '...') AS s FROM t ORDER BY s DESC
    LIMIT 15` — verbatim reference syntax (TableFunctionFullTextSearch.h:25,
    00040_mqvs_hybrid_search.sql 'text search' case) routed to
    functions.text.text_search; same oracle as bm25_topk."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_sql_ts_docs")
    out = ch_sql(
        spark,
        """
        SELECT doc_id, textsearch(text, 'vector search fast') AS bm25_score
        FROM _sql_ts_docs
        ORDER BY bm25_score DESC, doc_id LIMIT 15
        """,
    )
    return out.select("doc_id", F.round("bm25_score", 4).alias("bm25_score"))


@register(
    "ch_sql_hybridsearch",
    f"""
    WITH {_bm25_scored_sql()},
    vstats AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM vec_cand),
    tstats AS (SELECT MIN(bm25) AS mn, MAX(bm25) AS mx FROM txt_cand),
    v AS (SELECT doc_id,
                 (1.0 - (CASE WHEN mx = mn THEN 1.0 ELSE (d - mn) / (mx - mn) END)) * 0.5 AS vs
          FROM vec_cand CROSS JOIN vstats),
    t AS (SELECT doc_id,
                 (CASE WHEN mx = mn THEN 1.0 ELSE (bm25 - mn) / (mx - mn) END) * 0.5 AS ts
          FROM txt_cand CROSS JOIN tstats)
    SELECT COALESCE(v.doc_id, t.doc_id) AS doc_id,
           ROUND(COALESCE(vs, 0) + COALESCE(ts, 0), 6) AS score
    FROM v FULL OUTER JOIN t ON v.doc_id = t.doc_id
    ORDER BY (COALESCE(vs, 0) + COALESCE(ts, 0)) DESC, COALESCE(v.doc_id, t.doc_id) ASC
    LIMIT 8
    """,
)
def ch_sql_hybridsearch(spark, sf_dir):
    """`hybridsearch('fusion_type=rsf')(vec, text, [q...], 'q') AS score ...
    ORDER BY score DESC LIMIT 8` — the reference's parametric SQL form
    (00040_mqvs_hybrid_search.sql) routed to operators.hybrid.hybrid_search;
    same fusion oracle as hybrid_search_rsf."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "text", "embedding"
    ).createOrReplaceTempView("_sql_hs_corpus")
    out = ch_sql(
        spark,
        f"""
        SELECT doc_id,
               hybridsearch('fusion_type=rsf')(embedding, text, {_QV_LIT},
                            'vector search fast') AS score
        FROM _sql_hs_corpus
        ORDER BY score DESC, doc_id LIMIT 8
        """,
    )
    return out.select("doc_id", F.round("score", 6).alias("score"))


@register(
    "ch_sql_batch_distance",
    f"""
    WITH q AS (
      SELECT * FROM (VALUES (0, {sql_qvec(QV)}), (1, {sql_qvec(QV2)}), (2, {sql_qvec(QV3)}))
      AS t(query_id, qv)
    ),
    scored AS (
      -- squared L2: SQL batch_distance carries faiss METRIC_L2 semantics
      -- (00002_mqvs_batch_distance.reference)
      SELECT q.query_id, e.vec_id,
             list_reduce(list_transform(range(1, len(e.embedding)+1),
               i -> (CAST(e.embedding[i] AS DOUBLE) - qv[i]) * (CAST(e.embedding[i] AS DOUBLE) - qv[i])),
               (a, b) -> a + b) AS d
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, ROUND(d, 4) AS dist
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d ASC, vec_id ASC) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def ch_sql_batch_distance(spark, sf_dir):
    """`SELECT vec_id, batch_distance(embedding, [[..],[..],[..]]) AS dist
    FROM t ORDER BY dist.1, dist.2 LIMIT 5 BY dist.1` — the reference's
    batch query shape (00002_mqvs_batch_distance.sh) routed to
    operators.topk.batch_vector_topk; same per-query top-n oracle as
    batch_distance_l2. The tuple column is a struct with fields q/d
    (documented field-name mapping for dist.1/dist.2)."""
    qlit = "[" + ", ".join(
        "[" + ", ".join(repr(v) for v in q) + "]" for q in (QV, QV2, QV3)
    ) + "]"
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("_sql_bd_emb")
    out = ch_sql(
        spark,
        f"""
        SELECT vec_id, batch_distance(embedding, {qlit}) AS dist
        FROM _sql_bd_emb
        ORDER BY dist.1, dist.2 LIMIT 5 BY dist.1
        """,
    )
    return out.select(
        F.col("dist.q").cast("int").alias("query_id"),
        "vec_id",
        F.round("dist.d", 4).alias("dist"),
    )


@register(
    "ch_sql_ddl_insert_final",
    """
    WITH src AS (
      SELECT o_orderkey % 500 AS k, o_totalprice AS price, o_orderkey AS ver
      FROM orders
      UNION ALL
      SELECT * FROM (VALUES (9000001, 42.5, 1), (9000001, 43.5, 2),
                            (9000002, 7.25, 1)) t(k, price, ver)
    )
    SELECT k, ROUND(ARG_MAX(price, ver), 2) AS price,
           CAST(MAX(ver) AS BIGINT) AS ver
    FROM src GROUP BY k
    """,
)
def ch_sql_ddl_insert_final(spark, sf_dir):
    """The full table lifecycle from verbatim SQL statements: CREATE TABLE
    ... ENGINE = ReplacingMergeTree(ver) ORDER BY k (ParserCreateQuery.cpp /
    registerStorageMergeTree.cpp), INSERT INTO ... SELECT, INSERT INTO ...
    VALUES, then SELECT ... FROM t FINAL — the engine metadata drives the
    collapse exactly as the reference reads it from the DDL. Oracle replays
    the same inserts longhand (Replacing keeps the max-version row)."""
    from myscaledb_spark.plans.table_ddl import ch_ddl

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_ddlg_orders")
    ch_ddl(spark, "DROP TABLE IF EXISTS _ddlg")
    ch_ddl(
        spark,
        "CREATE TABLE _ddlg (k Int64, price Float64, ver Int64) "
        "ENGINE = ReplacingMergeTree(ver) ORDER BY k",
    )
    ch_ddl(
        spark,
        "INSERT INTO _ddlg SELECT modulo(o_orderkey, 500) AS k, "
        "o_totalprice AS price, o_orderkey AS ver FROM _ddlg_orders",
    )
    ch_ddl(
        spark,
        "INSERT INTO _ddlg VALUES (9000001, 42.5, 1), (9000001, 43.5, 2), "
        "(9000002, 7.25, 1)",
    )
    return ch_sql(
        spark, "SELECT k, round(price, 2) AS price, ver FROM _ddlg FINAL"
    )


@register(
    "ch_sql_json_bool_missing",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN NOT COALESCE(
               json_extract_string(props, '$.flag') = 'true', false)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_not_flagged,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_has_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k
    FROM events GROUP BY 1
    """,
)
def ch_sql_json_bool_missing(spark, sf_dir):
    """JSONExtractBool on a MISSING key returns false — not NULL — so
    `countIf(NOT JSONExtractBool(...))` counts every row (the r4 ADVICE fix:
    NULL would propagate through NOT and count zero). Plus JSONHas /
    JSONExtractInt on the present key."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_jb_events")
    return ch_sql(
        spark,
        """
        SELECT event_type,
               count(*) AS n,
               countIf(NOT JSONExtractBool(props, 'flag')) AS n_not_flagged,
               countIf(JSONHas(props, 'k')) AS n_has_k,
               cast(max(JSONExtractInt(props, 'k')) as bigint) AS max_k
        FROM _jb_events GROUP BY event_type
        """,
    )


@register(
    "ch_sql_with_fill_off_grid",
    """
    WITH head AS (
      SELECT o_orderkey AS x, COUNT(*) AS n FROM orders
      WHERE o_orderkey < 80 GROUP BY 1
    ),
    grid AS (SELECT unnest(generate_series(1, 80, 7)) AS x)
    SELECT COALESCE(g.x, h.x) AS x, COALESCE(h.n, 0) AS n
    FROM grid g FULL OUTER JOIN head h ON g.x = h.x
    """,
)
def ch_sql_with_fill_off_grid(spark, sf_dir):
    """WITH FILL where original rows sit OFF the generated grid (sparse
    TPC-H orderkeys vs STEP 7): the full-outer grid join keeps every
    original row AND interleaves fill rows — the r4 ADVICE fix (a left
    join from the grid silently dropped off-step originals, diverging from
    FillingTransform.cpp)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_wfo_orders")
    out = ch_sql(
        spark,
        """
        SELECT o_orderkey AS x, count(*) AS n
        FROM _wfo_orders WHERE o_orderkey < 80
        GROUP BY o_orderkey
        ORDER BY x WITH FILL FROM 1 TO 80 STEP 7
        """,
    )
    return out.select("x", F.coalesce("n", F.lit(0)).alias("n"))


@register(
    "ch_sql_groups_frame",
    """
    WITH r AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority,
             DENSE_RANK() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_orderdate) AS grk
      FROM orders WHERE o_custkey < 100
    )
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_orderpriority ORDER BY grk
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS s
    FROM r
    """,
)
def ch_sql_groups_frame(spark, sf_dir):
    """`GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING` verbatim (r5 VERDICT
    ask #7; WindowDescription.h:31) — the dialect rewrites to dense_rank
    peer-group numbering + a RANGE frame over the rank, since Spark has no
    GROUPS mode. DuckDB lacks GROUPS too, so the oracle is the same
    longhand emulation written independently."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gf_orders")
    return ch_sql(
        spark,
        """
        SELECT o_orderkey,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_orderpriority ORDER BY o_orderdate
                 GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS s
        FROM _gf_orders WHERE o_custkey < 100
        """,
    )


@register(
    "ch_sql_with_fill_interpolate",
    """
    WITH agg AS (
      SELECT CAST(o_orderkey // 599 AS BIGINT) AS d, COUNT(*) AS n,
             ROUND(SUM(o_totalprice), 2) AS rev
      FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey < 12000
      GROUP BY 1
    ),
    grid AS (SELECT unnest(range(0, 25)) AS d),
    j AS (
      SELECT COALESCE(g.d, a.d) AS d, a.n, a.rev,
             (a.d IS NOT NULL) AS orig
      FROM grid g FULL OUTER JOIN agg a ON g.d = a.d
    )
    SELECT d, COALESCE(n, 0) AS n,
           last_value(CASE WHEN orig THEN rev END IGNORE NULLS)
             OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS rev
    FROM j
    """,
)
def ch_sql_with_fill_interpolate(spark, sf_dir):
    """`ORDER BY d WITH FILL FROM 0 TO 25 INTERPOLATE (rev)` verbatim (r5
    VERDICT ask #4; FillingTransform.cpp interpolate descriptions): fill
    rows carry the closest preceding ORIGINAL row's rev forward; TO is
    exclusive like the reference's. The data occupies d ≤ 20, so rows
    21-24 are guaranteed interpolated fill rows at every SF."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_wfi_orders")
    out = ch_sql(
        spark,
        """
        SELECT intDiv(o_orderkey, 599) AS d, count(*) AS n,
               round(sum(o_totalprice), 2) AS rev
        FROM _wfi_orders WHERE o_orderkey % 7 = 0 AND o_orderkey < 12000
        GROUP BY intDiv(o_orderkey, 599)
        ORDER BY d WITH FILL FROM 0 TO 25 INTERPOLATE (rev)
        """,
    )
    return out.select("d", F.coalesce("n", F.lit(0)).alias("n"), "rev")


@register(
    "ch_sql_with_fill_interpolate_expr",
    """
    WITH agg AS (
      SELECT CAST(o_orderkey // 599 AS BIGINT) AS d, COUNT(*) AS n,
             ROUND(SUM(o_totalprice), 2) AS rev
      FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey < 12000
      GROUP BY 1
    ),
    grid AS (SELECT unnest(range(0, 25)) AS d),
    j AS (
      SELECT COALESCE(g.d, a.d) AS d, a.n, a.rev,
             (a.d IS NOT NULL) AS orig
      FROM grid g FULL OUTER JOIN agg a ON g.d = a.d
    ),
    w1 AS (SELECT *, ROW_NUMBER() OVER (ORDER BY d) AS seq FROM j),
    w2 AS (
      SELECT d, n, seq,
             last_value(CASE WHEN orig THEN rev END IGNORE NULLS)
               OVER win AS carried,
             last_value(CASE WHEN orig THEN seq END IGNORE NULLS)
               OVER win AS oseq
      FROM w1
      WINDOW win AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT d,
           CASE WHEN oseq IS NULL THEN NULL
                WHEN seq = oseq THEN carried
                ELSE carried * power(2.0, seq - oseq) END AS rev,
           COALESCE(n, 0) AS n
    FROM w2
    """,
)
def ch_sql_with_fill_interpolate_expr(spark, sf_dir):
    """Computed `INTERPOLATE (rev AS rev * 2)` verbatim (r7 VERDICT ask #5;
    FillingTransform.cpp interpolate actions): ClickHouse applies the
    expression to the previous OUTPUT row per inserted fill row, so the k
    consecutive fill rows at d = 21..24 compound it k times — the dialect's
    aggregate(sequence(1, k), carried, fold) must equal the oracle's
    closed form carried · 2^k bit-exactly (each ·2 is exact binary
    scaling).  Also pins the r7 ADVICE column-order fix: rev sits MID
    select list and must stay there (checked in tests/test_advice_r7.py;
    the driver hash is order-insensitive)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_wfx_orders")
    out = ch_sql(
        spark,
        """
        SELECT intDiv(o_orderkey, 599) AS d,
               round(sum(o_totalprice), 2) AS rev,
               count(*) AS n
        FROM _wfx_orders WHERE o_orderkey % 7 = 0 AND o_orderkey < 12000
        GROUP BY intDiv(o_orderkey, 599)
        ORDER BY d WITH FILL FROM 0 TO 25 INTERPOLATE (rev AS rev * 2)
        """,
    )
    return out.select("d", "rev", F.coalesce("n", F.lit(0)).alias("n"))


@register(
    "ch_sql_array_join_clause",
    r"""
    WITH e AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '[^\p{L}\p{N}]+'),
                                t -> len(t) > 0)) AS tok
      FROM documents WHERE doc_id < 100
    )
    SELECT tok, COUNT(*) AS n, CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM e GROUP BY tok
    """,
)
def ch_sql_array_join_clause(spark, sf_dir):
    """Verbatim `FROM t ARRAY JOIN <expr> AS alias` clause (the reference's
    row-expansion syntax, ArrayJoinAction.cpp) rewritten to LATERAL VIEW
    explode — with a CH function expression inside the clause and WHERE /
    GROUP BY following it in the reference's clause order."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_caj_docs")
    return ch_sql(
        spark,
        """
        SELECT tok, count() AS n, cast(min(doc_id) as bigint) AS first_doc
        FROM _caj_docs ARRAY JOIN tokens(text) AS tok
        WHERE doc_id < 100
        GROUP BY tok
        """,
    )


@register(
    "ch_sql_url_funcs",
    """
    SELECT doc_id,
           'https' AS pr,
           'www.' || source || '.example.com' AS dom,
           source || '.example.com' AS dw,
           '/docs/' || CAST(doc_id AS VARCHAR) AS p,
           lang AS lang2,
           'top' AS fr
    FROM documents WHERE doc_id < 50
    """,
)
def ch_sql_url_funcs(spark, sf_dir):
    """URL function family through the dialect (FunctionsURL.h):
    protocol/domain/domainWithoutWWW/path/extractURLParameter/fragment over
    URLs constructed in-query from table columns; the oracle derives the
    expected components directly from the same columns, pinning the
    parse_url decomposition exactly."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_cu_docs")
    return ch_sql(
        spark,
        """
        WITH u AS (
          SELECT doc_id, lang,
                 concat('https://www.', source, '.example.com/docs/',
                        cast(doc_id as string), '?lang=', lang, '#top') AS url
          FROM _cu_docs WHERE doc_id < 50
        )
        SELECT doc_id,
               protocol(url) AS pr,
               domain(url) AS dom,
               domainWithoutWWW(url) AS dw,
               path(url) AS p,
               extractURLParameter(url, 'lang') AS lang2,
               fragment(url) AS fr
        FROM u
        """,
    )


@register(
    "ch_sql_create_function",
    """
    SELECT o_orderpriority,
           -- floor keeps the lambda double-math TIE-FREE: ClickHouse
           -- round() is banker's (mapped to Spark bround, r8) but Spark
           -- and DuckDB detect double half-ties differently at the margin
           CAST(SUM(CAST(FLOOR(o_totalprice * (1 + 0.07) * 100) / 100 AS DECIMAL(18,2)))
                AS DOUBLE) AS taxed_total,
           COUNT(*) AS n
    FROM orders WHERE o_custkey < 400 GROUP BY 1
    """,
)
def ch_sql_create_function(spark, sf_dir):
    """`CREATE FUNCTION name AS (params) -> expr` — the reference's SQL
    lambda UDFs (UserDefinedSQLFunctionFactory.cpp: pure AST substitution at
    call sites, which is exactly what the dialect does) — defined and then
    used inside an aggregate; the oracle inlines the same expression."""
    from myscaledb_spark.sql_dialect import create_sql_function

    create_sql_function(
        "CREATE FUNCTION gate_taxed AS (p, r) -> floor(p * (1 + r) * 100) / 100"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_cf_orders")
    return ch_sql(
        spark,
        """
        SELECT o_orderpriority,
               cast(sum(cast(gate_taxed(o_totalprice, 0.07) as decimal(18,2)))
                    as double) AS taxed_total,
               count() AS n
        FROM _cf_orders WHERE o_custkey < 400
        GROUP BY o_orderpriority
        """,
    )


@register(
    "ch_sql_with_fill_multi",
    """
    WITH orig AS (
      SELECT CAST(o_orderkey % 5 AS BIGINT) AS d,
             CAST(o_orderkey % 3 AS BIGINT) AS v,
             COUNT(*) AS n
      FROM orders WHERE o_orderkey % 7 = 0 AND (o_orderkey % 5) IN (1, 3)
      GROUP BY 1, 2
    ),
    lattice AS (
      SELECT g1.d, g2.v
      FROM (SELECT unnest(range(0, 5)) AS d) g1,
           (SELECT unnest(range(0, 3)) AS v) g2
    )
    SELECT l.d, l.v, COALESCE(orig.n, 0) AS n
    FROM lattice l LEFT JOIN orig ON l.d = orig.d AND l.v = orig.v
    ORDER BY l.d, l.v
    """,
)
def ch_sql_with_fill_multi(spark, sf_dir):
    """Multi-column `ORDER BY d WITH FILL FROM 0 TO 5, v WITH FILL FROM 0
    TO 3` verbatim — the FillingTransform odometer (operators/fill_multi;
    FillingRow.cpp).  The data occupies d ∈ {1,3} with every original v on
    the inner grid, so the exact odometer output IS the full 5×3 lattice:
    inserted d-groups enumerate v from FROM to TO (exclusive), groups with
    originals fill between/around them, and fill rows take the column
    default n = 0 — which a DuckDB grid cross-join reproduces
    independently.  The operator never assumes the lattice shape."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_wfm_orders")
    return ch_sql(
        spark,
        """
        SELECT o_orderkey % 5 AS d, o_orderkey % 3 AS v,
               count(*) AS n
        FROM _wfm_orders WHERE o_orderkey % 7 = 0 AND (o_orderkey % 5) IN (1, 3)
        GROUP BY o_orderkey % 5, o_orderkey % 3
        ORDER BY d WITH FILL FROM 0 TO 5, v WITH FILL FROM 0 TO 3
        """,
    )


@register(
    "ch_sql_with_fill_multi_interpolate",
    """
    WITH orig AS (
      SELECT CAST(o_orderkey % 5 AS BIGINT) AS d,
             CAST(o_orderkey % 3 AS BIGINT) AS v,
             COUNT(*) AS n,
             CAST(SUM(o_orderkey) AS BIGINT) AS m
      FROM orders WHERE o_orderkey % 7 = 0 AND (o_orderkey % 5) IN (1, 3)
      GROUP BY 1, 2
    ),
    lattice AS (
      SELECT g1.d, g2.v
      FROM (SELECT unnest(range(0, 5)) AS d) g1,
           (SELECT unnest(range(0, 3)) AS v) g2
    ),
    j AS (
      SELECT l.d, l.v, orig.n, orig.m, orig.d IS NOT NULL AS is_orig,
             ROW_NUMBER() OVER (ORDER BY l.d, l.v) AS rn
      FROM lattice l LEFT JOIN orig ON l.d = orig.d AND l.v = orig.v
    ),
    w AS (
      SELECT d, v, n, m, is_orig, rn,
             LAST_VALUE(CASE WHEN is_orig THEN m END IGNORE NULLS)
               OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS am,
             LAST_VALUE(CASE WHEN is_orig THEN rn END IGNORE NULLS)
               OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arn
      FROM j
    )
    SELECT d, v, COALESCE(n, 0) AS n,
           CASE WHEN is_orig THEN m
                ELSE COALESCE(am, 0) + (rn - COALESCE(arn, 0)) END AS m
    FROM w ORDER BY d, v
    """,
)
def ch_sql_with_fill_multi_interpolate(spark, sf_dir):
    """Multi-column WITH FILL **with INTERPOLATE** verbatim (r7 VERDICT ask
    #5) — `INTERPOLATE (m AS m + 1)` under a two-column odometer fill: each
    inserted fill row computes m over the PREVIOUS OUTPUT row
    (FillingTransform.cpp interpolate actions), so a gap's fill rows carry
    anchor_m + k, and rows before the first original fold from the column
    default (02233_interpolate_1 semantics).  The oracle reproduces the
    chain in longhand DuckDB: a lattice join ordered like the odometer,
    last-original anchors via IGNORE NULLS windows, and m = anchor + gap
    offset.  n (non-interpolated) keeps the fill default 0."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_wfmi_orders")
    return ch_sql(
        spark,
        """
        SELECT o_orderkey % 5 AS d, o_orderkey % 3 AS v,
               count(*) AS n, sum(o_orderkey) AS m
        FROM _wfmi_orders WHERE o_orderkey % 7 = 0 AND (o_orderkey % 5) IN (1, 3)
        GROUP BY o_orderkey % 5, o_orderkey % 3
        ORDER BY d WITH FILL FROM 0 TO 5, v WITH FILL FROM 0 TO 3
        INTERPOLATE (m AS m + 1)
        """,
    )


@register(
    "ch_sql_with_fill_desc",
    """
    WITH orig AS (
      SELECT CAST(o_orderkey AS BIGINT) AS x, COUNT(*) AS n
      FROM orders WHERE o_orderkey < 40 GROUP BY 1
    ),
    grid AS (SELECT unnest(generate_series(39, 1, -2)) AS x)
    SELECT COALESCE(g.x, o.x) AS x, COALESCE(o.n, 0) AS n
    FROM grid g FULL OUTER JOIN orig o ON g.x = o.x
    ORDER BY x DESC
    """,
)
def ch_sql_with_fill_desc(spark, sf_dir):
    """`ORDER BY x DESC WITH FILL FROM 39 TO 0 STEP -2` verbatim — the
    descending fill path through operators/fill_multi (the grid-join
    rewrite only covers ascending fills).  Sparse TPC-H orderkeys sit on
    and off the descending grid; TO 0 is exclusive, so the grid floor is
    1.  Oracle: a descending generate_series full-outer-joined to the
    originals (fill rows default n = 0)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_wfd_orders")
    return ch_sql(
        spark,
        """
        SELECT o_orderkey AS x, count(*) AS n
        FROM _wfd_orders WHERE o_orderkey < 40
        GROUP BY o_orderkey
        ORDER BY x DESC WITH FILL FROM 39 TO 0 STEP -2
        """,
    )
