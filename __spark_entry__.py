"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query for the correctness gate.

Column names are aliased identically on both sides; floating-point outputs
are rounded the same way on both sides; every top-k is tie-broken by id so
results are deterministic across engines and partitionings.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from myscaledb_spark.catalog import load_table  # noqa: E402
from myscaledb_spark.session import tune_session  # noqa: E402


# ---------------------------------------------------------------------------
# deterministic query vectors (no RNG at import time — fixed literals)
# ---------------------------------------------------------------------------
def _qvec(dim: int = 64, seed: int = 7) -> list[float]:
    # deterministic LCG so the same literal vector appears in oracle SQL
    x = seed
    out = []
    for _ in range(dim):
        x = (1103515245 * x + 12345) % (2**31)
        out.append(round((x / 2**31) * 2.0 - 1.0, 6))
    return out


QV = _qvec()
QV2 = _qvec(seed=21)
QV3 = _qvec(seed=99)
QTEXT = "vector search fast"


def _sql_dist_l2(vec_expr: str, qvec: list[float]) -> str:
    """DuckDB L2 distance with the same left-to-right double summation Spark's
    aggregate() performs."""
    q = "[" + ", ".join(repr(v) for v in qvec) + "]"
    diff = f"(CAST({vec_expr}[i] AS DOUBLE) - ({q})[i])"
    return (
        f"sqrt(list_reduce(list_transform(range(1, len({vec_expr})+1), "
        f"i -> {diff} * {diff}), (a, b) -> a + b))"
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_vec_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myscaledb_spark.operators.topk import vector_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = vector_topk(emb, "embedding", QV, 10, "L2", id_col="vec_id")
    return out.select("vec_id", "label", F.round("dist", 4).alias("dist"))


def o_vec_l2_topk() -> str:
    d = _sql_dist_l2("embedding", QV)
    return f"""
        SELECT vec_id, label, ROUND({d}, 4) AS dist
        FROM embeddings
        ORDER BY {d} ASC, vec_id ASC
        LIMIT 10
    """


def q_vec_l2_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myscaledb_spark.operators.topk import vector_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = vector_topk(
        emb, "embedding", QV2, 10, "L2", where=F.col("label") == 1, id_col="vec_id"
    )
    return out.select("vec_id", F.round("dist", 4).alias("dist"))


def o_vec_l2_filtered() -> str:
    d = _sql_dist_l2("embedding", QV2)
    return f"""
        SELECT vec_id, ROUND({d}, 4) AS dist
        FROM embeddings WHERE label = 1
        ORDER BY {d} ASC, vec_id ASC
        LIMIT 10
    """


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 — partial-agg friendly groupBy; decimals for exact parity."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    disc = F.col("l_discount").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("decimal(18,2)").alias("sum_qty"),
            F.sum(price).cast("decimal(18,2)").alias("sum_base_price"),
            F.sum(price * (F.lit(1).cast("decimal(18,2)") - disc))
            .cast("decimal(18,4)")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def o_pricing_summary() -> str:
    return """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myscaledb_spark.functions.text import text_search

    docs = load_table(spark, sf_dir, "documents")
    out = text_search(docs, "text", QTEXT, 15, id_col="doc_id")
    return out.select("doc_id", F.round("bm25_score", 4).alias("bm25_score"))


def o_bm25_topk() -> str:
    # tantivy BM25: k1=1.2 b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5));
    # tokenizer: lowercase, split non-alnum
    terms = ["vector", "search", "fast"]
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}" for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END)::DOUBLE AS df{i}"
        for i, t in enumerate(terms)
    )
    score_terms = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN ln(1 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)) "
        f"* (tf{i} * (1.2 + 1.0)) / (tf{i} + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) ELSE 0 END)"
        for i in range(len(terms))
    )
    match_any = " OR ".join(f"tf{i} > 0" for i in range(len(terms)))
    return f"""
        WITH toked AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
          FROM documents
        ),
        d AS (
          SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, {tf_cols} FROM toked
        ),
        stats AS (
          SELECT COUNT(*)::DOUBLE AS n_docs, AVG(len(toks))::DOUBLE AS avgdl, {df_cols}
          FROM toked
        )
        SELECT doc_id, ROUND({score_terms}, 4) AS bm25_score
        FROM d CROSS JOIN stats
        WHERE {match_any}
        ORDER BY ({score_terms}) DESC, doc_id ASC
        LIMIT 15
    """


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "vec_l2_topk": q_vec_l2_topk,
    "vec_l2_filtered": q_vec_l2_filtered,
    "pricing_summary": q_pricing_summary,
    "bm25_topk": q_bm25_topk,
}

ORACLES: dict[str, str] = {
    "vec_l2_topk": o_vec_l2_topk(),
    "vec_l2_filtered": o_vec_l2_filtered(),
    "pricing_summary": o_pricing_summary(),
    "bm25_topk": o_bm25_topk(),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: filtered vector top-k on sf0.001 (the MyScale core path)."""
    tune_session(spark)
    return q_vec_l2_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
