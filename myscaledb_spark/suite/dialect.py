"""Suite entries that run through the ClickHouse SQL dialect shim end-to-end
(ch_sql → rewrite → spark.sql → Catalyst), oracle-checked like everything
else, plus supplier-side relational coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register


@register(
    "ch_sql_monthly_stats",
    """
    SELECT (EXTRACT(year FROM o_orderdate)*100 + EXTRACT(month FROM o_orderdate))::INT AS ym,
           COUNT(DISTINCT o_custkey) AS n_cust,
           CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY 1
    """,
)
def ch_sql_monthly_stats(spark, sf_dir):
    from myscaledb_spark.sql_dialect import ch_sql

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_ch_orders")
    return ch_sql(
        spark,
        """
        SELECT toYYYYMM(o_orderdate) AS ym,
               uniqExact(o_custkey) AS n_cust,
               countIf(o_totalprice > 150000) AS n_big,
               cast(maxIf(cast(o_totalprice as decimal(18,2)), o_totalprice > 0) as double) AS max_price
        FROM _ch_orders
        GROUP BY toYYYYMM(o_orderdate)
        """,
    )


@register(
    "ch_sql_vector_search",
    """
    WITH scored AS (
      -- squared L2: SQL distance() carries faiss METRIC_L2 semantics
      -- (00001_mqvs_distance.reference prints 0.03 for a 0.1^2*3 offset)
      SELECT vec_id,
             list_reduce(list_transform(range(1, len(embedding)+1),
               i -> (CAST(embedding[i] AS DOUBLE) - 0.25) * (CAST(embedding[i] AS DOUBLE) - 0.25)),
               (a, b) -> a + b) AS d
      FROM embeddings
    )
    SELECT vec_id, ROUND(d, 4) AS d
    FROM scored ORDER BY d ASC, vec_id ASC LIMIT 7
    """,
)
def ch_sql_vector_search(spark, sf_dir):
    """The reference's flagship query shape in verbatim CH syntax, through
    the dialect shim (constant query vector of 0.25s keeps the oracle SQL
    readable)."""
    from myscaledb_spark.sql_dialect import ch_sql

    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("_ch_emb")
    qlit = "array(" + ", ".join(["0.25"] * 64) + ")"
    return ch_sql(
        spark,
        f"""
        SELECT vec_id, round(distance(embedding, {qlit}), 4) AS d
        FROM _ch_emb
        ORDER BY distance(embedding, {qlit}) ASC, vec_id ASC
        LIMIT 7
        """,
    )


@register(
    "supplier_nation_balance",
    """
    SELECT n_name,
           COUNT(*) AS n_supp,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           CAST(MIN(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def supplier_nation_balance(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    dec = F.col("s_acctbal").cast("decimal(18,2)")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum(dec).cast("double").alias("total_bal"),
            F.min(dec).cast("double").alias("min_bal"),
        )
    )
