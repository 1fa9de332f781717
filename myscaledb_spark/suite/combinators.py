"""Aggregate combinators (-If, -Distinct, -Array, -OrDefault/-OrNull —
`registerAggregateFunctions.cpp:84-92`) and the uniq family, oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register


@register(
    "agg_combinators",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_quantity > 25 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS sum_if,
           CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS count_if,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE)
             / SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS avg_if,
           SUM(DISTINCT l_quantity) AS sum_distinct_qty,
           COALESCE(MAX(CASE WHEN l_quantity > 49 THEN l_orderkey END), 0) AS max_or_default,
           MIN(CASE WHEN l_quantity > 49 THEN l_orderkey END) AS min_or_null
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_combinators(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    big = F.col("l_quantity") > 25
    disc = F.col("l_discount") > 0.05
    rare = F.col("l_quantity") > 49
    return li.groupBy("l_linestatus").agg(
        F.sum(F.when(big, dec)).cast("double").alias("sum_if"),
        F.sum(F.when(big, 1).otherwise(0)).alias("count_if"),
        (
            F.sum(F.when(disc, dec)).cast("double")
            / F.sum(F.when(disc, 1).otherwise(0))
        ).alias("avg_if"),
        F.sum_distinct(F.col("l_quantity")).alias("sum_distinct_qty"),
        F.coalesce(F.max(F.when(rare, F.col("l_orderkey"))), F.lit(0)).alias(
            "max_or_default"
        ),
        F.min(F.when(rare, F.col("l_orderkey"))).alias("min_or_null"),
    )


@register(
    "uniq_family",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS uniq_exact_part,
           COUNT(DISTINCT l_suppkey) AS uniq_exact_supp,
           COUNT(DISTINCT CASE WHEN l_quantity > 40 THEN l_orderkey END) AS uniq_exact_if
    FROM lineitem GROUP BY l_returnflag
    """,
)
def uniq_family(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("uniq_exact_part"),
        F.countDistinct("l_suppkey").alias("uniq_exact_supp"),
        F.countDistinct(F.when(F.col("l_quantity") > 40, F.col("l_orderkey"))).alias(
            "uniq_exact_if"
        ),
    )


# -Array combinator: aggregate over all array elements across rows
@register(
    "sum_array_tokens",
    """
    WITH toked AS (
      SELECT source,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT source,
           CAST(SUM(len(toks)) AS BIGINT) AS count_array,
           CAST(SUM(list_aggregate(list_transform(toks, t -> length(t)), 'sum')) AS BIGINT) AS sum_array_lens,
           MAX(list_aggregate(list_transform(toks, t -> length(t)), 'max')) AS max_array_len
    FROM toked GROUP BY source
    """,
)
def sum_array_tokens(spark, sf_dir):
    from myscaledb_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.withColumn("toks", tokenize("text"))
    lens = F.transform("toks", lambda t: F.length(t).cast("long"))
    return toked.groupBy("source").agg(
        F.sum(F.size("toks")).alias("count_array"),
        F.sum(
            F.aggregate(lens, F.lit(0).cast("long"), lambda a, b: a + b)
        ).alias("sum_array_lens"),
        F.max(F.array_max(lens)).alias("max_array_len"),
    )


# --- grouped-agg pandas UDAF (§2.12) — oracle via parallel-unnest avg ---------
@register(
    "avg_vector_centroids",
    """
    WITH e AS (
      SELECT label,
             UNNEST(embedding) AS v,
             UNNEST(range(1, len(embedding) + 1)) AS dim
      FROM embeddings
    )
    SELECT label, CAST(dim AS INT) AS dim, ROUND(AVG(CAST(v AS DOUBLE)), 4) AS m
    FROM e GROUP BY label, dim
    """,
)
def avg_vector_centroids(spark, sf_dir):
    """Grouped-agg pandas UDAF (functions/udaf.py::avg_vector) — per-label
    embedding centroid, the array-state aggregate native Spark can't
    express. The UDAF returns array<double>; the gate posexplodes it into
    (label, dim, m) scalar rows so the driver's row-sort hash applies.
    ROUND(4) absorbs summation-order float jitter (numpy pairwise vs
    sequential — both far below 1e-4)."""
    from myscaledb_spark.functions.udaf import avg_vector

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.groupBy("label").agg(avg_vector("embedding").alias("c"))
    return cents.select(
        "label", F.posexplode("c").alias("dim0", "m0")
    ).select(
        "label",
        (F.col("dim0") + 1).cast("int").alias("dim"),
        F.round("m0", 4).alias("m"),
    )


# --- CHECK constraints (§2.2) — violation-count audit as a gate query ---------
@register(
    "check_constraint_counts",
    """
    SELECT CAST(SUM(CASE WHEN l_quantity > 0 THEN 0 ELSE 1 END) AS BIGINT) AS quantity_positive,
           CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 0 ELSE 1 END) AS BIGINT) AS discount_range,
           CAST(SUM(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS shipdate_not_null,
           CAST(SUM(CASE WHEN l_tax < 0.03 THEN 0 ELSE 1 END) AS BIGINT) AS tax_small,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def check_constraint_counts(spark, sf_dir):
    """CHECK constraints (operators/constraints.py): the same one-pass
    violation-count aggregate check_constraints runs before raising — NULL
    predicate = violation, matching the reference's CAST(expr AS UInt8)=1
    rule (src/Storages/ConstraintsDescription.cpp). Two constraints hold,
    tax_small intentionally has violations so the non-zero path is
    oracle-pinned too."""
    from myscaledb_spark.operators.constraints import violation_counts

    li = load_table(spark, sf_dir, "lineitem")
    return violation_counts(
        li,
        {
            "quantity_positive": F.col("l_quantity") > 0,
            "discount_range": F.col("l_discount").between(0.0, 0.1),
            "shipdate_not_null": F.col("l_shipdate").isNotNull(),
            "tax_small": F.col("l_tax") < 0.03,
        },
    )
