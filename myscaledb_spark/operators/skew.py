"""Skew and data-layout helpers for 100 TB execution.

AQE (spark.sql.adaptive.skewJoin, on by default in our session) handles most
join skew at runtime; these helpers cover the cases AQE cannot:
  - salted aggregation: a single hot GROUP BY key that overwhelms one reducer
    (two-phase: salt → partial agg → de-salt → final agg),
  - salted join: hot keys on the fact side of a non-broadcastable join
    (replicate the dim side per salt),
  - bucketed table writer: co-located joins that skip the shuffle entirely on
    repeated joins over the same key (≈ the reference's pre-sorted MergeTree
    parts joined by PK / StorageJoin).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: {out_name: (agg_fn, col)} with agg_fn in sum|count|min|max
    (re-aggregatable functions only — avg must be expressed as sum+count by
    the caller, which is also how the reference's partial states work).
    """
    salt = (F.rand(seed=7) * salt_buckets).cast("int").alias("_salt")
    fn_map = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[fn_map[fn](c).alias(name) for name, (fn, c) in aggs.items()]
    )
    refold = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(*keys).agg(
        *[refold[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on_fact: str,
    on_dim: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side per
    salt value. Use when the dim is too big to broadcast and fact keys are
    hot. Cost: dim is duplicated salt_buckets times — keep buckets small."""
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=11) * salt_buckets).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    replicated_dim = dim.select("*", salts)
    joined = salted_fact.join(
        replicated_dim,
        (salted_fact[on_fact] == replicated_dim[on_dim])
        & (salted_fact["_salt"] == replicated_dim["_salt"]),
        how,
    )
    return joined.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) table: joins/aggregations on
    the bucket key skip the exchange (SortMergeJoin without shuffle)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)
