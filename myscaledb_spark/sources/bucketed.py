"""Bucketed persistent tables — the Spark analog of the reference's
co-located sharding key.

Reference parity: a MergeTree ORDER BY / distributed sharding key places
rows of the same key on the same shard so key-joins and key-aggregations
never reshuffle (`src/Storages/MergeTree/MergeTreeData.h` primary key parts;
`OptimizeShardingKeyRewriteInVisitor.cpp` exploits the sharding key at query
time). Spark's equivalent is a bucketed table: `bucketBy(n, key)` +
`sortBy(key)` written through the session catalog. A join of two tables
bucketed on the join key with the same bucket count reads both sides
ALREADY co-partitioned — the physical plan has **no ShuffleExchange on
either side**, which at 100 TB is the difference between a full-fact-table
shuffle per query and none (fact-to-fact joins, the one shape broadcast
can't save).

The catalog is the session catalog backed by `spark.sql.warehouse.dir`; on a
real deployment this is the Hive metastore / Unity / Glue — the write API is
identical (spark-hive jars ship in this container and are exercised in
tests/test_hive_bucketed.py).
"""

from __future__ import annotations

import shutil
from collections.abc import Sequence
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """A managed table's warehouse directory outlives an in-memory catalog
    (new process → empty catalog, old directory → LOCATION_ALREADY_EXISTS).
    Drop the catalog entry if present, then remove any orphaned directory."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    if wh.scheme in ("", "file"):
        shutil.rmtree(f"{wh.path}/{table.lower()}", ignore_errors=True)


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket-sorted)
    managed table in the session catalog."""
    if mode == "overwrite":
        _clear_stale_location(df.sparkSession, table)
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key.

    With matching bucket counts Spark plans a SortMergeJoin whose children
    are the bucketed scans directly — no Exchange. Callers disable broadcast
    for the probe (or the planner does it for two large facts) to see the
    shuffle-free shape; correctness is identical either way.
    """
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
