"""Shared in-memory cache for index-artifact parquet frames.

The reference keeps built indexes resident (its vector index cache /
TantivyIndexStoreFactory LRU); the Spark analog persists the artifact
DataFrame as a cached relation (MEMORY_AND_DISK: compressed columnar
batches, spilling when the artifact outgrows executor memory — same
degradation mode as the reference's cache eviction).  Keyed by the
artifact directory's mtime, so append/rebuild (which rewrites the
directory) invalidates the stale entry on next use.

Partition-pruning note: a cached relation filters by the cache batches'
min/max stats instead of the parquet source's directory pruning — for the
list_id/leaf-partitioned layouts both prune to the probed lists.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}


def cached_parquet(spark: SparkSession, path: str) -> DataFrame:
    from pyspark import StorageLevel

    key = (path, os.stat(path).st_mtime_ns)
    df = _CACHE.get(key)
    if df is None:
        for stale in [k for k in _CACHE if k[0] == path]:
            _CACHE.pop(stale).unpersist()
        df = spark.read.parquet(path).persist(StorageLevel.MEMORY_AND_DISK)
        _CACHE[key] = df
    return df
