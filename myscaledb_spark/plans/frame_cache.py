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
        _note_load(path)
        df = spark.read.parquet(path).persist(StorageLevel.MEMORY_AND_DISK)
        _CACHE[key] = df
    return df


def evict_prefix(prefix: str) -> None:
    """Drop every cached artifact frame under ``prefix`` (an artifact root
    or <root>/<name> dir) — DETACH / DROP / TRUNCATE expire the reference's
    index cache the same way (VICacheManager; VIEventLog CacheExpire)."""
    if not prefix:  # "" would match every key — never a valid artifact root
        return
    for k in [k for k in _CACHE if k[0].startswith(prefix)]:
        _CACHE.pop(k).unpersist()


def _note_load(path: str) -> None:
    """Emit LoadStart/LoadSucceed into the index's event history when a
    previously-expired artifact re-enters the cache (VIEventLog load events
    on first use after eviction — 00030's post-ATTACH query).  Loads while
    the index is already resident (the normal steady state, seeded by the
    build's own read-back) log nothing, like the reference's cache hit."""
    name_dir = os.path.dirname(path)
    root = os.path.dirname(name_dir)
    reg_path = os.path.join(
        root, "registry", os.path.basename(name_dir) + ".json"
    )
    if not os.path.exists(reg_path):
        return
    import json

    try:
        rec = json.load(open(reg_path))
    except Exception:  # noqa: BLE001 — diagnostics must never break loads
        return
    if rec.get("cache_resident", True):
        return
    from myscaledb_spark.plans.vector_index import IndexRegistry

    reg = IndexRegistry(root)
    name = os.path.basename(name_dir)
    reg.add_event(name, "LoadStart")
    reg.add_event(name, "LoadSucceed", cache_resident=True)
