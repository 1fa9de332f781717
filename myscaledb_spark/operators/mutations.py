"""Mutations on immutable columnar storage — the reference's lightweight
DELETE (`src/Interpreters/InterpreterDeleteQuery.cpp:81-84` `_row_exists`
mask) and ALTER UPDATE (`src/Storages/MergeTree/MutateTask.cpp`) re-expressed
for parquet tables.

Two modes, mirroring the reference's two mechanisms:
  - **masked (lightweight)**: keep a deletes side-table of keys; reads apply
    an anti-join mask (≈ `_row_exists` bitmap applied at scan). O(deleted)
    write cost; read cost = one broadcast anti-join.
  - **rewrite (mutation)**: materialize a new table version without the
    deleted rows / with updated values (≈ background mutation merging parts).

A tiny table-version layout keeps this atomic without a lakehouse dependency:
<root>/v=N/ parquet + <root>/_current containing N (write new version, then
flip the pointer — readers see old or new, never a mix). Delta Lake would
subsume this on a real deployment; the semantics here are engine-parity.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _ptr(self) -> str:
        return os.path.join(self.root, "_current")

    def current_version(self) -> int:
        p = self._ptr()
        return int(open(p).read().strip()) if os.path.exists(p) else -1

    def _vdir(self, v: int) -> str:
        return os.path.join(self.root, f"v={v}")

    def write(self, df: DataFrame) -> int:
        v = self.current_version() + 1
        df.write.mode("overwrite").parquet(self._vdir(v))
        tmp = self._ptr() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._ptr())  # atomic pointer flip
        return v

    def read(self) -> DataFrame:
        v = self.current_version()
        if v < 0:
            raise FileNotFoundError(f"no version in {self.root}")
        df = self.spark.read.parquet(self._vdir(v))
        mask = self._mask_path()
        if os.path.exists(mask):
            deleted = self.spark.read.parquet(mask)
            df = df.join(
                F.broadcast(deleted), on=list(deleted.columns), how="left_anti"
            )
        return df

    # --- lightweight delete (masked) ---------------------------------------
    def _mask_path(self) -> str:
        return os.path.join(self.root, f"deletes_v={self.current_version()}")

    def delete_where(self, cond: Column, key_cols: list[str]) -> int:
        """Lightweight DELETE: append matching keys to the delete mask.
        Returns number of newly masked rows."""
        v = self.current_version()
        base = self.spark.read.parquet(self._vdir(v))
        keys = base.filter(cond).select(*key_cols).distinct()
        n = keys.count()
        keys.write.mode("append").parquet(self._mask_path())
        return n

    # --- full mutation (rewrite) -------------------------------------------
    def mutate(
        self,
        delete_cond: Column | None = None,
        set_exprs: dict[str, Column] | None = None,
    ) -> int:
        """ALTER DELETE/UPDATE as a table rewrite → new version; clears the
        delete mask (mutations fold masks in, like part merges do)."""
        df = self.read()
        if delete_cond is not None:
            df = df.filter(~delete_cond)
        for name, expr in (set_exprs or {}).items():
            df = df.withColumn(name, expr)
        df = df.localCheckpoint()  # materialize before overwriting the source
        return self.write(df)

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop data of versions older than the newest `keep_last`
        (≈ old-part cleanup after mutations/merges). Returns removed
        versions. Never touches the current version."""
        import re
        import shutil

        cur = self.current_version()
        versions = sorted(
            int(m.group(1))
            for d in os.listdir(self.root)
            if (m := re.match(r"v=(\d+)$", d))
        )
        removable = [v for v in versions if v < cur][: max(0, len(versions) - keep_last)]
        removed = []
        for v in removable:
            if v == cur:
                continue
            shutil.rmtree(self._vdir(v), ignore_errors=True)
            removed.append(v)
        return removed


def optimize_compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """OPTIMIZE TABLE [FINAL] as parquet-directory compaction — merge many
    small files into ~target-sized ones (the reference's background part
    merge, `src/Storages/MergeTree/MergeTreeDataMergerMutator.cpp`; here
    the user-triggered OPTIMIZE form, InterpreterOptimizeQuery.cpp).

    At 100 TB ingest, streaming sinks and frequent inserts leave thousands
    of KB-scale files per partition; scans then pay per-file open/footer
    costs and tiny row groups. Compaction rewrites the directory with
    ``repartition(ceil(bytes/target))`` (an optional per-file sort restores
    clustering for min/max pruning) atomically via a temp dir + rename.

    Hive-partitioned layouts (``k=v`` subdirectories) are preserved: the
    rewrite goes through ``partitionBy`` on the discovered partition
    columns, so partition pruning keeps working after compaction.

    The swap is two renames — NOT atomic: readers racing the swap can see
    a missing path for an instant, and a crash between the renames leaves
    the data under ``<path>.__old_*`` (restored automatically when the
    second rename fails). Run it like the reference runs OPTIMIZE: as an
    exclusive maintenance step, not under live readers.

    Returns {files_before, files_after, bytes}. The byte size is measured
    from the filesystem listing, not a collect of the data.
    """
    import math
    import re
    import shutil
    import uuid

    def _list(p):
        out = []
        for root, _, files in os.walk(p):
            for f in files:
                if not f.startswith(("_", ".")):
                    out.append(os.path.join(root, f))
        return out

    part_cols = []
    probe = path
    while True:
        subs = [
            d for d in os.listdir(probe)
            if os.path.isdir(os.path.join(probe, d)) and re.match(r"[^=]+=", d)
        ]
        if not subs:
            break
        part_cols.append(subs[0].split("=", 1)[0])
        probe = os.path.join(probe, subs[0])

    before = _list(path)
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    df = (
        df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
        if sort_cols
        else df.repartition(n_out)
    )
    tmp = f"{path.rstrip('/')}.__compact_{uuid.uuid4().hex[:8]}"
    w = df.write.mode("overwrite")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.parquet(tmp)
    old = f"{path.rstrip('/')}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # restore the original on a failed swap
        raise
    shutil.rmtree(old, ignore_errors=True)
    return {
        "files_before": len(before),
        "files_after": len(_list(path)),
        "bytes": total,
    }
