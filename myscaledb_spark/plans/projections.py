"""Aggregate projections with plan-time routing
(`src/Storages/ProjectionsDescription.h`,
`src/Processors/QueryPlan/Optimizations/optimizeUseAggregateProjection.cpp`:
a projection stores partially-aggregated states per part; the planner
rewrites a matching GROUP BY to read the projection and merge states).

Spark-first: a projection is a parquet table of PARTIAL aggregate states
(sum/count/min/max per projection group key), built once from the base
table. `ProjectionSet.aggregate` is the router: if the requested grouping
keys are a subset of a projection's keys and every requested aggregate is
derivable from stored states (sum→sum of sums, count→sum of counts,
min/max→re-min/re-max, avg→sum_of_sums / sum_of_counts — the same
re-merge algebra as the reference's AggregatingTransform states), the query
reads the (much smaller) projection; otherwise it falls back to the base
table. Correctness is exact for these decomposable aggregates.

At 100 TB the projection is the difference between scanning the fact table
and scanning a table num_groups long; re-aggregation shuffles only
projection rows.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DECOMPOSABLE = {"sum", "count", "min", "max", "avg"}


class ProjectionSet:
    """Registry + builder + router for aggregate projections of one base
    table (≈ ProjectionsDescription attached to a MergeTree table)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._meta_path = os.path.join(root, "projections.json")
        self._meta: dict[str, dict] = (
            json.load(open(self._meta_path)) if os.path.exists(self._meta_path) else {}
        )

    def _save(self) -> None:
        json.dump(self._meta, open(self._meta_path, "w"), indent=1)

    def build(
        self,
        base: DataFrame,
        name: str,
        group_keys: Sequence[str],
        measures: Sequence[str],
    ) -> None:
        """Materialize partial states: per projection key, (sum, count, min,
        max) for every measure column. count_rows covers COUNT(*)."""
        aggs = [F.count(F.lit(1)).alias("_rows")]
        for m in measures:
            aggs += [
                F.sum(m).alias(f"_sum_{m}"),
                F.count(m).alias(f"_cnt_{m}"),
                F.min(m).alias(f"_min_{m}"),
                F.max(m).alias(f"_max_{m}"),
            ]
        proj = base.groupBy(*group_keys).agg(*aggs)
        path = os.path.join(self.root, name)
        proj.write.mode("overwrite").parquet(path)
        self._meta[name] = {
            "path": path,
            "group_keys": list(group_keys),
            "measures": list(measures),
        }
        self._save()

    def _covering(self, group_keys: Sequence[str], aggs: dict) -> dict | None:
        """Smallest registered projection whose keys ⊇ requested keys and
        whose measures cover every requested aggregate."""
        best = None
        for meta in self._meta.values():
            if not set(group_keys) <= set(meta["group_keys"]):
                continue
            ok = True
            for fn, col in aggs.values():
                if fn not in _DECOMPOSABLE:
                    ok = False
                    break
                if fn != "count" and col not in meta["measures"]:
                    ok = False
                    break
                if fn == "count" and col not in ("*",) and col not in meta["measures"]:
                    ok = False
                    break
            if ok and (best is None or len(meta["group_keys"]) < len(best["group_keys"])):
                best = meta
        return best

    def aggregate(
        self,
        spark: SparkSession,
        base: DataFrame,
        group_keys: Sequence[str],
        aggs: dict[str, tuple[str, str]],
    ) -> DataFrame:
        """Routed GROUP BY: aggs = {out_col: (fn, col)} with fn in
        sum|count|min|max|avg (col '*' for COUNT(*)). Reads a covering
        projection when one exists, else the base table. Results are
        identical either way (exact re-merge algebra)."""
        meta = self._covering(group_keys, aggs)
        if meta is None:
            exprs = [self._direct(fn, col).alias(out) for out, (fn, col) in aggs.items()]
            return base.groupBy(*group_keys).agg(*exprs)
        proj = spark.read.parquet(meta["path"])
        exprs = []
        for out, (fn, col) in aggs.items():
            if fn == "count" and col == "*":
                e = F.sum("_rows")
            elif fn == "count":
                e = F.sum(f"_cnt_{col}")
            elif fn == "sum":
                e = F.sum(f"_sum_{col}")
            elif fn == "min":
                e = F.min(f"_min_{col}")
            elif fn == "max":
                e = F.max(f"_max_{col}")
            else:  # avg: merged sum / merged count — exact, like the
                # reference's AggregateFunctionAvg state merge
                e = F.sum(f"_sum_{col}") / F.sum(f"_cnt_{col}")
            exprs.append(e.alias(out))
        return proj.groupBy(*group_keys).agg(*exprs)

    @staticmethod
    def _direct(fn: str, col: str):
        if fn == "count" and col == "*":
            return F.count(F.lit(1))
        return getattr(F, fn)(col)

    def routed_source(self, group_keys: Sequence[str], aggs: dict) -> str | None:
        """Introspection: which projection would serve this query (None =
        base table) — the system.query_log 'projection used' analog."""
        meta = self._covering(group_keys, aggs)
        return None if meta is None else meta["path"]
