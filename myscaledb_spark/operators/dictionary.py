"""External dictionaries — `dictGet*` (`src/Functions/
FunctionsExternalDictionaries.h`, Dictionary storage engine).

A dictionary is a broadcast-joined lookup DataFrame: `dict_get` rewrites
`dictGet('dict', 'attr', key)` into a broadcast left join + column pick,
which is exactly the physical plan the reference's in-RAM hash dictionary
gives (executor-local hash lookup, no shuffle of the fact side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Dictionary:
    def __init__(self, source: DataFrame, key_col: str, default: dict | None = None):
        self.source = source
        self.key_col = key_col
        self.default = default or {}

    def get(
        self,
        df: DataFrame,
        attr: str,
        key_expr: Column | str,
        out_name: str | None = None,
    ) -> DataFrame:
        """dictGet: adds `out_name` (default attr) looked up by key_expr.
        Missing keys → attribute default (dictGetOrDefault semantics when a
        default was declared, else NULL)."""
        out_name = out_name or attr
        key_expr = F.col(key_expr) if isinstance(key_expr, str) else key_expr
        lookup = self.source.select(
            F.col(self.key_col).alias("__dict_key"), F.col(attr).alias("__dict_val")
        )
        joined = df.withColumn("__dict_key", key_expr).join(
            F.broadcast(lookup), on="__dict_key", how="left"
        )
        val = joined["__dict_val"]
        if attr in self.default:
            val = F.coalesce(val, F.lit(self.default[attr]))
        return joined.withColumn(out_name, val).drop("__dict_key", "__dict_val")

    def has(self, df: DataFrame, key_expr: Column | str, out_name: str = "dict_has") -> DataFrame:
        """dictHas: membership flag via broadcast semi-join-style lookup."""
        key_expr = F.col(key_expr) if isinstance(key_expr, str) else key_expr
        lookup = self.source.select(
            F.col(self.key_col).alias("__dict_key"), F.lit(True).alias("__dict_hit")
        ).distinct()
        joined = df.withColumn("__dict_key", key_expr).join(
            F.broadcast(lookup), on="__dict_key", how="left"
        )
        return joined.withColumn(
            out_name, F.coalesce("__dict_hit", F.lit(False))
        ).drop("__dict_key", "__dict_hit")
