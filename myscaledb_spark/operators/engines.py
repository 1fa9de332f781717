"""MergeTree engine-family merge-on-read semantics + TTL lifecycle.

The reference's specialized MergeTree engines rewrite data at merge time;
SELECT ... FINAL applies the same collapse at read time. Spark has no
background merge daemon, so we model the *fully merged* state (what FINAL
guarantees) as declarative DataFrame transforms — each is a single
shuffle-on-key aggregation or window, no Python in the plan.

Reference parity:
  - CollapsingMergeTree:          src/Processors/Merges/Algorithms/CollapsingSortedAlgorithm.cpp
  - VersionedCollapsingMergeTree: src/Processors/Merges/Algorithms/VersionedCollapsingAlgorithm.cpp
  - SummingMergeTree:             src/Processors/Merges/Algorithms/SummingSortedAlgorithm.cpp
  - ReplacingMergeTree:           src/Processors/Merges/Algorithms/ReplacingSortedAlgorithm.cpp
    (implemented as `final_dedup` in operators/relational.py)
  - TTL DELETE / column TTL / TTL GROUP BY:
    src/Processors/TTL/TTLDeleteAlgorithm.cpp, TTLColumnAlgorithm.cpp,
    TTLAggregationAlgorithm.cpp; descriptions src/Storages/TTLDescription.cpp
  - OPTIMIZE TABLE ... [DEDUPLICATE [BY ...]]:
    src/Interpreters/InterpreterOptimizeQuery.cpp

Scale notes (100 TB): every operator here is one hash-shuffle on the engine's
ORDER BY key followed by a map-side-combinable aggregate or a single window —
the same shape as the reference's merge, which is also a per-key pass. No
driver-side state, no collect, no UDFs.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapsing_final(
    df: DataFrame,
    keys: Sequence[str],
    sign: str,
    order: Column | str,
) -> DataFrame:
    """CollapsingMergeTree SELECT ... FINAL.

    Per key group: rows carry ``sign`` ∈ {+1, -1}; a fully collapsed part
    keeps the **last state (+1) row** iff strictly more states than cancels
    survive (``sum(sign) > 0``), else the group vanishes — the terminal state
    of CollapsingSortedAlgorithm.cpp's pairwise cancellation. ``order``
    stands in for insertion order (the reference uses row order within the
    part, which Spark does not preserve; callers pass an explicit column).

    Plan: one shuffle on ``keys``; `max_by` picks the last +1 row without a
    second pass (struct-packed, map-side combinable).
    """
    order = F.col(order) if isinstance(order, str) else order
    payload = F.struct(*[F.col(c) for c in df.columns])
    agg = (
        df.groupBy(*keys)
        .agg(
            F.sum(sign).alias("_net"),
            F.max_by(payload, F.when(F.col(sign) == 1, order)).alias("_last_state"),
        )
        .filter((F.col("_net") > 0) & F.col("_last_state").isNotNull())
    )
    return agg.select(*[F.col(f"_last_state.{c}").alias(c) for c in df.columns])


def versioned_collapsing_final(
    df: DataFrame,
    keys: Sequence[str],
    sign: str,
    version: str,
    order: Column | str,
) -> DataFrame:
    """VersionedCollapsingMergeTree SELECT ... FINAL.

    Unlike plain Collapsing, cancellation is exact-per-version: a (+1, -1)
    pair collapses only when key AND ``version`` match
    (VersionedCollapsingAlgorithm.cpp keeps a FIFO queue per key+version: an
    incoming row of opposite sign cancels the EARLIEST queued row). The fully
    merged state therefore keeps, per (keys, version) group, the LAST
    ``|sum(sign)|`` rows of the majority sign — including unpaired cancel
    (-1) rows and multiple surviving state rows (two same-version +1 rows
    both survive a merge). Groups netting to zero vanish. ``order`` is the
    caller's stand-in for insertion order.

    Plan: one shuffle on keys+version, two windows over it (net + rank) —
    no Python, no second pass over the data.
    """
    order = F.col(order) if isinstance(order, str) else order
    w_net = Window.partitionBy(*keys, version)
    w_rn = Window.partitionBy(*keys, version, sign).orderBy(order.desc())
    majority = F.when(F.col("_net") > 0, 1).otherwise(-1)
    return (
        df.withColumn("_net", F.sum(sign).over(w_net))
        .withColumn("_rn", F.row_number().over(w_rn))
        .filter(
            (F.col("_net") != 0)
            & (F.col(sign) == majority)
            & (F.col("_rn") <= F.abs(F.col("_net")))
        )
        .select(*df.columns)
    )


def summing_final(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    first_by: Column | str | None = None,
) -> DataFrame:
    """SummingMergeTree SELECT ... FINAL.

    Per key group: listed numeric columns are summed; every other column
    takes the value from one surviving row (SummingSortedAlgorithm.cpp keeps
    the first row of the group — we pin "first" with ``first_by`` ordering so
    the result is deterministic under any partitioning); groups whose sums
    are ALL zero are dropped (the reference deletes the row, SummingSorted-
    Algorithm.cpp's `isZero` path).

    Plan: single shuffle on ``keys``, one aggregate (min_by + sums).
    """
    if not sum_cols:
        raise ValueError("summing_final needs at least one sum column")
    other = [c for c in df.columns if c not in set(sum_cols) | set(keys)]
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    if other:
        if first_by is None:
            raise ValueError("summing_final needs first_by to pin non-summed columns")
        order = F.col(first_by) if isinstance(first_by, str) else first_by
        payload = F.struct(*[F.col(c) for c in other])
        aggs.append(F.min_by(payload, order).alias("_first"))
    out = df.groupBy(*keys).agg(*aggs)
    zero = None
    for c in sum_cols:
        cond = (F.col(c) == 0) | F.col(c).isNull()
        zero = cond if zero is None else (zero & cond)
    out = out.filter(~zero)
    cols = []
    for c in df.columns:
        if c in keys or c in set(sum_cols):
            cols.append(F.col(c))
        else:
            cols.append(F.col(f"_first.{c}").alias(c))
    return out.select(*cols)


def _alive(ttl: Column, now: Column) -> Column:
    """True iff the row has NOT expired. A NULL TTL expression means the
    expiry never arrives — the row is alive (three-valued logic would
    otherwise silently drop NULL-ttl rows from BOTH slices)."""
    return F.coalesce(ttl > now, F.lit(True))


def ttl_delete(df: DataFrame, ttl_col: Column | str, now: Column) -> DataFrame:
    """TTL <expr> DELETE — drop rows whose TTL timestamp has passed
    (TTLDeleteAlgorithm.cpp: keep rows with ttl > current time; NULL ttl =
    never expires)."""
    ttl = F.col(ttl_col) if isinstance(ttl_col, str) else ttl_col
    return df.filter(_alive(ttl, now))


def ttl_column_default(
    df: DataFrame, col: str, ttl: Column, now: Column, default: Column
) -> DataFrame:
    """Column-level TTL — expired values are reset to the column default
    (TTLColumnAlgorithm.cpp writes the default expression over expired
    rows; the row itself survives; NULL ttl = never expires)."""
    return df.withColumn(col, F.when(_alive(ttl, now), F.col(col)).otherwise(default))


def ttl_group_by(
    df: DataFrame,
    ttl: Column,
    now: Column,
    keys: Sequence[str],
    set_aggs: Mapping[str, Column],
) -> DataFrame:
    """TTL <expr> GROUP BY k1.. SET col = agg(col), ... — rows past their TTL
    are rolled up to one row per group with the SET aggregates applied;
    unexpired rows pass through untouched (TTLAggregationAlgorithm.cpp).

    Columns not in ``keys`` or ``set_aggs`` take the value of the **last**
    row of the expired group in ORDER BY order — the reference keeps the
    latest-by-ordering values for untouched columns; we require callers to
    cover every non-key column in ``set_aggs`` to stay deterministic.

    Plan: expired slice shuffles once on ``keys``; fresh slice is untouched;
    union is free (no shuffle).
    """
    missing = [c for c in df.columns if c not in keys and c not in set_aggs]
    if missing:
        raise ValueError(f"ttl_group_by: columns {missing} need a SET aggregate")
    fresh = df.filter(_alive(ttl, now))
    expired = df.filter(~_alive(ttl, now))
    rolled = expired.groupBy(*keys).agg(
        *[agg.alias(c) for c, agg in set_aggs.items()]
    )
    return fresh.select(df.columns).unionByName(rolled.select(df.columns))


def optimize_deduplicate(
    df: DataFrame,
    by: Sequence[str] | None = None,
    order: Column | str | None = None,
) -> DataFrame:
    """OPTIMIZE TABLE ... FINAL DEDUPLICATE [BY col-list]
    (InterpreterOptimizeQuery.cpp; dedup column subset per
    MergeTreeDataMergerMutator). With no ``by``: full-row DISTINCT. With
    ``by``: one row kept per distinct by-tuple — the reference keeps the
    first in part order; we pin it with ``order`` for determinism.
    """
    if by is None:
        return df.distinct()
    if order is None:
        raise ValueError("optimize_deduplicate(by=...) needs an order column")
    order = F.col(order) if isinstance(order, str) else order
    w = Window.partitionBy(*by).orderBy(order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
