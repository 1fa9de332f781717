"""Relational helpers for reference constructs Spark lacks a literal
spelling for: LIMIT n BY, ASOF JOIN, FINAL dedup, ORDER BY ... WITH FILL.

Each is a thin DataFrame composition — Catalyst plans/optimizes them; there
is no imperative execution here.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def any_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "left",
    right_order: Column | str | None = None,
) -> DataFrame:
    """ClickHouse `[LEFT|INNER] ANY JOIN` — each left row pairs with at most
    ONE right row per key (reference: JOIN strictness `Any`,
    `src/Interpreters/HashJoin.cpp` / `src/Parsers/ASTTablesInSelectQuery.h`;
    the reference keeps the first hash-table entry per key).

    "First" is insertion-order-dependent in the reference; Spark has no row
    order, so callers pin the kept row with ``right_order`` (min wins) —
    deterministic under any partitioning. With a unique-keyed right side the
    order column is irrelevant and may be any column.

    Plan: the right side collapses to one row per key (partial-aggregable
    min_by — map-side combine, one shuffle), then a plain equi-join that can
    broadcast when small. Never multiplies rows, so the join output is
    bounded by |left| — at 100 TB this is the safe dimension-lookup shape
    even when the dim has duplicate keys.
    """
    if right_order is None:
        raise ValueError("any_join needs right_order to pin the kept right row")
    order = F.col(right_order) if isinstance(right_order, str) else right_order
    payload = F.struct(*[F.col(c) for c in right.columns if c not in on])
    one = right.groupBy(*on).agg(F.min_by(payload, order).alias("_r"))
    picked = one.select(
        *on, *[F.col(f"_r.{c}").alias(c) for c in right.columns if c not in on]
    )
    return left.join(picked, on=list(on), how=how)


def limit_by(
    df: DataFrame,
    by: Sequence[str],
    order: Sequence[Column],
    n: int,
    offset: int = 0,
) -> DataFrame:
    """`LIMIT n [OFFSET m] BY cols` — top-n per group
    (reference: `src/Processors/Transforms/LimitByTransform.cpp`,
    parser `ASTSelectQuery.h:29-31`).

    Spark plan: ranked window partitioned by the BY columns. The window
    shuffle partitions by group key — at scale that's the minimal data
    movement (same as the reference's per-group counters after a sort).
    """
    w = Window.partitionBy(*by).orderBy(*order)
    rn = F.row_number().over(w)
    return (
        df.withColumn("_rn", rn)
        .filter((F.col("_rn") > offset) & (F.col("_rn") <= offset + n))
        .drop("_rn")
    )


def sample_by(
    df: DataFrame, key: Column | str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic `SAMPLE k` over a sampling key (reference: SAMPLE BY
    expression in the MergeTree definition + SAMPLE clause — rows where
    hash(key) falls below k·2^bits, so the same rows are sampled on every
    run, every replica, every engine; `df.sample` can't give that).

    Uses the portable 48-bit md5 prefix (operators/dedup.md5_48), so an
    external system (or the DuckDB oracle) reproduces the sample exactly.
    Scale: a pure filter expression — pushes into the scan, no shuffle.
    """
    from myscaledb_spark.operators.dedup import md5_48_seeded

    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"sample fraction must be in (0, 1], got {fraction}")
    key = F.col(key) if isinstance(key, str) else key
    h = md5_48_seeded(key.cast("string"), seed)
    return df.filter(h < F.lit(int(fraction * (1 << 48))))


def window_groups_frame(
    df: DataFrame,
    agg_expr: Column,
    order_by: Column | str,
    partition_by: Sequence[str] = (),
    preceding: int = 0,
    following: int = 0,
    out: str = "groups_agg",
) -> DataFrame:
    """`GROUPS BETWEEN n PRECEDING AND m FOLLOWING` window frame
    (`src/Interpreters/WindowDescription.h:31`; Spark has no GROUPS mode).

    Rewrite: dense_rank over the ORDER BY expression numbers the peer groups
    consecutively, so a RANGE frame over the rank is EXACTLY the GROUPS
    frame (peer rows share a rank; offsets count whole peer groups). One
    window shuffle on the partition keys; the rank and the framed aggregate
    reuse the same sort order, so Catalyst plans a single sort.
    """
    order_by = F.col(order_by) if isinstance(order_by, str) else order_by
    w_rank = Window.partitionBy(*partition_by).orderBy(order_by)
    w_frame = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col("_grp_rank"))
        .rangeBetween(-preceding, following)
    )
    return (
        df.withColumn("_grp_rank", F.dense_rank().over(w_rank))
        .withColumn(out, agg_expr.over(w_frame))
        .drop("_grp_rank")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by_left: Sequence[str] = (),
    by_right: Sequence[str] = (),
    direction: str = "backward",
    strict: bool = False,
    how: str = "inner",
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """ASOF JOIN — for each left row, match the single right row with the
    greatest `right_on` ≤ `left_on` (backward; `<` if strict) or the smallest
    `right_on` ≥ `left_on` (forward), within equal `by` keys.

    Reference: JoinStrictness::Asof (`src/Core/Joins.h:38,56-63`), hash-join
    asof maps in `src/Interpreters/HashJoin.cpp`.

    Spark plan (no native asof): union the two sides tagged, sort within
    `by`-partition by the time key, propagate the last-seen right row to left
    rows with `last(..., ignoreNulls)` over an ordered window. ONE shuffle on
    the by-keys (same cost as the reference's partitioned hash build); avoids
    the O(n·m) range-join blowup of the naive join+filter+row_number plan and
    is skew-safe under AQE.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")
    if how not in ("inner", "left"):
        raise ValueError("how must be inner|left")
    by_left = list(by_left)
    by_right = list(by_right)
    if len(by_left) != len(by_right):
        raise ValueError("by_left and by_right must have equal length")

    rcols = [c for c in (right_cols or right.columns) if c not in (*by_right, right_on)]
    rtype = "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in rcols) + ">"
    ltype = "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in left.columns) + ">"
    # tag & harmonize schemas for the union
    lkey = [F.col(c).alias(f"_by{i}") for i, c in enumerate(by_left)]
    rkey = [F.col(c).alias(f"_by{i}") for i, c in enumerate(by_right)]
    lt = left.select(
        *lkey,
        F.col(left_on).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rtype).alias("_rrow"),
    )
    rt = right.select(
        *rkey,
        F.col(right_on).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(ltype).alias("_lrow"),
        F.struct(*[F.col(c) for c in rcols]).alias("_rrow"),
    )
    u = lt.unionByName(rt)

    bys = [f"_by{i}" for i in range(len(by_left))]
    # Equal-time tie-break decides strictness: non-strict lets a right row at
    # t == left.t match (right sorts before left), strict excludes it.
    tiebreak = F.col("_side").desc() if strict else F.col("_side").asc()
    torder = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*bys)
        .orderBy(torder, tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_mrow", F.last("_rrow", ignorenulls=True).over(w))

    out = matched.filter(F.col("_side") == 1)
    if how == "inner":
        out = out.filter(F.col("_mrow").isNotNull())
    sel = [F.col(f"_lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"_mrow.{c}").alias(c) for c in rcols
    ]
    return out.select(*sel)


def final_dedup(
    df: DataFrame, key: Sequence[str], version: Column | str, keep: str = "max"
) -> DataFrame:
    """FINAL / ReplacingMergeTree semantics: one row per key, the one with the
    max (or min) version (reference: merge-on-read dedup,
    `src/Processors/QueryPlan/PartsSplitter.cpp`, test `00039_test_final.sh`,
    `00031_mqvs_support_replacing_merge_tree.sql`)."""
    version = F.col(version) if isinstance(version, str) else version
    order = version.desc() if keep == "max" else version.asc()
    w = Window.partitionBy(*key).orderBy(order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def with_fill(
    df: DataFrame,
    fill_col: str,
    step: Any,
    from_value: Any | None = None,
    to_value: Any | None = None,
    interpolate: Sequence[str] | Mapping[str, Callable] = (),
) -> DataFrame:
    """ORDER BY ... WITH FILL [FROM a] [TO b] [STEP s] [INTERPOLATE cols] —
    densify a numeric/date axis, inserting missing grid points
    (reference: `src/Processors/Transforms/FillingTransform.cpp`).

    ``interpolate`` is either a sequence of column names (carry-forward:
    fill rows take the closest preceding original value) or a mapping
    column → fn(Column) → Column for the computed ``INTERPOLATE (c AS
    expr)`` form (r7): ClickHouse applies the expression to the PREVIOUS
    output row per inserted fill row, so k consecutive fill rows compound
    it k times — reproduced as an aggregate() fold of fn over the gap
    length.  fn sees only the carried column value (the reference's other-
    column references read the previous output row, which this formulation
    does not model) and must preserve the column's type.

    Spark plan: one-row min/max agg → `sequence()` literal grid → explode →
    left join original → optional last-value interpolation window. The grid
    is tiny (axis cardinality), so the join broadcasts the grid; original
    data is never reshuffled except the final join on the fill key.
    """
    bounds = df.agg(
        F.min(fill_col).alias("_mn"), F.max(fill_col).alias("_mx")
    ).collect()[0]
    lo = from_value if from_value is not None else bounds["_mn"]
    hi = to_value if to_value is not None else bounds["_mx"]
    if lo is None:
        return df
    spark = df.sparkSession
    grid = spark.range(1).select(
        F.explode(F.sequence(F.lit(lo), F.lit(hi), F.lit(step))).alias(fill_col)
    )
    items = (
        list(interpolate.items())
        if isinstance(interpolate, Mapping)
        else [(c, None) for c in interpolate]
    )
    computed = any(fn is not None for _, fn in items)
    src = df.withColumn("_wf_orig", F.lit(True)) if computed else df
    joined = grid.join(src, on=fill_col, how="left")
    if items:
        w = Window.orderBy(fill_col).rowsBetween(Window.unboundedPreceding, 0)
        if computed:
            joined = joined.withColumn(
                "_wf_seq", F.row_number().over(Window.orderBy(fill_col))
            ).withColumn(
                "_wf_oseq",
                F.last(
                    F.when(F.col("_wf_orig"), F.col("_wf_seq")), ignorenulls=True
                ).over(w),
            )
        for c, fn in items:
            if fn is None:
                joined = joined.withColumn(c, F.last(c, ignorenulls=True).over(w))
                continue
            # struct wrap keeps a NULL original value distinct from "no
            # original row yet" while the fold compounds fn per fill step
            carried = F.last(
                F.when(F.col("_wf_orig"), F.struct(F.col(c).alias("v"))),
                ignorenulls=True,
            ).over(w)["v"]
            k = F.col("_wf_seq") - F.col("_wf_oseq")
            folded = F.aggregate(
                F.sequence(F.lit(1), k), carried, lambda acc, _i: fn(acc)
            )
            joined = joined.withColumn(
                c,
                F.when(F.col("_wf_oseq").isNull(), F.lit(None))
                .when(k == 0, carried)
                .otherwise(folded),
            )
    return joined.drop("_wf_orig", "_wf_seq", "_wf_oseq").orderBy(fill_col)
