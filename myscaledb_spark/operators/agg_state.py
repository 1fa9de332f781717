"""AggregateFunction partial-state columns — build, store, merge, finalize.

The reference's ``-State`` combinator materializes an aggregate's
intermediate state as a storable column value, ``-Merge`` resumes
aggregation from stored states, and AggregatingMergeTree FINAL merges
state rows that share an ORDER BY key.  The canonical use is a
materialized view storing hourly states that any query re-merges into a
coarser grain — partial aggregation persisted ACROSS queries (Spark's
map-side combine made durable).

Reference parity:
  - -State / -Merge combinators   src/AggregateFunctions/AggregateFunctionState.h,
                                  src/AggregateFunctions/AggregateFunctionMerge.h
  - AggregateFunction column type src/DataTypes/DataTypeAggregateFunction.h
  - SimpleAggregateFunction       src/DataTypes/DataTypeCustomSimpleAggregateFunction.cpp
  - AggregatingMergeTree FINAL    src/Processors/Merges/Algorithms/AggregatingSortedAlgorithm.cpp,
                                  src/Storages/MergeTree/registerStorageMergeTree.cpp
  - uniq HLL estimator            src/AggregateFunctions/AggregateFunctionUniq.h
                                  (the estimator FAMILY is matched — classic
                                  Flajolet HyperLogLog with linear-counting
                                  small-range correction; register layout and
                                  hash differ, like every -State blob differs
                                  between engines, so states are portable
                                  WITHIN this engine, not byte-compatible
                                  with the reference's)

The reference serializes opaque per-function binary blobs.  A Spark-first
design wants states to be *plain columns* (structs / arrays) so they
survive parquet round-trips, merge with built-in JVM expressions inside
whole-stage codegen, and keep Catalyst in charge of the plan.  State
representation per supported function:

    count            BIGINT
    sum              the sum type (DECIMAL-aware, exact)
    min / max / any  the value type
    avg / sumCount   STRUCT<sum, count>
    argMin / argMax  STRUCT<arg, val>      (merge = min_by / max_by on val)
    uniqExact        ARRAY<T> sorted distinct
    groupArray       ARRAY<T>
    quantileExact    ARRAY<T> sorted (the reference's state is also every value)
    uniq             ARRAY<INT> of 256 HLL registers over the portable
                     md5-48 hash (deterministic: the same registers on any
                     engine that can compute md5 — the DuckDB oracle
                     reproduces them longhand)

Scale notes (100 TB): every merge below is a single hash-shuffle on the
grouping key with map-side partial merge (sum/min/max/min_by are native
partial aggregates; array states merge through collect_list whose per-key
volume is the number of PARTS, not rows).  Building a uniq state uses the
one-shuffle ``uniq_state`` path (256 conditional max-aggregates assemble
the register array inside a single hash agg) so no executor ever buffers
a key's raw values; the single-expression ``uniq_state_agg`` twin exists
for SQL-dialect parity and small groups.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myscaledb_spark.operators.dedup import md5_48

#: HLL registers (precision p=8 → m=256): bias-corrected alpha_m
#: = 0.7213 / (1 + 1.079/m)  (Flajolet et al. 2007, the constant the
#: reference's HyperLogLogCounter uses for m >= 128)
HLL_M = 256
HLL_ALPHA = 0.7182725932495458


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --------------------------------------------------------------------------
# -State builders: aggregate expressions for groupBy(...).agg(...)
# --------------------------------------------------------------------------

def count_state(col: Column | str | None = None) -> Column:
    """countState([x]) → BIGINT partial count."""
    return F.count(_c(col)) if col is not None else F.count(F.lit(1))


def sum_state(col: Column | str) -> Column:
    """sumState(x) → partial sum (state == value: sum is its own state)."""
    return F.sum(_c(col))


def min_state(col: Column | str) -> Column:
    return F.min(_c(col))


def max_state(col: Column | str) -> Column:
    return F.max(_c(col))


def any_state(col: Column | str, order: Column | str) -> Column:
    """anyState(x): the reference keeps the first value seen, which is
    part-order dependent; we pin "first" with an explicit order column."""
    return F.min_by(_c(col), _c(order))


def avg_state(col: Column | str) -> Column:
    """avgState(x) → STRUCT<sum, count> (AggregateFunctionAvg's state is the
    (numerator, denominator) pair)."""
    c = _c(col)
    return F.struct(F.sum(c).alias("sum"), F.count(c).alias("count"))


sum_count_state = avg_state  # sumCount carries the identical state pair


def arg_min_state(arg: Column | str, val: Column | str) -> Column:
    """argMinState(arg, val) → STRUCT<arg, val> at the minimum val."""
    a, v = _c(arg), _c(val)
    return F.min_by(F.struct(a.alias("arg"), v.alias("val")), v)


def arg_max_state(arg: Column | str, val: Column | str) -> Column:
    a, v = _c(arg), _c(val)
    return F.max_by(F.struct(a.alias("arg"), v.alias("val")), v)


def uniq_exact_state(col: Column | str) -> Column:
    """uniqExactState(x) → sorted ARRAY of distinct values (the reference's
    state is a hash set of every distinct value; sorting makes the column
    value deterministic under any partitioning)."""
    return F.array_sort(F.collect_set(_c(col)))


def group_array_state(col: Column | str, order: Column | str) -> Column:
    """groupArrayState(x) → ARRAY in ``order`` order (the reference keeps
    insertion order, which Spark does not define; callers pin it)."""
    c, o = _c(col), _c(order)
    return F.transform(
        F.array_sort(F.collect_list(F.struct(o.alias("o"), c.alias("v")))),
        lambda s: s["v"],
    )


def quantile_exact_state(col: Column | str) -> Column:
    """quantileExactState(x) → sorted ARRAY of every value (the reference's
    QuantileExact state is also the full value array)."""
    return F.array_sort(F.collect_list(_c(col)))


# --- uniq (HyperLogLog) ----------------------------------------------------

def _hll_pieces(col: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one value: bucket = low 8 bits of the portable
    md5-48 hash; rho = leading-zero count of the remaining 40 bits + 1
    (∈ [1, 41]; an all-zero remainder scores 41)."""
    h = md5_48(col.cast("string"))
    bucket = F.pmod(h, F.lit(HLL_M)).cast("int")
    rest = F.floor(h / HLL_M).cast("long")
    rho = (
        F.when(rest > 0, F.lit(41) - F.length(F.bin(rest)))
        .otherwise(F.lit(41))
        .cast("int")
    )
    return bucket, rho


def uniq_state(df: DataFrame, keys: list[str], col: Column | str,
               alias: str = "state") -> DataFrame:
    """uniqState(x) per key group, the scale path: groupBy (keys, bucket)
    keeps per-executor state at 256 counters per key — no executor ever
    buffers a key's raw values, and per-ROW aggregation work is O(1)
    (a 256-conditional-agg one-pass variant was measured 3.5× slower:
    512 aggregate fields disable whole-stage codegen).

    Returns keys + ``alias`` (ARRAY<INT> of 256 registers; absent buckets
    are 0).  NULL values are skipped like the reference's uniq.
    """
    return uniq_states(df, keys, {alias: col})


def uniq_states(df: DataFrame, keys: list[str],
                cols: Mapping[str, Column | str]) -> DataFrame:
    """Several uniqState register arrays off ONE scan and TWO shuffles
    total (e.g. uniq(user_id) AND uniq(event_id) per key): column j's
    bucket is offset into its own 256-slot range (``_b + 256·j``), every
    row inlines one (offset-bucket, rho) pair per value column, a single
    groupBy(keys, _b) max map-side-combines to ≤ |keys|·len(cols)·256
    rows, and one groupBy(keys) slices the combined map back into one
    256-register array per alias — no pivot stage.  ``cols`` maps output
    alias → value column.

    NULL values keep their KEY alive as a null-bucket row (so an all-NULL
    key group still surfaces, with an all-zero state — reference
    uniq() = 0): collect_list skips NULL _b/_r pairs together, so the
    map stays aligned and the null-bucket row contributes nothing.

    Built from SQL expression strings, not nested Column HOFs: the
    per-Column py4j round-trips dominated DataFrame CONSTRUCTION time
    (~0.65 s/query measured) — one parsed expr string is one round-trip.
    """
    aliases = list(cols)
    names: dict[str, str] = {}
    extra = []
    for a in aliases:
        c = cols[a]
        if isinstance(c, str):
            names[a] = c
        else:
            extra.append(c.alias(f"_v_{a}"))
            names[a] = f"_v_{a}"
    if extra:
        df = df.select(*keys, *extra)
    # Hoist each value column's md5-48 hash into its own select level: the
    # cell expression references the hash 4 times (bucket, null guard, the
    # two `rest` uses), so inlining the hash chain macro-expands it into 4
    # md5 evaluations per column per row.  A non-cheap alias referenced
    # several times is kept as its own Project by CollapseProject, so the
    # hash runs ONCE (r10).  md5(NULL) = NULL ⟺ value NULL, so the null
    # guard on the hash is equivalent (r6 ADVICE semantics preserved).
    hdf = df.selectExpr(
        *keys,
        *[
            (f"cast(conv(substr(md5(cast(cast(`{names[a]}` as string)"
             f" as binary)),1,12),16,10) as bigint) as `_h_{j}`")
            for j, a in enumerate(aliases)
        ],
    )
    pairs = []
    for j, a in enumerate(aliases):
        h = f"`_h_{j}`"
        bucket = f"cast(pmod({h}, {HLL_M}) as int) + {HLL_M * j}"
        rest = f"cast(floor({h} / {HLL_M}) as bigint)"
        rho = (f"cast(if({h} is null, null,"
               f" if({rest} > 0, 41 - length(bin({rest})), 41)) as int)")
        pairs.append(f"named_struct('_b', {bucket}, '_r', {rho})")
    pre = hdf.selectExpr(*keys, f"inline(array({', '.join(pairs)}))")
    per_bucket = pre.groupBy(*keys, "_b").agg(F.max("_r").alias("_r"))
    assembled = per_bucket.groupBy(*keys).agg(
        F.expr("map_from_arrays(collect_list(_b), collect_list(_r))")
        .alias("_m"))
    slices = [
        f"transform(sequence({HLL_M * j}, {HLL_M * j + HLL_M - 1}),"
        f" i -> coalesce(_m[i], 0)) AS `{a}`"
        for j, a in enumerate(aliases)
    ]
    return assembled.selectExpr(*keys, *slices)


def uniq_state_agg(col: Column | str) -> Column:
    """uniqState(x) as ONE aggregate expression (for SQL-dialect parity and
    modest groups): folds collect_list(hash) into the register array.
    O(n·256) per group and buffers the group's hashes — prefer
    ``uniq_state`` on large data."""
    c = _c(col)
    h = md5_48(c.cast("string"))

    def upd(acc: Column, hv: Column) -> Column:
        bucket = F.pmod(hv, F.lit(HLL_M)).cast("int")
        rest = F.floor(hv / HLL_M).cast("long")
        rho = (
            F.when(rest > 0, F.lit(41) - F.length(F.bin(rest)))
            .otherwise(F.lit(41))
            .cast("int")
        )
        return F.transform(
            acc, lambda v, i: F.when(i == bucket, F.greatest(v, rho)).otherwise(v)
        )

    return F.aggregate(
        F.collect_list(h), F.array_repeat(F.lit(0), HLL_M), upd
    )


def uniq_merge_state_agg(state: Column | str) -> Column:
    """Merge uniq register arrays across rows (aggregate expression):
    elementwise max.  Per-key cost is the number of state ROWS (parts),
    not data rows."""
    if isinstance(state, str):
        return F.expr(
            f"aggregate(collect_list(`{state}`), array_repeat(0, {HLL_M}),"
            f" (acc, x) -> zip_with(acc, x, (a, b) -> greatest(a, b)))"
        )
    return F.aggregate(
        F.collect_list(_c(state)),
        F.array_repeat(F.lit(0), HLL_M),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: F.greatest(a, b)),
    )


def uniq_merge_states(df: DataFrame, keys: list[str], state: Column | str,
                      alias: str = "state") -> DataFrame:
    """Merge uniq states per key WITHOUT buffering state rows: posexplode
    registers → max per (key, position) → reassemble.  Linear, two
    map-side-combinable shuffles — the shape for millions of parts.
    (Measured alternatives: 256 per-position max-aggregates in one
    groupBy plans ~2 s of codegen overhead regardless of data size;
    a zip_with fold buffers all parts per key.)"""
    return uniq_merge_states_multi(
        df.select(*keys, _c(state).alias(alias)), keys, [alias])


def uniq_merge_states_multi(df: DataFrame, keys: list[str],
                            states: list[str]) -> DataFrame:
    """Merge several uniq state columns per key off ONE pass over the
    state rows: tag each array with its column name, posexplode, max per
    (key, column, position), reassemble, pivot back to one array column
    per name.  Same two map-side-combinable shuffles as the single-column
    merge however many state columns ride along."""
    tagged = df.select(*keys, F.inline(F.array(*[
        F.struct(F.lit(s).alias("_w"), F.col(s).alias("_s")) for s in states
    ])))
    ex = tagged.select(*keys, "_w", F.posexplode("_s").alias("_pos", "_rho"))
    per_pos = ex.groupBy(*keys, "_w", "_pos").agg(F.max("_rho").alias("_rho"))
    registers = F.transform(
        F.sequence(F.lit(0), F.lit(HLL_M - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0)),
    )
    assembled = (
        per_pos.groupBy(*keys, "_w")
        .agg(F.map_from_arrays(
            F.collect_list("_pos"), F.collect_list("_rho")).alias("_m"))
        .select(*keys, "_w", registers.alias("_state"))
    )
    if len(states) == 1:
        return assembled.select(*keys, F.col("_state").alias(states[0]))
    return assembled.groupBy(*keys).agg(*[
        F.max(F.when(F.col("_w") == s, F.col("_state"))).alias(s)
        for s in states
    ])


def uniq_finalize(state: Column | str) -> Column:
    """HLL estimate from a register array: E = alpha·m² / Σ 2^(-M_j), with
    linear counting (m·ln(m/zeros)) when E ≤ 2.5m and empty registers
    remain.  Every 2^(-M_j) is an exact double and their sum needs < 53
    mantissa bits, so the estimate is bit-identical under ANY summation
    order — the DuckDB oracle can reproduce it exactly."""
    if isinstance(state, str):
        inv = (f"aggregate(`{state}`, cast(0.0 as double),"
               f" (a, r) -> a + power(2.0, -cast(r as double)))")
        zeros = f"size(filter(`{state}`, r -> r = 0))"
        raw = f"({HLL_ALPHA * HLL_M * HLL_M!r} / {inv})"
        linear = f"({float(HLL_M)!r} * ln({float(HLL_M)!r} / cast({zeros} as double)))"
        return F.expr(
            f"if({raw} <= {2.5 * HLL_M!r} and {zeros} > 0, {linear}, {raw})")
    s = _c(state)
    inv_sum = F.aggregate(
        s, F.lit(0.0), lambda a, r: a + F.pow(F.lit(2.0), -r.cast("double"))
    )
    zeros = F.size(F.filter(s, lambda r: r == 0))
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / inv_sum
    linear = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double"))
    return F.when((raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), linear).otherwise(raw)


# --------------------------------------------------------------------------
# -Merge: aggregate expressions resuming from stored states
# --------------------------------------------------------------------------

def merge_state(kind: str, col: Column | str, order: Column | str | None = None) -> Column:
    """State-to-state merge for one aggregate column (the engine-FINAL /
    -MergeState operation).  ``order`` pins 'any'/'groupArray' part order."""
    c = _c(col)
    k = kind
    if k in ("count", "sum"):
        return F.sum(c)
    if k == "min":
        return F.min(c)
    if k == "max":
        return F.max(c)
    if k == "any":
        if order is None:
            raise ValueError("merging 'any' states needs an order column")
        return F.min_by(c, _c(order))
    if k == "anyLast":
        if order is None:
            raise ValueError("merging 'anyLast' states needs an order column")
        return F.max_by(c, _c(order))
    if k in ("avg", "sumCount"):
        return F.struct(
            F.sum(c.getField("sum")).alias("sum"),
            F.sum(c.getField("count")).alias("count"),
        )
    if k == "argMin":
        return F.min_by(c, c.getField("val"))
    if k == "argMax":
        return F.max_by(c, c.getField("val"))
    if k == "uniqExact":
        return F.array_sort(F.array_distinct(F.flatten(F.collect_list(c))))
    if k == "groupArray":
        if order is None:
            return F.flatten(F.collect_list(c))
        return F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(_c(order).alias("o"), c.alias("v")))
                ),
                lambda s: s["v"],
            )
        )
    if k == "quantileExact":
        return F.array_sort(F.flatten(F.collect_list(c)))
    if k == "uniq":
        return uniq_merge_state_agg(c)
    # SimpleAggregateFunction extras
    if k == "groupBitAnd":
        return F.bit_and(c)
    if k == "groupBitOr":
        return F.bit_or(c)
    if k == "groupBitXor":
        return F.bit_xor(c)
    if k == "groupArrayArray":
        return F.flatten(F.collect_list(c))
    if k == "groupUniqArrayArray":
        return F.array_sort(F.array_distinct(F.flatten(F.collect_list(c))))
    raise ValueError(f"no state merge for aggregate function {kind!r}")


def finalize_state(kind: str, col: Column | str) -> Column:
    """finalizeAggregation(state) — scalar, per row (no aggregation):
    collapse a state value to the aggregate's final result."""
    c = _c(col)
    if kind in ("count", "sum", "min", "max", "any", "anyLast", "groupArray",
                "sumCount", "groupBitAnd", "groupBitOr", "groupBitXor",
                "groupArrayArray", "groupUniqArrayArray"):
        return c
    if kind == "avg":
        # the reference's avg returns Float64 whatever the input type
        # (AggregateFunctionAvg.h) — and double division over exact decimal
        # state sums is deterministic where decimal result scales differ
        # between engines
        return c.getField("sum").cast("double") / c.getField("count")
    if kind in ("argMin", "argMax"):
        return c.getField("arg")
    if kind == "uniqExact":
        return F.size(c).cast("bigint")
    if kind == "uniq":
        return uniq_finalize(c)
    raise ValueError(f"no finalize for aggregate function {kind!r}")


def merge_finalize(kind: str, col: Column | str,
                   order: Column | str | None = None) -> Column:
    """-Merge combinator: merge states across rows AND finalize (what
    ``avgMerge(s)`` computes).  For kinds whose merge is a plain aggregate
    this stays one map-side-combinable expression."""
    k = kind
    if k == "uniqExact":
        return F.size(
            F.array_distinct(F.flatten(F.collect_list(_c(col))))
        ).cast("bigint")
    merged = merge_state(k, col, order)
    if k in ("avg", "argMin", "argMax", "uniq"):
        return finalize_state(k, merged)
    return merged


def initialize_aggregation(kind: str, value: Column | str) -> Column:
    """initializeAggregation('xState', v) — the state of a single-row
    aggregate, as a scalar expression (per row, no grouping)."""
    v = _c(value)
    if kind == "count":
        return F.when(v.isNotNull(), F.lit(1)).otherwise(F.lit(0)).cast("bigint")
    if kind in ("sum", "min", "max", "any", "anyLast"):
        return v
    if kind in ("avg", "sumCount"):
        one = F.when(v.isNotNull(), F.lit(1)).otherwise(F.lit(0)).cast("bigint")
        return F.struct(v.alias("sum"), one.alias("count"))
    if kind in ("uniqExact", "groupArray", "quantileExact"):
        # filter keeps the element type whatever v is (an empty typed array
        # for NULL inputs — array().cast would pin a wrong element type)
        return F.filter(F.array(v), lambda x: x.isNotNull())
    if kind == "uniq":
        bucket, rho = _hll_pieces(v)
        return F.transform(
            F.sequence(F.lit(0), F.lit(HLL_M - 1)),
            lambda i: F.when(v.isNotNull() & (i == bucket), rho).otherwise(F.lit(0)),
        )
    raise ValueError(f"no single-value state for aggregate function {kind!r}")


# --------------------------------------------------------------------------
# AggregatingMergeTree FINAL
# --------------------------------------------------------------------------

def aggregating_final(
    df: DataFrame,
    keys: list[str],
    agg_cols: Mapping[str, str],
    order: Column | str | None = None,
) -> DataFrame:
    """AggregatingMergeTree SELECT ... FINAL: one merged state row per key
    (AggregatingSortedAlgorithm.cpp folds equal-key rows by calling each
    column's merge).  ``agg_cols`` maps column → aggregate-function name;
    plain (non-state) columns take the first value in ``order`` order, like
    the algorithm keeping the first row's ordinary columns.

    Plan: single shuffle on ``keys``; every merge is a native partial
    aggregate except array states, whose per-key input is one row per PART.
    """
    aggs = [
        merge_state(kind, c, order).alias(c) for c, kind in agg_cols.items()
    ]
    others = [c for c in df.columns if c not in keys and c not in agg_cols]
    if others:
        if order is None:
            raise ValueError(
                f"plain columns {others} need an order column to pin 'first'"
            )
        payload = F.struct(*[F.col(c) for c in others])
        aggs.append(F.min_by(payload, _c(order)).alias("_first"))
    out = df.groupBy(*keys).agg(*aggs)
    cols: list[Column] = []
    for c in df.columns:
        if c in keys or c in agg_cols:
            cols.append(F.col(c))
        elif c in others:
            cols.append(F.col(f"_first.{c}").alias(c))
    return out.select(*cols)
