"""Roaring-bitmap function family analog (`src/Functions/FunctionsBitmap.cpp`,
`src/AggregateFunctions/AggregateFunctionGroupBitmap.cpp`).

Spark-first representation: a bitmap is a SORTED array of DISTINCT bigints.
Roaring compression is a physical-layout concern the reference needs because
it materializes bitmap states; in Spark the columnar/Tungsten layout plus
whole-stage codegen fills that role, and every op below stays a JVM array
expression (no UDFs, no shuffle beyond the enclosing groupBy). The canonical
sorted-distinct form makes results deterministic and oracle-comparable.

Cardinality-only pipelines should prefer the *_cardinality forms — Catalyst
prunes the array materialization when only `size(...)` is consumed.

Empty-bitmap conventions: bitmap_min/bitmap_max return NULL on an empty
bitmap (the reference returns sentinel UINT32_MAX / 0 — a C++ism we do not
copy; NULL is the SQL-native answer and is documented here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- construction -------------------------------------------------------------
def bitmap_build(arr: Column | str) -> Column:
    """bitmapBuild: array -> canonical bitmap (sorted distinct)."""
    return F.array_sort(F.array_distinct(_c(arr)))


def group_bitmap_state(col: Column | str) -> Column:
    """groupBitmapState aggregate: bitmap of all values in the group."""
    return F.array_sort(F.collect_set(_c(col)))


def group_bitmap(col: Column | str) -> Column:
    """groupBitmap aggregate: cardinality of the value set."""
    return F.countDistinct(_c(col))


# --- scalar ops ---------------------------------------------------------------
def bitmap_to_array(bm: Column | str) -> Column:
    return _c(bm)


def bitmap_cardinality(bm: Column | str) -> Column:
    return F.size(_c(bm)).cast("bigint")


def bitmap_min(bm: Column | str) -> Column:
    return F.array_min(_c(bm))


def bitmap_max(bm: Column | str) -> Column:
    return F.array_max(_c(bm))


def bitmap_and(a: Column | str, b: Column | str) -> Column:
    return F.array_sort(F.array_intersect(_c(a), _c(b)))


def bitmap_or(a: Column | str, b: Column | str) -> Column:
    return F.array_sort(F.array_union(_c(a), _c(b)))


def bitmap_xor(a: Column | str, b: Column | str) -> Column:
    a, b = _c(a), _c(b)
    return F.array_sort(
        F.array_except(F.array_union(a, b), F.array_intersect(a, b))
    )


def bitmap_andnot(a: Column | str, b: Column | str) -> Column:
    return F.array_sort(F.array_except(_c(a), _c(b)))


def bitmap_and_cardinality(a: Column | str, b: Column | str) -> Column:
    return F.size(F.array_intersect(_c(a), _c(b))).cast("bigint")


def bitmap_or_cardinality(a: Column | str, b: Column | str) -> Column:
    return F.size(F.array_union(_c(a), _c(b))).cast("bigint")


def bitmap_xor_cardinality(a: Column | str, b: Column | str) -> Column:
    return F.size(bitmap_xor(a, b)).cast("bigint")


def bitmap_andnot_cardinality(a: Column | str, b: Column | str) -> Column:
    return F.size(F.array_except(_c(a), _c(b))).cast("bigint")


def bitmap_contains(bm: Column | str, value: Column | int) -> Column:
    value = F.lit(value) if isinstance(value, int) else value
    return F.array_contains(_c(bm), value)


def bitmap_has_any(a: Column | str, b: Column | str) -> Column:
    return F.arrays_overlap(_c(a), _c(b))


def bitmap_has_all(a: Column | str, b: Column | str) -> Column:
    """True iff b ⊆ a (reference bitmapHasAll(a, b) semantics)."""
    return F.size(F.array_except(_c(b), _c(a))) == 0


def bitmap_subset_in_range(
    bm: Column | str, lo: Column | int, hi: Column | int
) -> Column:
    """Elements in [lo, hi) — reference half-open range semantics."""
    lo = F.lit(lo) if isinstance(lo, int) else lo
    hi = F.lit(hi) if isinstance(hi, int) else hi
    return F.filter(_c(bm), lambda x: (x >= lo) & (x < hi))


def bitmap_subset_limit(bm: Column | str, start: Column | int, limit: int) -> Column:
    """First `limit` elements >= start (bitmap is sorted, so slice works)."""
    start = F.lit(start) if isinstance(start, int) else start
    return F.slice(F.filter(_c(bm), lambda x: x >= start), 1, limit)


def bitmap_transform(
    bm: Column | str, from_arr: Column, to_arr: Column
) -> Column:
    """bitmapTransform: remap values found in from_arr to the positional
    counterpart in to_arr, keep others; result re-canonicalized."""
    mapping = F.map_from_arrays(from_arr, to_arr)
    remapped = F.transform(
        _c(bm), lambda x: F.coalesce(F.element_at(mapping, x), x)
    )
    return F.array_sort(F.array_distinct(remapped))


# --- fold aggregates over bitmap columns --------------------------------------
def group_bitmap_or_agg(bm_col: Column | str) -> Column:
    """groupBitmapOr: union of bitmaps across rows (one groupBy, flatten)."""
    return F.array_sort(F.array_distinct(F.flatten(F.collect_list(_c(bm_col)))))


def group_bitmap_and_agg(bm_col: Column | str) -> Column:
    """groupBitmapAnd: intersection across rows. Fold with the first bitmap
    as init — re-intersecting it is idempotent."""
    lst = F.collect_list(_c(bm_col))
    return F.array_sort(
        F.aggregate(
            lst,
            F.element_at(lst, 1),
            lambda acc, x: F.array_intersect(acc, x),
        )
    )


def group_bitmap_xor_agg(bm_col: Column | str) -> Column:
    """groupBitmapXor: symmetric difference across rows (empty-array init —
    XOR is not idempotent, so no first-element shortcut)."""
    lst = F.collect_list(_c(bm_col))
    empty = F.slice(F.element_at(lst, 1), 1, 0)
    return F.array_sort(
        F.aggregate(
            lst,
            empty,
            lambda acc, x: F.array_except(
                F.array_union(acc, x), F.array_intersect(acc, x)
            ),
        )
    )
