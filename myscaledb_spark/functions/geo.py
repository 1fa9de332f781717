"""Geo functions beyond the haversine family (SURVEY §2.8 geo ◐→✅):
geohashEncode / geohashDecode / geohashesInBox, pointInPolygon,
polygonAreaCartesian / polygonPerimeterCartesian.

Reference parity:
  - geohash bisection + base32     src/Functions/GeoHash.cpp:66-131,225-261
  - geohashesInBox grid            src/Functions/GeoHash.cpp:263-344
  - pointInPolygon                 src/Functions/pointInPolygon.cpp (boost
    within; here the classic even-odd ray cast — identical off-boundary,
    boundary points are a documented deviation)
  - polygonArea/Perimeter          src/Functions/polygonArea.cpp,
    polygonPerimeter.cpp (cartesian variants; shoelace / edge-length sums)

Everything is a pure JVM column expression. The geohash bisection runs inside
`aggregate` lambdas where the interval state is a BOUND variable (the
expression-size discipline from functions/hashes.py) — every interval
midpoint (min+max)/2 reached from ±180/±90 is exactly representable in
binary, so the Spark doubles, the C++ reference, and the pinned Python
reference (`geohash_encode_py` below, used by the gate oracle) agree
bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_MAX_PRECISION = 12


def _norm_precision(precision: int) -> int:
    # GeoHash.cpp:218-222: 0 or >12 falls back to 12
    if precision == 0 or precision > _MAX_PRECISION:
        return _MAX_PRECISION
    if precision < 0:
        raise ValueError(f"geohash precision must be >= 0, got {precision}")
    return precision


def _coord_bits(coord: Column, mn: float, mx: float, bits: int) -> Column:
    """Bisection-encode `coord` in [mn, mx] to `bits` bits packed in a long
    (GeoHash.cpp encodeCoordinate). State is bound inside the aggregate
    lambda, so the expression tree stays linear in `bits`."""
    init = F.struct(
        F.lit(float(mn)).alias("mn"),
        F.lit(float(mx)).alias("mx"),
        F.lit(0).cast("long").alias("acc"),
    )

    def step(s, _):
        mid = (s["mn"] + s["mx"]) / 2
        ge = coord >= mid
        return F.struct(
            F.when(ge, mid).otherwise(s["mn"]).alias("mn"),
            F.when(ge, s["mx"]).otherwise(mid).alias("mx"),
            (s["acc"] * 2 + F.when(ge, 1).otherwise(0)).alias("acc"),
        )

    if bits == 0:
        return F.lit(0).cast("long")
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(bits)), init, step, lambda s: s["acc"]
    )


def geohash_encode(lon: Column, lat: Column, precision: int = 12) -> Column:
    """geohashEncode(longitude, latitude, precision) -> base32 string."""
    p = _norm_precision(precision)
    lon_bits = (p * 5) // 2 + (1 if p % 2 else 0)
    lat_bits = (p * 5) // 2
    lookup = F.array(*[F.lit(c) for c in GEOHASH_B32])

    # compute each coordinate's bit pack ONCE, then build the string inside a
    # transform lambda where the packs are bound references
    pair = F.array(
        F.struct(
            _coord_bits(lon, -180.0, 180.0, lon_bits).alias("lo"),
            _coord_bits(lat, -90.0, 90.0, lat_bits).alias("la"),
        )
    )

    def build(s):
        chars = []
        for k in range(p):
            v = F.lit(0)
            for b in range(5):
                j = 5 * k + b
                if j % 2 == 0:
                    bit = F.shiftright(s["lo"], lon_bits - 1 - j // 2)
                else:
                    bit = F.shiftright(s["la"], lat_bits - 1 - j // 2)
                v = v * 2 + bit.bitwiseAND(F.lit(1))
            chars.append(F.element_at(lookup, (v + 1).cast("int")))
        return F.concat(*chars)

    return F.element_at(F.transform(pair, build), 1)


def _decode_coord(vals: Column, mn: float, mx: float, bits: Column, odd: bool) -> Column:
    """Bisection-decode one coordinate from the per-char base32 values
    (GeoHash.cpp decodeCoordinate + split). Combined bit j for this
    coordinate lives at combined index 2*i (+1 for latitude); char j//5,
    in-char bit 4 - j%5."""
    offset = 1 if odd else 0

    def step(s, i):
        j = i * 2 + offset
        val = F.element_at(vals, (j / F.lit(5)).cast("int") + 1)
        # shiftright() takes a literal int shift; here the shift is a column,
        # so divide by 2^k instead (val < 32 -> exact)
        bit = (
            (val / F.pow(F.lit(2.0), (F.lit(4) - j % 5)))
            .cast("int")
            .bitwiseAND(F.lit(1))
        )
        mid = (s["mn"] + s["mx"]) / 2
        one = bit == 1
        return F.struct(
            F.when(one, mid).otherwise(s["mn"]).alias("mn"),
            F.when(one, s["mx"]).otherwise(mid).alias("mx"),
        )

    init = F.struct(F.lit(mn).alias("mn"), F.lit(mx).alias("mx"))
    return F.aggregate(
        F.sequence(F.lit(0), bits - 1),
        init,
        step,
        lambda s: (s["mn"] + s["mx"]) / 2,
    )


def geohash_decode(gh: Column) -> Column:
    """geohashDecode(string) -> struct(longitude, latitude) of the cell
    center; empty string decodes to (0, 0) (GeoHash.cpp:240-248). A hash
    containing a non-base32 character decodes to NULL (the reference reads
    masked garbage from its lookup table for such input; the Python
    reference raises — NULL is this engine's documented middle ground,
    never a silently-wrong coordinate)."""
    lookup = F.array(*[F.lit(c) for c in GEOHASH_B32])
    p = F.least(F.length(gh), F.lit(_MAX_PRECISION))
    chars = F.slice(F.split(gh, ""), 1, _MAX_PRECISION)
    all_valid = F.forall(chars, lambda c: F.array_position(lookup, c) > 0)
    vals_arr = F.array(
        F.struct(
            F.transform(
                chars, lambda c: (F.array_position(lookup, c) - 1).cast("int")
            ).alias("v"),
            p.alias("p"),
        )
    )

    def build(s):
        vals, n = s["v"], s["p"]
        lon_bits = (n * 5 / 2).cast("int") + (n % 2)
        lat_bits = (n * 5 / 2).cast("int")
        return F.struct(
            _decode_coord(vals, -180.0, 180.0, lon_bits, odd=False).alias(
                "longitude"
            ),
            _decode_coord(vals, -90.0, 90.0, lat_bits, odd=True).alias("latitude"),
        )

    decoded = F.element_at(F.transform(vals_arr, build), 1)
    zero = F.struct(
        F.lit(0.0).alias("longitude"), F.lit(0.0).alias("latitude")
    )
    return F.when(p == 0, zero).when(all_valid, decoded)


def geohashes_in_box(
    lon_min: Column,
    lat_min: Column,
    lon_max: Column,
    lat_max: Column,
    precision: int,
) -> Column:
    """geohashesInBox: array of geohash strings of every precision-`p` cell
    intersecting the box, in the reference's lon-major grid order
    (GeoHash.cpp:263-344). Inverted/NaN boxes yield an empty array.

    FP parity: min/max are saturated then floor/ceil-aligned to the cell grid
    with the same double op sequence as the reference (divide, floor, multiply),
    so the grid origin and item counts match bit-for-bit."""
    p = _norm_precision(precision)
    lon_bits = (p * 5) // 2 + (1 if p % 2 else 0)
    lat_bits = (p * 5) // 2
    lon_step = math.ldexp(360.0, -lon_bits)
    lat_step = math.ldexp(180.0, -lat_bits)

    def sat(c, lo, hi):
        return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))

    lon0 = F.floor(sat(lon_min, -180.0, 180.0) / lon_step) * lon_step
    lat0 = F.floor(sat(lat_min, -90.0, 90.0) / lat_step) * lat_step
    lon1 = F.ceil(sat(lon_max, -180.0, 180.0) / lon_step) * lon_step
    lat1 = F.ceil(sat(lat_max, -90.0, 90.0) / lat_step) * lat_step
    lon_items = ((lon1 - lon0) / lon_step).cast("int")
    lat_items = ((lat1 - lat0) / lat_step).cast("int")

    grid_arr = F.array(
        F.struct(
            lon0.alias("lon0"),
            lat0.alias("lat0"),
            lon_items.alias("ni"),
            lat_items.alias("nj"),
        )
    )

    def build(s):
        cells = F.flatten(
            F.transform(
                F.sequence(F.lit(0), s["ni"] - 1),
                lambda i: F.transform(
                    F.sequence(F.lit(0), s["nj"] - 1),
                    lambda j: geohash_encode(
                        s["lon0"] + F.lit(lon_step) * i,
                        s["lat0"] + F.lit(lat_step) * j,
                        p,
                    ),
                ),
            )
        )
        # GeoHash.cpp:349-357 — a valid box whose aligned grid is empty
        # (degenerate point on a cell boundary) still yields its one cell
        empty = (s["ni"] <= 0) | (s["nj"] <= 0)
        fallback = F.array(geohash_encode(s["lon0"], s["lat0"], p))
        return F.when(empty, fallback).otherwise(cells)

    bad = (
        (lon_max < lon_min)
        | (lat_max < lat_min)
        | F.isnan(lon_min)
        | F.isnan(lon_max)
        | F.isnan(lat_min)
        | F.isnan(lat_max)
    )
    return F.when(bad, F.array().cast("array<string>")).otherwise(
        F.element_at(F.transform(grid_arr, build), 1)
    )


# --- Python reference (oracle side), pinned to public geohash test vectors ----


def geohash_encode_py(lon: float, lat: float, precision: int = 12) -> str:
    p = _norm_precision(precision)
    lon_bits = (p * 5) // 2 + (1 if p % 2 else 0)
    lat_bits = (p * 5) // 2

    def enc(coord, mn, mx, bits):
        acc = 0
        for _ in range(bits):
            mid = (mn + mx) / 2
            if coord >= mid:
                acc = acc * 2 + 1
                mn = mid
            else:
                acc = acc * 2
                mx = mid
        return acc

    lo, la = enc(lon, -180.0, 180.0, lon_bits), enc(lat, -90.0, 90.0, lat_bits)
    out = []
    for k in range(p):
        v = 0
        for b in range(5):
            j = 5 * k + b
            if j % 2 == 0:
                bit = (lo >> (lon_bits - 1 - j // 2)) & 1
            else:
                bit = (la >> (lat_bits - 1 - j // 2)) & 1
            v = v * 2 + bit
        out.append(GEOHASH_B32[v])
    return "".join(out)


def geohash_decode_py(gh: str) -> tuple[float, float]:
    p = min(len(gh), _MAX_PRECISION)
    if p == 0:
        return (0.0, 0.0)
    vals = [GEOHASH_B32.index(c) for c in gh[:p]]

    def dec(mn, mx, bits, offset):
        for i in range(bits):
            j = i * 2 + offset
            bit = (vals[j // 5] >> (4 - j % 5)) & 1
            mid = (mn + mx) / 2
            if bit:
                mn = mid
            else:
                mx = mid
        return (mn + mx) / 2

    lon_bits = (p * 5) // 2 + (1 if p % 2 else 0)
    lat_bits = (p * 5) // 2
    return (dec(-180.0, 180.0, lon_bits, 0), dec(-90.0, 90.0, lat_bits, 1))


def geohashes_in_box_py(
    lon_min: float, lat_min: float, lon_max: float, lat_max: float, precision: int
) -> list[str]:
    p = _norm_precision(precision)
    if (
        lon_max < lon_min
        or lat_max < lat_min
        or math.isnan(lon_min)
        or math.isnan(lon_max)
        or math.isnan(lat_min)
        or math.isnan(lat_max)
    ):
        return []
    lon_bits = (p * 5) // 2 + (1 if p % 2 else 0)
    lat_bits = (p * 5) // 2
    lon_step = math.ldexp(360.0, -lon_bits)
    lat_step = math.ldexp(180.0, -lat_bits)
    sat = lambda v, lo, hi: min(max(v, lo), hi)  # noqa: E731
    lon0 = math.floor(sat(lon_min, -180.0, 180.0) / lon_step) * lon_step
    lat0 = math.floor(sat(lat_min, -90.0, 90.0) / lat_step) * lat_step
    lon1 = math.ceil(sat(lon_max, -180.0, 180.0) / lon_step) * lon_step
    lat1 = math.ceil(sat(lat_max, -90.0, 90.0) / lat_step) * lat_step
    ni, nj = int((lon1 - lon0) / lon_step), int((lat1 - lat0) / lat_step)
    out = [
        geohash_encode_py(lon0 + lon_step * i, lat0 + lat_step * j, p)
        for i in range(ni)
        for j in range(nj)
    ]
    if not out:
        # GeoHash.cpp:349-357 items==0 fallback: the aligned-origin cell
        out = [geohash_encode_py(lon0, lat0, p)]
    return out


# --- pointInPolygon / polygon metrics ----------------------------------------


def point_in_polygon(x: Column, y: Column, ring: Column) -> Column:
    """pointInPolygon((x, y), ring): even-odd ray cast over the edges of
    `ring` (array<struct<x:double, y:double>>, closing edge implied). For
    polygons with holes, XOR the per-ring results (even-odd semantics).
    Boundary points are engine-defined in the reference (boost within);
    callers needing determinism keep points off edges. An empty ring
    contains nothing (false)."""
    n = F.size(ring)

    def step(parity, i):
        a = F.element_at(ring, i + 1)
        b = F.element_at(ring, ((i + 1) % n) + 1)
        straddles = (a["y"] > y) != (b["y"] > y)
        x_int = (b["x"] - a["x"]) * (y - a["y"]) / (b["y"] - a["y"]) + a["x"]
        crosses = straddles & (x < x_int)
        return F.when(crosses, ~parity).otherwise(parity)

    # sequence(0, -1) is DESCENDING [0, -1], not empty (same gotcha as
    # functions/text.py) — guard the n == 0 case explicitly
    return F.when(n == 0, F.lit(False)).otherwise(
        F.aggregate(F.sequence(F.lit(0), n - 1), F.lit(False), step)
    )


def polygon_area_cartesian(ring: Column) -> Column:
    """polygonAreaCartesian: |shoelace| / 2 over the ring's implied-closed
    edge loop."""
    n = F.size(ring)

    def step(acc, i):
        a = F.element_at(ring, i + 1)
        b = F.element_at(ring, ((i + 1) % n) + 1)
        return acc + (a["x"] * b["y"] - b["x"] * a["y"])

    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.abs(F.aggregate(F.sequence(F.lit(0), n - 1), F.lit(0.0), step)) / 2
    )


def polygon_perimeter_cartesian(ring: Column) -> Column:
    """polygonPerimeterCartesian: sum of implied-closed edge lengths."""
    n = F.size(ring)

    def step(acc, i):
        a = F.element_at(ring, i + 1)
        b = F.element_at(ring, ((i + 1) % n) + 1)
        return acc + F.sqrt(
            (b["x"] - a["x"]) * (b["x"] - a["x"])
            + (b["y"] - a["y"]) * (b["y"] - a["y"])
        )

    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.aggregate(F.sequence(F.lit(0), n - 1), F.lit(0.0), step)
    )
