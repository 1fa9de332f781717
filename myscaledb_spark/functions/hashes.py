"""Non-portable hash parity: sipHash64 (+ intHash32/intHash64) as pure JVM
column expressions — closing the r3 VERDICT's documented hash deviation
(`src/Functions/FunctionsHashing.h`; SipHash-2-4 per `src/Common/SipHash.h`:
standard algorithm, default key (0,0), tail word = remaining bytes
little-endian with (len mod 256) in the top byte).

ANSI-safe 64-bit wrapping arithmetic: Spark 4 runs with ANSI on, where a
plain `+` on longs throws on overflow. Wrapping add is therefore built from
32-bit limbs (each partial sum < 2^33, never overflows) recombined with
bit-shifts, which wrap silently by definition. SipHash needs only add/xor/
rotl, so the whole hash stays inside whole-stage-codegen-able JVM
expressions — no Python, no UDF. Bytes come from HEX(binary) + substr/conv,
all built-ins.

The Python twins (`siphash64_py`, `int_hash64_py`) are driver-side
references used for literals and tests; `tests/test_hashes.py` pins the
column forms bit-identical to them, and sipHash64 to the SipHash paper's
official test vector.
"""

from __future__ import annotations

import functools
import struct

from pyspark.sql import Column
from pyspark.sql import functions as F

_M64 = (1 << 64) - 1
_M32 = 0xFFFFFFFF


# --- Python references --------------------------------------------------------


def _rotl_py(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _sipround_py(v0: int, v1: int, v2: int, v3: int):
    v0 = (v0 + v1) & _M64
    v1 = _rotl_py(v1, 13)
    v1 ^= v0
    v0 = _rotl_py(v0, 32)
    v2 = (v2 + v3) & _M64
    v3 = _rotl_py(v3, 16)
    v3 ^= v2
    v0 = (v0 + v3) & _M64
    v3 = _rotl_py(v3, 21)
    v3 ^= v0
    v2 = (v2 + v1) & _M64
    v1 = _rotl_py(v1, 17)
    v1 ^= v2
    v2 = _rotl_py(v2, 32)
    return v0, v1, v2, v3


def siphash64_py(data: bytes | str, k0: int = 0, k1: int = 0) -> int:
    """SipHash-2-4 (reference `src/Common/SipHash.h`), returns UInt64."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    v0 = 0x736F6D6570736575 ^ k0
    v1 = 0x646F72616E646F6D ^ k1
    v2 = 0x6C7967656E657261 ^ k0
    v3 = 0x7465646279746573 ^ k1
    n = len(data)
    for off in range(0, n - n % 8, 8):
        (m,) = struct.unpack_from("<Q", data, off)
        v3 ^= m
        v0, v1, v2, v3 = _sipround_py(v0, v1, v2, v3)
        v0, v1, v2, v3 = _sipround_py(v0, v1, v2, v3)
        v0 ^= m
    tail = data[n - n % 8 :]
    m = (n & 0xFF) << 56
    for j, byte in enumerate(tail):
        m |= byte << (8 * j)
    v3 ^= m
    v0, v1, v2, v3 = _sipround_py(v0, v1, v2, v3)
    v0, v1, v2, v3 = _sipround_py(v0, v1, v2, v3)
    v0 ^= m
    v2 ^= 0xFF
    for _ in range(4):
        v0, v1, v2, v3 = _sipround_py(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & _M64


def int_hash64_py(key: int) -> int:
    """intHash64 (`src/Common/HashTable/Hash.h:26-40`), UInt64 → UInt64."""
    key &= _M64
    key ^= key >> 33
    key = (key * 0xFF51AFD7ED558CCD) & _M64
    key ^= key >> 33
    key = (key * 0xC4CEB9FE1A85EC53) & _M64
    key ^= key >> 33
    return key


def int_hash32_py(key: int, salt: int = 0) -> int:
    """intHash32 (`src/Common/HashTable/Hash.h:499-511`), UInt64 → UInt32."""
    key = (key ^ salt) & _M64
    key = (~key + (key << 18)) & _M64
    key = key ^ ((key >> 31) | (key << 33) & _M64)
    key = (key * 21) & _M64
    key = key ^ ((key >> 11) | (key << 53) & _M64)
    key = (key + (key << 6)) & _M64
    key = key ^ ((key >> 22) | (key << 42) & _M64)
    return key & _M32


# --- ANSI-safe wrapping column arithmetic -------------------------------------


def _wadd(a: Column, b: Column) -> Column:
    """64-bit wrapping add from 32-bit limbs: every `+` operand < 2^33, so
    ANSI overflow checking can never fire; shifts wrap by definition."""
    m32 = F.lit(_M32)
    lo = a.bitwiseAND(m32) + b.bitwiseAND(m32)
    hi = (
        F.shiftrightunsigned(a, 32)
        + F.shiftrightunsigned(b, 32)
        + F.shiftrightunsigned(lo, 32)
    )
    return F.shiftleft(hi, 32).bitwiseOR(lo.bitwiseAND(m32))


def _rotl(x: Column, r: int) -> Column:
    return F.shiftleft(x, r).bitwiseOR(F.shiftrightunsigned(x, 64 - r))


def _sipround(v0: Column, v1: Column, v2: Column, v3: Column):
    v0 = _wadd(v0, v1)
    v1 = _rotl(v1, 13).bitwiseXOR(v0)
    v0 = _rotl(v0, 32)
    v2 = _wadd(v2, v3)
    v3 = _rotl(v3, 16).bitwiseXOR(v2)
    v0 = _wadd(v0, v3)
    v3 = _rotl(v3, 21).bitwiseXOR(v0)
    v2 = _wadd(v2, v1)
    v1 = _rotl(v1, 17).bitwiseXOR(v2)
    v2 = _rotl(v2, 32)
    return v0, v1, v2, v3


def _byte_at(hx: Column, pos: Column) -> Column:
    """0-based byte of a HEX(binary) string as a long (0..255)."""
    return F.conv(F.substr(hx, pos * 2 + 1, F.lit(2)), 16, 10).cast("long")


def _word_at(hx: Column, widx: Column) -> Column:
    """Little-endian 8-byte word starting at byte 8*widx (full words only).
    Bytes occupy disjoint bit ranges, so OR assembles without carries."""
    out = _byte_at(hx, widx * 8)
    for j in range(1, 8):
        out = out.bitwiseOR(F.shiftleft(_byte_at(hx, widx * 8 + j), 8 * j))
    return out


def siphash64(col: Column | str) -> Column:
    """sipHash64(string|binary) as a JVM expression; bit-equal to the
    reference (signed two's-complement view of the UInt64). One pass over
    the full words via `aggregate`, then the tail+finalization — no Python
    anywhere, safe to use in 100 TB sharding expressions."""
    col = F.col(col) if isinstance(col, str) else col
    data = col.cast("binary")  # strings → UTF-8 bytes, binary unchanged
    hx = F.hex(data)
    n = F.length(data).cast("long")
    nwords = F.floor(n / 8).cast("long")

    words = F.when(
        nwords > 0,
        F.transform(F.sequence(F.lit(0).cast("long"), nwords - 1), lambda i: _word_at(hx, i)),
    ).otherwise(F.array().cast("array<bigint>"))

    init = F.struct(
        F.lit(0x736F6D6570736575).alias("v0"),
        F.lit(0x646F72616E646F6D).alias("v1"),
        F.lit(0x6C7967656E657261).alias("v2"),
        F.lit(0x7465646279746573).alias("v3"),
    )

    def _pack(v0, v1, v2, v3) -> Column:
        return F.struct(v0.alias("v0"), v1.alias("v1"), v2.alias("v2"), v3.alias("v3"))

    # Expression-size discipline: a sipround substitutes each state var ~35×,
    # so compounding even two rounds in one lambda yields multi-thousand-node
    # trees (slow codegen), and rounds OUTSIDE a lambda compound ~35^k and
    # OOM the driver. The whole hash therefore runs as ONE aggregate whose
    # elements are (word, phase) op-codes executing exactly one sipround
    # each, with the phase selecting the surrounding xors:
    #   phase 0: v3 ^= m, then round        (first half of a compression)
    #   phase 1: round, then v0 ^= m        (second half)
    #   phase 2: round, v0 ^= m, v2 ^= 0xff (second half for the tail word)
    #   phase 3: bare finalization round
    def _op(m: Column, ph: int) -> Column:
        return F.struct(m.alias("m"), F.lit(ph).alias("ph"))

    word_ops = F.flatten(
        F.transform(words, lambda m: F.array(_op(m, 0), _op(m, 1)))
    )

    # tail word: remaining bytes little-endian, (n mod 256) in the top byte
    tail = F.shiftleft(n.bitwiseAND(F.lit(255)), 56)
    for j in range(7):
        tail = tail.bitwiseOR(
            F.when(
                F.lit(j) < (n - nwords * 8),
                F.shiftleft(_byte_at(hx, nwords * 8 + j), 8 * j),
            ).otherwise(F.lit(0).cast("long"))
        )

    zero = F.lit(0).cast("long")
    ops = F.concat(
        word_ops,
        F.array(
            _op(tail, 0), _op(tail, 2),
            _op(zero, 3), _op(zero, 3), _op(zero, 3), _op(zero, 3),
        ),
    )

    def _step(acc: Column, op: Column) -> Column:
        m, ph = op["m"], op["ph"]
        v3in = F.when(ph == 0, acc["v3"].bitwiseXOR(m)).otherwise(acc["v3"])
        r0, r1, r2, r3 = _sipround(acc["v0"], acc["v1"], acc["v2"], v3in)
        out0 = F.when((ph == 1) | (ph == 2), r0.bitwiseXOR(m)).otherwise(r0)
        out2 = F.when(ph == 2, r2.bitwiseXOR(F.lit(0xFF))).otherwise(r2)
        return _pack(out0, r1, out2, r3)

    return F.aggregate(
        ops,
        init,
        _step,
        lambda acc: acc["v0"]
        .bitwiseXOR(acc["v1"])
        .bitwiseXOR(acc["v2"])
        .bitwiseXOR(acc["v3"]),
    )


def int_hash64(col: Column | str) -> Column:
    """intHash64 as a JVM expression (two xorshift-multiply rounds). The
    wrapping 64×64 multiply by a constant is decomposed into 16-bit limbs of
    the constant: x*c = Σ shiftleft(wmul32(x, c16_i), 16·i) — each partial
    product is (x & 2^32-1)·c16 < 2^48 (no ANSI overflow) plus a shifted
    high part, recombined with wrapping adds."""
    col = F.col(col) if isinstance(col, str) else col
    x = col.cast("long")

    # Same expression-size discipline as siphash64: each xorshift-multiply
    # round runs inside an aggregate lambda where the state is a BOUND
    # variable, so the wrapping-multiply's limb fan-out can't compound
    # across rounds. The multiplier constant arrives as the array element;
    # its 16-bit limbs are re-derived with shifts on that leaf.
    def _round(acc: Column, c: Column) -> Column:
        y = acc.bitwiseXOR(F.shiftrightunsigned(acc, 33))
        out = F.lit(0).cast("long")
        for i in range(4):
            limb = F.shiftrightunsigned(c, 16 * i).bitwiseAND(F.lit(0xFFFF))
            lo = y.bitwiseAND(F.lit(_M32)) * limb  # < 2^48, safe under ANSI
            hi = F.shiftrightunsigned(y, 32) * limb  # < 2^48, safe
            part = _wadd(lo, F.shiftleft(hi, 32))
            out = _wadd(out, F.shiftleft(part, 16 * i))
        return out

    consts = F.array(
        F.lit(signed64(0xFF51AFD7ED558CCD)), F.lit(signed64(0xC4CEB9FE1A85EC53))
    )
    return F.aggregate(
        consts, x, _round,
        lambda acc: acc.bitwiseXOR(F.shiftrightunsigned(acc, 33)),
    )


def int_hash32(col: Column | str, salt: int = 0) -> Column:
    """intHash32 as a JVM expression (shift/xor/wrapping-add mix; the ×21
    multiply is decomposed as x·16 + x·4 + x with wrapping adds). Returns
    the UInt32 result as a long (0..2^32-1)."""
    col = F.col(col) if isinstance(col, str) else col
    k = col.cast("long")
    if salt:
        k = k.bitwiseXOR(F.lit(signed64(salt)))

    # six avalanche steps dispatched inside one aggregate lambda (same tree-
    # size discipline as siphash64 — inlining them compounds each step's
    # self-references multiplicatively)
    def _step(k: Column, i: Column) -> Column:
        return (
            F.when(i == 1, _wadd(k.bitwiseXOR(F.lit(-1)), F.shiftleft(k, 18)))
            .when(i == 2, k.bitwiseXOR(F.shiftrightunsigned(k, 31).bitwiseOR(F.shiftleft(k, 33))))
            .when(i == 3, _wadd(_wadd(F.shiftleft(k, 4), F.shiftleft(k, 2)), k))  # k * 21
            .when(i == 4, k.bitwiseXOR(F.shiftrightunsigned(k, 11).bitwiseOR(F.shiftleft(k, 53))))
            .when(i == 5, _wadd(k, F.shiftleft(k, 6)))
            .otherwise(k.bitwiseXOR(F.shiftrightunsigned(k, 22).bitwiseOR(F.shiftleft(k, 42))))
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(6)), k, _step,
        lambda acc: acc.bitwiseAND(F.lit(_M32)),
    )


@functools.lru_cache(maxsize=None)
def _signed(v: int) -> int:
    """UInt64 bit pattern → signed two's-complement (Spark LongType view)."""
    return v - (1 << 64) if v >= 1 << 63 else v


def signed64(v: int) -> int:
    return _signed(v & _M64)
