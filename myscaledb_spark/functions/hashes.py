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


# --- CityHash64 v1.0.2 Python reference (contrib/cityhash102/src/city.cc) ----

_CK0 = 0xC3A5C85C97CB3127
_CK1 = 0xB492B66FBE98F273
_CK2 = 0x9AE16A3B2F90404F
_CK3 = 0xC949D7C7509E6557
_KMUL = 0x9DDFEA08EB382D69


def _rotr64(v: int, s: int) -> int:
    return v if s == 0 else ((v >> s) | (v << (64 - s))) & _M64


def _smix(v: int) -> int:
    return v ^ (v >> 47)


def _hl16(u: int, v: int) -> int:
    """Hash128to64 (city.h:91-100), low=u high=v."""
    a = ((u ^ v) * _KMUL) & _M64
    a ^= a >> 47
    b = ((v ^ a) * _KMUL) & _M64
    b ^= b >> 47
    return (b * _KMUL) & _M64


def _f64(d: bytes, p: int) -> int:
    return int.from_bytes(d[p : p + 8], "little")


def _f32(d: bytes, p: int) -> int:
    return int.from_bytes(d[p : p + 4], "little")


def _weak32(w: int, x: int, y: int, z: int, a: int, b: int):
    """WeakHashLen32WithSeeds (city.cc:159-169)."""
    a = (a + w) & _M64
    b = _rotr64((b + a + z) & _M64, 21)
    c = a
    a = (a + x + y) & _M64
    b = (b + _rotr64(a, 44)) & _M64
    return (a + z) & _M64, (b + c) & _M64


def cityhash64_py(data: bytes | str) -> int:
    """CityHash64 v1.0.2 (city.cc:205-245) — the exact version the
    reference vendors (NOT current upstream CityHash)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    if n <= 16:  # HashLen0to16, city.cc:125-147
        if n > 8:
            a = _f64(data, 0)
            b = _f64(data, n - 8)
            return _hl16(a, _rotr64((b + n) & _M64, n)) ^ b
        if n >= 4:
            a = _f32(data, 0)
            return _hl16((n + (a << 3)) & _M64, _f32(data, n - 4))
        if n > 0:
            a, b, c = data[0], data[n >> 1], data[n - 1]
            y = a + (b << 8)
            z = n + (c << 2)
            return (_smix(((y * _CK2) & _M64) ^ ((z * _CK3) & _M64)) * _CK2) & _M64
        return _CK2
    if n <= 32:  # HashLen17to32, city.cc:148-157
        a = (_f64(data, 0) * _CK1) & _M64
        b = _f64(data, 8)
        c = (_f64(data, n - 8) * _CK2) & _M64
        d = (_f64(data, n - 16) * _CK0) & _M64
        return _hl16(
            (_rotr64((a - b) & _M64, 43) + _rotr64(c, 30) + d) & _M64,
            (a + _rotr64(b ^ _CK3, 20) - c + n) & _M64,
        )
    if n <= 64:  # HashLen33to64, city.cc:182-203
        z = _f64(data, 24)
        a = (_f64(data, 0) + (n + _f64(data, n - 16)) * _CK0) & _M64
        b = _rotr64((a + z) & _M64, 52)
        c = _rotr64(a, 37)
        a = (a + _f64(data, 8)) & _M64
        c = (c + _rotr64(a, 7)) & _M64
        a = (a + _f64(data, 16)) & _M64
        vf = (a + z) & _M64
        vs = (b + _rotr64(a, 31) + c) & _M64
        a = (_f64(data, 16) + _f64(data, n - 32)) & _M64
        z = _f64(data, n - 8)
        b = _rotr64((a + z) & _M64, 52)
        c = _rotr64(a, 37)
        a = (a + _f64(data, n - 24)) & _M64
        c = (c + _rotr64(a, 7)) & _M64
        a = (a + _f64(data, n - 16)) & _M64
        wf = (a + z) & _M64
        ws = (b + _rotr64(a, 31) + c) & _M64
        r = _smix(((vf + ws) * _CK2 + (wf + vs) * _CK0) & _M64)
        return (_smix((r * _CK0 + vs) & _M64) * _CK2) & _M64
    # > 64: city.cc:216-245
    x = _f64(data, 0)
    y = _f64(data, n - 16) ^ _CK1
    z = _f64(data, n - 56) ^ _CK0
    v = _weak32(_f64(data, n - 64), _f64(data, n - 56), _f64(data, n - 48),
                _f64(data, n - 40), n, y)
    w = _weak32(_f64(data, n - 32), _f64(data, n - 24), _f64(data, n - 16),
                _f64(data, n - 8), (n * _CK1) & _M64, _CK0)
    z = (z + _smix(v[1]) * _CK1) & _M64
    x = (_rotr64((z + x) & _M64, 39) * _CK1) & _M64
    y = (_rotr64(y, 33) * _CK1) & _M64
    rem = (n - 1) & ~63
    p = 0
    while rem != 0:
        x = (_rotr64((x + y + v[0] + _f64(data, p + 16)) & _M64, 37) * _CK1) & _M64
        y = (_rotr64((y + v[1] + _f64(data, p + 48)) & _M64, 42) * _CK1) & _M64
        x ^= w[1]
        y ^= v[0]
        z = _rotr64(z ^ w[0], 33)
        v = _weak32(_f64(data, p), _f64(data, p + 8), _f64(data, p + 16),
                    _f64(data, p + 24), (v[1] * _CK1) & _M64, (x + w[0]) & _M64)
        w = _weak32(_f64(data, p + 32), _f64(data, p + 40), _f64(data, p + 48),
                    _f64(data, p + 56), (z + w[1]) & _M64, y)
        z, x = x, z
        p += 64
        rem -= 64
    return _hl16(
        (_hl16(v[0], w[0]) + _smix(y) * _CK1 + z) & _M64,
        (_hl16(v[1], w[1]) + x) & _M64,
    )


#: the SQL-visible functions salt their inputs (FunctionsHashing.h:133-152)
INT_HASH64_SALT = 0x4CF2D2BAAE6DA887
INT_HASH32_SALT = 0x75D9543DE018BF45


def half_md5_py(data: bytes | str) -> int:
    """halfMD5 (`FunctionsHashing.h:170-193`): first 8 bytes of the MD5
    digest interpreted big-endian, as UInt64."""
    import hashlib

    if isinstance(data, str):
        data = data.encode("utf-8")
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


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


# --- cityHash64 column form: a micro-op VM over aggregate() -------------------
# CityHash64 has length-dependent control flow and a 64-byte chunk loop whose
# rounds chain multiplies — far past what substituted Column trees survive
# (see the sipround note above). So the hash compiles to DATA: per-row, a
# CASE on the length selects an array of (op, dst, a, b, imm) micro-ops
# (loads at length-dependent offsets, wrapping add/sub/mul-const, rotates,
# xors); chunk ops are generated by transform() over the chunk index, so any
# length works; ONE aggregate() then interprets the ops over an array-of-12-
# longs register file. Each op's lambda subtree is bounded (~700 nodes) no
# matter the input length. All arithmetic is the same ANSI-safe limb style
# as above.

_NREG = 12
_RA, _RB, _RC, _RD, _RX, _RY, _RZ, _V1, _V2, _W1, _W2, _RT = range(_NREG)
(_LOADW, _LOAD32, _LOAD8, _MOVI, _MOV, _ADD, _SUB, _XOR, _ADDI, _MULC,
 _ROTR, _SHL, _SMIX, _XORI) = range(14)


class _CityAsm:
    """Tiny assembler: emits micro-op struct Columns."""

    def __init__(self):
        self.ops: list[Column] = []

    def _imm(self, imm) -> Column:
        if imm is None:
            return F.lit(0).cast("long")
        if isinstance(imm, int):
            return F.lit(signed64(imm)).cast("long")
        return imm.cast("long")

    def emit(self, op: int, d: int = 0, a: int = 0, b: int = 0, imm=None):
        self.ops.append(
            F.struct(
                F.lit(op).alias("op"), F.lit(d).alias("d"),
                F.lit(a).alias("a"), F.lit(b).alias("b"),
                self._imm(imm).alias("imm"),
            )
        )

    # mnemonic helpers (dst-first)
    def loadw(self, d, off):
        self.emit(_LOADW, d, imm=off)

    def load32(self, d, off):
        self.emit(_LOAD32, d, imm=off)

    def load8(self, d, off):
        self.emit(_LOAD8, d, imm=off)

    def movi(self, d, imm):
        self.emit(_MOVI, d, imm=imm)

    def mov(self, d, a):
        self.emit(_MOV, d, a)

    def add(self, d, a, b):
        self.emit(_ADD, d, a, b)

    def sub(self, d, a, b):
        self.emit(_SUB, d, a, b)

    def xor(self, d, a, b):
        self.emit(_XOR, d, a, b)

    def addi(self, d, imm):
        self.emit(_ADDI, d, d, imm=imm)

    def mulc(self, d, imm):
        self.emit(_MULC, d, d, imm=imm)

    def rotr(self, d, imm):
        self.emit(_ROTR, d, d, imm=imm)

    def shl(self, d, imm):
        self.emit(_SHL, d, d, imm=imm)

    def smix(self, d):
        self.emit(_SMIX, d, d)

    def xori(self, d, imm):
        self.emit(_XORI, d, d, imm=imm)

    def hl16(self, d, u, v):
        """HashLen16(r[u], r[v]) → r[d]; d must differ from u and v."""
        self.xor(d, u, v)
        self.mulc(d, _KMUL)
        self.smix(d)
        self.xor(d, v, d)
        self.mulc(d, _KMUL)
        self.smix(d)
        self.mulc(d, _KMUL)

    def weak32(self, base, seed_setup, out1, out2):
        """WeakHashLen32WithSeeds(s+base, a, b) → (r[out1], r[out2]).
        seed_setup() must leave seed a in RA, seed b in RB; uses RC/RD/RT."""
        seed_setup()
        self.loadw(_RT, base)  # w
        self.add(_RA, _RA, _RT)  # a += w
        self.loadw(_RD, base + 24)  # z
        self.add(_RB, _RB, _RA)
        self.add(_RB, _RB, _RD)
        self.rotr(_RB, 21)  # b = rotr(b+a+z, 21)
        self.mov(_RC, _RA)  # c = a
        self.loadw(_RT, base + 8)
        self.add(_RA, _RA, _RT)  # a += x
        self.loadw(_RT, base + 16)
        self.add(_RA, _RA, _RT)  # a += y
        self.mov(_RT, _RA)
        self.rotr(_RT, 44)
        self.add(_RB, _RB, _RT)  # b += rotr(a, 44)
        self.add(_RA, _RA, _RD)
        self.mov(out1, _RA)  # out1 = a + z
        self.add(_RB, _RB, _RC)
        self.mov(out2, _RB)  # out2 = b + c


def _city_ops(n: Column) -> Column:
    """The per-row op array: CASE on length over six straight-line programs
    (result lands in r[RA])."""

    def _prog(fill) -> Column:
        asm = _CityAsm()
        fill(asm)
        return F.array(*asm.ops)

    def p_zero(s: _CityAsm):
        s.movi(_RA, _CK2)

    def p_1_3(s: _CityAsm):
        s.load8(_RA, F.lit(0).cast("long"))
        s.load8(_RB, F.floor(n / 2).cast("long"))
        s.load8(_RC, n - 1)
        s.shl(_RB, 8)
        s.add(_RA, _RA, _RB)  # y = a + (b << 8)
        s.shl(_RC, 2)
        s.movi(_RT, n)
        s.add(_RC, _RC, _RT)  # z = len + (c << 2)
        s.mulc(_RA, _CK2)
        s.mulc(_RC, _CK3)
        s.xor(_RA, _RA, _RC)
        s.smix(_RA)
        s.mulc(_RA, _CK2)

    def p_4_8(s: _CityAsm):
        s.load32(_RA, F.lit(0).cast("long"))
        s.shl(_RA, 3)
        s.addi(_RA, n)  # len + (a << 3)
        s.load32(_RB, n - 4)
        s.hl16(_RC, _RA, _RB)
        s.mov(_RA, _RC)

    def p_9_16(s: _CityAsm):
        s.loadw(_RA, F.lit(0).cast("long"))
        s.loadw(_RB, n - 8)
        s.mov(_RC, _RB)
        s.addi(_RC, n)
        s.rotr(_RC, n)  # RotateByAtLeast1(b + len, len); len 9..16 ≠ 0
        s.hl16(_RD, _RA, _RC)
        s.xor(_RA, _RD, _RB)

    def p_17_32(s: _CityAsm):
        s.loadw(_RA, F.lit(0).cast("long"))
        s.mulc(_RA, _CK1)  # a
        s.loadw(_RB, F.lit(8).cast("long"))  # b
        s.loadw(_RC, n - 8)
        s.mulc(_RC, _CK2)  # c
        s.loadw(_RD, n - 16)
        s.mulc(_RD, _CK0)  # d
        # u = rotr(a-b, 43) + rotr(c, 30) + d
        s.sub(_RT, _RA, _RB)
        s.rotr(_RT, 43)
        s.mov(_RX, _RC)
        s.rotr(_RX, 30)
        s.add(_RT, _RT, _RX)
        s.add(_RT, _RT, _RD)  # RT = u
        # v = a + rotr(b ^ k3, 20) - c + len
        s.xori(_RB, _CK3)
        s.rotr(_RB, 20)
        s.add(_RB, _RB, _RA)
        s.sub(_RB, _RB, _RC)
        s.addi(_RB, n)  # RB = v
        s.hl16(_RA, _RT, _RB)

    def p_33_64(s: _CityAsm):
        s.loadw(_RZ, F.lit(24).cast("long"))  # z
        s.loadw(_RA, F.lit(0).cast("long"))
        s.loadw(_RT, n - 16)
        s.addi(_RT, n)
        s.mulc(_RT, _CK0)
        s.add(_RA, _RA, _RT)  # a = F64(0) + (len + F64(len-16)) * k0
        s.mov(_RB, _RA)
        s.add(_RB, _RB, _RZ)
        s.rotr(_RB, 52)  # b
        s.mov(_RC, _RA)
        s.rotr(_RC, 37)  # c
        s.loadw(_RT, F.lit(8).cast("long"))
        s.add(_RA, _RA, _RT)
        s.mov(_RD, _RA)
        s.rotr(_RD, 7)
        s.add(_RC, _RC, _RD)  # c += rotr(a, 7)
        s.loadw(_RT, F.lit(16).cast("long"))
        s.add(_RA, _RA, _RT)
        s.mov(_V1, _RA)
        s.add(_V1, _V1, _RZ)  # vf = a + z
        s.mov(_V2, _RB)
        s.mov(_RD, _RA)
        s.rotr(_RD, 31)
        s.add(_V2, _V2, _RD)
        s.add(_V2, _V2, _RC)  # vs = b + rotr(a, 31) + c
        s.loadw(_RA, F.lit(16).cast("long"))
        s.loadw(_RT, n - 32)
        s.add(_RA, _RA, _RT)  # a = F64(16) + F64(len-32)
        s.loadw(_RZ, n - 8)  # z
        s.mov(_RB, _RA)
        s.add(_RB, _RB, _RZ)
        s.rotr(_RB, 52)
        s.mov(_RC, _RA)
        s.rotr(_RC, 37)
        s.loadw(_RT, n - 24)
        s.add(_RA, _RA, _RT)
        s.mov(_RD, _RA)
        s.rotr(_RD, 7)
        s.add(_RC, _RC, _RD)
        s.loadw(_RT, n - 16)
        s.add(_RA, _RA, _RT)
        s.mov(_W1, _RA)
        s.add(_W1, _W1, _RZ)  # wf
        s.mov(_W2, _RB)
        s.mov(_RD, _RA)
        s.rotr(_RD, 31)
        s.add(_W2, _W2, _RD)
        s.add(_W2, _W2, _RC)  # ws
        s.mov(_RT, _V1)
        s.add(_RT, _RT, _W2)
        s.mulc(_RT, _CK2)
        s.mov(_RD, _W1)
        s.add(_RD, _RD, _V2)
        s.mulc(_RD, _CK0)
        s.add(_RT, _RT, _RD)
        s.smix(_RT)  # r
        s.mulc(_RT, _CK0)
        s.add(_RT, _RT, _V2)
        s.smix(_RT)
        s.mulc(_RT, _CK2)
        s.mov(_RA, _RT)

    def p_long_prefix(s: _CityAsm):
        s.loadw(_RX, F.lit(0).cast("long"))  # x
        s.loadw(_RY, n - 16)
        s.xori(_RY, _CK1)  # y
        s.loadw(_RZ, n - 56)
        s.xori(_RZ, _CK0)  # z

        def seeds_v():
            s.movi(_RA, n)
            s.mov(_RB, _RY)

        s.weak32(n - 64, seeds_v, _V1, _V2)

        def seeds_w():
            s.movi(_RA, n)
            s.mulc(_RA, _CK1)
            s.movi(_RB, _CK0)

        s.weak32(n - 32, seeds_w, _W1, _W2)
        s.mov(_RT, _V2)
        s.smix(_RT)
        s.mulc(_RT, _CK1)
        s.add(_RZ, _RZ, _RT)  # z += smix(v2) * k1
        s.add(_RX, _RX, _RZ)
        s.rotr(_RX, 39)
        s.mulc(_RX, _CK1)  # x = rotr(z + x, 39) * k1
        s.rotr(_RY, 33)
        s.mulc(_RY, _CK1)  # y = rotr(y, 33) * k1

    def p_chunk(s: _CityAsm, o: Column):
        s.loadw(_RT, o + 16)
        s.add(_RX, _RX, _RY)
        s.add(_RX, _RX, _V1)
        s.add(_RX, _RX, _RT)
        s.rotr(_RX, 37)
        s.mulc(_RX, _CK1)  # x = rotr(x+y+v1+F64(o+16), 37) * k1
        s.loadw(_RT, o + 48)
        s.add(_RY, _RY, _V2)
        s.add(_RY, _RY, _RT)
        s.rotr(_RY, 42)
        s.mulc(_RY, _CK1)  # y = rotr(y+v2+F64(o+48), 42) * k1
        s.xor(_RX, _RX, _W2)  # x ^= w2
        s.xor(_RY, _RY, _V1)  # y ^= v1
        s.xor(_RZ, _RZ, _W1)
        s.rotr(_RZ, 33)  # z = rotr(z ^ w1, 33)

        def seeds_v():
            s.mov(_RA, _V2)
            s.mulc(_RA, _CK1)
            s.mov(_RB, _RX)
            s.add(_RB, _RB, _W1)

        s.weak32(o, seeds_v, _V1, _V2)

        def seeds_w():
            s.mov(_RA, _RZ)
            s.add(_RA, _RA, _W2)
            s.mov(_RB, _RY)

        s.weak32(o + 32, seeds_w, _W1, _W2)
        s.mov(_RT, _RZ)
        s.mov(_RZ, _RX)
        s.mov(_RX, _RT)  # swap(z, x)

    def p_final(s: _CityAsm):
        s.hl16(_RC, _V1, _W1)
        s.mov(_RT, _RY)
        s.smix(_RT)
        s.mulc(_RT, _CK1)
        s.add(_RC, _RC, _RT)
        s.add(_RC, _RC, _RZ)  # u = hl16(v1,w1) + smix(y)*k1 + z
        s.hl16(_RD, _V2, _W2)
        s.add(_RD, _RD, _RX)  # v = hl16(v2,w2) + x
        s.hl16(_RA, _RC, _RD)

    nchunks = F.floor((n - 1) / 64).cast("long")
    chunk_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(0).cast("long"), nchunks - 1),
            lambda i: _prog(lambda s: p_chunk(s, i * 64)),
        )
    )
    long_ops = F.concat(_prog(p_long_prefix), chunk_arr, _prog(p_final))

    return (
        F.when(n == 0, _prog(p_zero))
        .when(n <= 3, _prog(p_1_3))
        .when(n <= 8, _prog(p_4_8))
        .when(n <= 16, _prog(p_9_16))
        .when(n <= 32, _prog(p_17_32))
        .when(n <= 64, _prog(p_33_64))
        .otherwise(long_ops)
    )


def cityhash64(col: Column | str) -> Column:
    """cityHash64(string|binary) — CityHash64 v1.0.2 exactly as the
    reference vendors it, as a JVM expression. See the micro-op VM note
    above; bit-parity with cityhash64_py is pinned in tests/test_hashes.py.
    """
    col = F.col(col) if isinstance(col, str) else col
    data = col.cast("binary")
    hx = F.hex(data)
    n = F.length(data).cast("long")

    def byte_at(pos: Column) -> Column:
        return F.conv(F.substr(hx, pos * 2 + 1, F.lit(2)), 16, 10).cast("long")

    def fetch(off: Column, nbytes: int) -> Column:
        out = byte_at(off)
        for j in range(1, nbytes):
            out = out.bitwiseOR(F.shiftleft(byte_at(off + j), 8 * j))
        return out

    def wsub(a: Column, b: Column) -> Column:
        return _wadd(a, _wadd(b.bitwiseXOR(F.lit(-1)), F.lit(1).cast("long")))

    def wmulc(x: Column, c: Column) -> Column:
        out = F.lit(0).cast("long")
        for i in range(4):
            limb = F.shiftrightunsigned(c, 16 * i).bitwiseAND(F.lit(0xFFFF))
            lo = x.bitwiseAND(F.lit(_M32)) * limb  # < 2^48, ANSI-safe
            hi = F.shiftrightunsigned(x, 32) * limb
            part = _wadd(lo, F.shiftleft(hi, 32))
            out = _wadd(out, F.shiftleft(part, 16 * i))
        return out

    def rotr_var(x: Column, s: Column) -> Column:
        si = s.cast("int")
        return F.when(s == 0, x).otherwise(
            F.call_function("shiftrightunsigned", x, si).bitwiseOR(
                F.call_function("shiftleft", x, (F.lit(64) - si).cast("int"))
            )
        )

    def step(acc: Column, op: Column) -> Column:
        opc, d = op["op"], op["d"]
        ra = F.element_at(acc, op["a"] + 1)
        rb = F.element_at(acc, op["b"] + 1)
        imm = op["imm"]
        res = (
            F.when(opc == _LOADW, fetch(imm, 8))
            .when(opc == _LOAD32, fetch(imm, 4))
            .when(opc == _LOAD8, byte_at(imm))
            .when(opc == _MOVI, imm)
            .when(opc == _MOV, ra)
            .when(opc == _ADD, _wadd(ra, rb))
            .when(opc == _SUB, wsub(ra, rb))
            .when(opc == _XOR, ra.bitwiseXOR(rb))
            .when(opc == _ADDI, _wadd(ra, imm))
            .when(opc == _MULC, wmulc(ra, imm))
            .when(opc == _ROTR, rotr_var(ra, imm))
            .when(opc == _SHL, F.call_function("shiftleft", ra, imm.cast("int")))
            .when(opc == _SMIX, ra.bitwiseXOR(F.shiftrightunsigned(ra, 47)))
            .otherwise(ra.bitwiseXOR(imm))  # _XORI
        )
        return F.transform(
            F.sequence(F.lit(0), F.lit(_NREG - 1)),
            lambda j: F.when(j == d, res).otherwise(F.element_at(acc, j + 1)),
        )

    state0 = F.array_repeat(F.lit(0).cast("long"), _NREG)
    return F.element_at(F.aggregate(_city_ops(n), state0, step), _RA + 1)


def half_md5(col: Column | str) -> Column:
    """halfMD5 as a JVM expression: Spark's built-in md5() hex, first 16
    hex digits assembled as a big-endian UInt64 (two 32-bit halves — a
    single 16-digit conv would round-trip through an unsigned decimal
    string that can't cast back to long)."""
    col = F.col(col) if isinstance(col, str) else col
    hx = F.md5(col.cast("binary"))
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def ch_int_hash64(col: Column | str) -> Column:
    """The SQL-visible intHash64(x) = intHash64(x ⊕ salt)
    (FunctionsHashing.h:144-152)."""
    col = F.col(col) if isinstance(col, str) else col
    return int_hash64(col.cast("long").bitwiseXOR(F.lit(signed64(INT_HASH64_SALT))))


def ch_int_hash32(col: Column | str) -> Column:
    """The SQL-visible intHash32(x) = intHash32<salt>(x)
    (FunctionsHashing.h:133-142)."""
    return int_hash32(col, salt=INT_HASH32_SALT)


def ch_int_hash64_py(key: int) -> int:
    return int_hash64_py((key ^ INT_HASH64_SALT) & _M64)


def ch_int_hash32_py(key: int) -> int:
    return int_hash32_py(key, salt=INT_HASH32_SALT)


@functools.lru_cache(maxsize=None)
def _signed(v: int) -> int:
    """UInt64 bit pattern → signed two's-complement (Spark LongType view)."""
    return v - (1 << 64) if v >= 1 << 63 else v


def signed64(v: int) -> int:
    return _signed(v & _M64)
