"""sipHash64 / intHash64 / intHash32 JVM expressions vs Python references,
with the Python SipHash pinned to the official SipHash-2-4 test vector
(Aumasson & Bernstein, the SipHash paper, Appendix A) so the whole chain
column-expr ≡ python-ref ≡ published algorithm is closed."""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.functions.hashes import (
    int_hash32,
    int_hash32_py,
    int_hash64,
    int_hash64_py,
    signed64,
    siphash64,
    siphash64_py,
)


def test_siphash_paper_vector():
    # SipHash-2-4, key 000102...0f, message 00 01 ... 0e → a129ca6149be45e5
    k0, k1 = 0x0706050403020100, 0x0F0E0D0C0B0A0908
    assert siphash64_py(bytes(range(15)), k0, k1) == 0xA129CA6149BE45E5


def test_hash_columns_match_python(spark):
    samples = [
        "", "a", "ab", "abc", "abcdefg", "abcdefgh", "abcdefghi",
        "hello world", "数据查询快速", "olé café", "x" * 100,
    ]
    rows = [(i, s) for i, s in enumerate(samples)] + [(len(samples), None)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        r["id"]: (r["sip"], r["ih64"], r["ih32"])
        for r in df.select(
            "id",
            siphash64("s").alias("sip"),
            int_hash64(F.col("id")).alias("ih64"),
            int_hash32(F.col("id")).alias("ih32"),
        ).collect()
    }
    for i, s in enumerate(samples):
        assert got[i][0] == signed64(siphash64_py(s)), repr(s)
        assert got[i][1] == signed64(int_hash64_py(i))
        assert got[i][2] == int_hash32_py(i)
    assert got[len(samples)][0] is None  # null propagates


def test_int_hash_negative_and_large(spark):
    vals = [-1, -123456789, (1 << 62), -(1 << 62), 0]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: (r["h64"], r["h32"]) for r in df.select(
        "v", int_hash64(F.col("v")).alias("h64"), int_hash32(F.col("v")).alias("h32")
    ).collect()}
    m64 = (1 << 64) - 1
    for v in vals:
        assert got[v][0] == signed64(int_hash64_py(v & m64))
        assert got[v][1] == int_hash32_py(v & m64)


def test_siphash_no_python_in_plan(spark):
    from myscaledb_spark.plan_audit import assert_no_python_in_plan

    df = spark.range(3).select(siphash64(F.col("id").cast("string")).alias("h"))
    assert_no_python_in_plan(df)


def test_cityhash_matches_python(spark):
    """Every length branch of CityHash64 v1.0.2 (0..16, 17..32, 33..64,
    >64 single chunk, >64 multi chunk) + UTF-8 multibyte + raw bytes."""
    import random

    from myscaledb_spark.functions.hashes import _CK2, cityhash64, cityhash64_py

    assert cityhash64_py(b"") == _CK2  # city.cc:147 (len==0 → k2)
    strs = ["", "a", "ab", "abc", "abcd", "abcdefgh", "abcdefghi",
            "hello world", "数据查询", "x" * 33, "x" * 64, "x" * 65,
            "y" * 129, "the quick brown fox jumps over the lazy dog " * 3]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strs)], "id long, s string")
    got = {r["id"]: r["h"] for r in df.select("id", cityhash64("s").alias("h")).collect()}
    for i, s in enumerate(strs):
        assert got[i] == signed64(cityhash64_py(s)), repr(s)

    rng = random.Random(9)
    blobs = [bytes(rng.randrange(256) for _ in range(ln))
             for ln in (3, 8, 16, 31, 48, 63, 64, 70, 128, 300)]
    bdf = spark.createDataFrame(
        [(i, b.hex()) for i, b in enumerate(blobs)], "id long, hx string"
    )
    got2 = {r["id"]: r["h"] for r in bdf.select(
        "id", cityhash64(F.unhex(F.col("hx"))).alias("h")).collect()}
    for i, b in enumerate(blobs):
        assert got2[i] == signed64(cityhash64_py(b)), len(b)


def test_half_md5_matches_python(spark):
    from myscaledb_spark.functions.hashes import half_md5, half_md5_py

    strs = ["", "abc", "hello world", "数据"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strs)], "id long, s string")
    got = {r["id"]: r["h"] for r in df.select("id", half_md5("s").alias("h")).collect()}
    import hashlib

    # pin the python ref against hashlib directly for one value
    assert half_md5_py("abc") == int.from_bytes(hashlib.md5(b"abc").digest()[:8], "big")
    for i, s in enumerate(strs):
        assert got[i] == signed64(half_md5_py(s)), repr(s)
