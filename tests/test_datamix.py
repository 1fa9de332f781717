"""Dataset-mixing operators: distributed-prefix-sum packing equals the
sequential layout, stratified sampling determinism, contamination join."""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.operators.datamix import (
    contamination_check,
    pack_sequences,
    sample_stratified,
)


def test_pack_sequences_equals_sequential(spark):
    rows = [(i, (i * 37) % 90 + 10) for i in range(500)]
    df = spark.createDataFrame(rows, "id int, n int")
    # force many range partitions so the offset machinery actually runs
    packed = {
        r.id: (r.seq_id, r.offset_in_seq)
        for r in pack_sequences(df, "id", "n", 256, ["id"], num_partitions=13).collect()
    }
    cum = 0
    for i, n in rows:
        assert packed[i] == (cum // 256, cum % 256), i
        cum += n


def test_pack_sequences_oversized_doc_spans(spark):
    df = spark.createDataFrame([(1, 100), (2, 500), (3, 100)], "id int, n int")
    got = {r.id: r.seq_id for r in pack_sequences(df, "id", "n", 256, ["id"]).collect()}
    # doc 2 starts in window 0 (offset 100) and spans; doc 3 starts at 600 -> window 2
    assert got == {1: 0, 2: 0, 3: 2}


def test_sample_stratified_deterministic_and_rated(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(4000)], "id int, s string"
    )
    kept1 = sample_stratified(
        df, "s", {"a": 0.5}, F.col("id").cast("string"), default_rate=0.0
    )
    kept2 = sample_stratified(
        df, "s", {"a": 0.5}, F.col("id").cast("string"), default_rate=0.0
    )
    ids1 = sorted(r.id for r in kept1.collect())
    assert ids1 == sorted(r.id for r in kept2.collect())  # deterministic
    assert all(i % 2 == 1 for i in ids1)  # default_rate=0 drops stratum b
    # rate is approximately honored (hash-uniform)
    assert 0.4 < len(ids1) / 2000 < 0.6


def test_contamination_check_hits_and_misses(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today".split()),
            (2, "completely different words in this training document here".split()),
        ],
        "id int, toks array<string>",
    )
    ev = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog".split()),
            (11, "no overlap with anything at all whatsoever in corpus".split()),
        ],
        "eid int, etoks array<string>",
    )
    out = {
        r.eid: r.n_contaminated_docs
        for r in contamination_check(
            train, "id", F.col("toks"), ev, "eid", F.col("etoks"), 8
        ).collect()
    }
    assert out == {10: 1}  # eval 11 shares no 8-gram -> absent


def test_pack_sequences_tied_order_keys_deterministic(spark):
    """Rows tied on the order key must not share a slot (ROWS frame + id
    tie-break, not the default RANGE frame)."""
    df = spark.createDataFrame(
        [(1, "same", 100), (2, "same", 100), (3, "same", 100)],
        "id int, k string, n int",
    )
    rows = pack_sequences(df, "id", "n", 256, ["k"]).collect()
    slots = sorted((r.seq_id, r.offset_in_seq) for r in rows)
    assert slots == [(0, 0), (0, 100), (0, 200)]
