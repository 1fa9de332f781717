"""Curation-quality operators: Gopher repetition signals and DSIR
hashed-n-gram importance weighting (operators/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_repetition_signals_semantics(spark):
    from myscaledb_spark.operators.quality import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),             # maximal repetition
            (2, "all words here are fully distinct"),    # no repetition
            (3, ""),                                     # empty
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in repetition_signals(df, "text").collect()}
    assert out[1]["rep_dup_2gram_frac"] == 0.75          # 4 grams, 1 distinct
    assert out[1]["rep_top_word_frac"] == 1.0
    assert out[1]["rep_n_words"] == 5
    assert out[2]["rep_dup_2gram_frac"] == 0.0
    assert out[2]["rep_top_word_frac"] < 0.2
    assert out[3]["rep_dup_2gram_frac"] == 0.0 and out[3]["rep_n_words"] == 0


def test_dsir_importance_orders_by_target_likeness(spark):
    from myscaledb_spark.operators.quality import (
        bucket_log_probs,
        dsir_importance,
    )

    # raw corpus: half "code-like", half "prose-like"; target: prose only
    rows = [(i, "def func return value import class") for i in range(20)] + [
        (100 + i, "the quick brown fox jumps over lazy dogs") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    target = df.filter(F.col("id") >= 100)
    raw_lp = bucket_log_probs(df, "text", n_buckets=32)
    tgt_lp = bucket_log_probs(target, "text", n_buckets=32)
    out = dsir_importance(df, "text", tgt_lp, raw_lp)
    w = {r["id"]: r["dsir_logweight"] for r in out.collect()}
    # prose docs must outscore code docs under the prose target
    assert min(w[100 + i] for i in range(20)) > max(w[i] for i in range(20))
    # and prose docs score positive (more target-like than raw average)
    assert all(w[100 + i] > 0 for i in range(20))


def test_dsir_plan_stays_jvm(spark):
    from myscaledb_spark.operators.quality import (
        bucket_log_probs,
        dsir_importance,
        repetition_signals,
    )

    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    lp = bucket_log_probs(df, "text", n_buckets=8)
    out = dsir_importance(repetition_signals(df, "text"), "text", lp, lp)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
