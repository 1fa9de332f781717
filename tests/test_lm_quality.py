"""Unigram LM quality scoring: smoothing, ordering determinism, OOV path."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from myscaledb_spark.operators.lm_quality import (
    unigram_counts,
    unigram_logprob_scores,
)


def test_self_trained_scores_match_hand_computation(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "id long, text string"
    )
    out = {r["id"]: r for r in unigram_logprob_scores(df, "id", "text").collect()}
    # corpus counts: a=2, b=2, c=1; N=5, V=3 → denom 8
    def lp(c):
        return math.log((c + 1) / 8.0)

    assert out[1]["n_tokens"] == 3
    exp1 = (lp(2) + lp(2) + lp(2)) / 3  # a, a, b all have count 2
    assert abs(out[1]["avg_logprob"] - exp1) < 1e-12
    exp2 = (lp(2) + lp(1)) / 2
    assert abs(out[2]["avg_logprob"] - exp2) < 1e-12
    assert abs(out[2]["ppl"] - math.exp(-exp2)) < 1e-9


def test_cross_model_unseen_tokens_smoothed_not_inf(spark):
    train = spark.createDataFrame([(1, "a a b")], "id long, text string")
    score = spark.createDataFrame([(9, "z z")], "id long, text string")
    model = unigram_counts(train, "text")
    out = unigram_logprob_scores(score, "id", "text", model=model).collect()[0]
    # z unseen: count 0 → +1 smoothing, never -inf; N=3, V=2 → log(1/5)
    assert abs(out["avg_logprob"] - math.log(1 / 5.0)) < 1e-12
    assert out["ppl"] == 5.0 or abs(out["ppl"] - 5.0) < 1e-9


def test_empty_documents_dropped(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "!!!")], "id long, text string")
    out = unigram_logprob_scores(df, "id", "text")
    assert [r["id"] for r in out.collect()] == [1]


def test_score_is_partitioning_invariant(spark):
    # the ordered fold must give identical bits under any partitioning
    rows = [(i, "w%d x y z common common" % (i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, text string")
    a = {r["id"]: r["avg_logprob"] for r in unigram_logprob_scores(df, "id", "text").collect()}
    b = {
        r["id"]: r["avg_logprob"]
        for r in unigram_logprob_scores(df.repartition(13, "id"), "id", "text").collect()
    }
    assert a == b


def _ref_qiw(pairs, level):
    """Direct port of QuantileInterpolatedWeighted.h getImpl (map → sorted
    distinct values, p_i = (cum - 0.5 w)/total, clamped interpolation)."""
    from collections import defaultdict

    m = defaultdict(int)
    for v, w in pairs:
        m[v] += w
    vw = sorted(m.items())
    total = float(sum(w for _, w in vw))
    cum, ps = 0.0, []
    for _, w in vw:
        cum += w
        ps.append((cum - 0.5 * w) / total)
    size = len(vw)
    if size == 1:
        return vw[0][0]
    if level >= ps[size - 2]:
        idx = size - 2
    else:
        start, end, idx = 0, size - 1, 0
        while start <= end:
            mid = start + (end - start) // 2
            if mid > size:
                break
            if level > ps[mid + 1]:
                start = mid + 1
            else:
                idx = mid
                end = mid - 1
    lq, u = idx, min(idx + 1, size - 1)
    xl, xr = ps[lq], ps[u]
    yl, yr = vw[lq][0], vw[u][0]
    if level < xl:
        yr = yl
    if level > xr:
        yl = yr
    dx = xr - xl
    dx = 1 if dx == 0 else dx
    return yl + ((yr - yl) / dx) * (level - xl)


def test_quantile_interpolated_weighted_matches_reference_port(spark):
    import random

    from myscaledb_spark.operators.agg_extras import quantile_interpolated_weighted

    rng = random.Random(7)
    rows = [("g%d" % (i % 3), float(rng.randint(1, 20)), rng.randint(1, 5))
            for i in range(200)]
    df = spark.createDataFrame(rows, "k string, v double, w int")
    for level in (0.1, 0.5, 0.9, 0.99):
        got = {
            r["k"]: r[1]
            for r in quantile_interpolated_weighted(
                df, ["k"], "v", "w", [level]
            ).collect()
        }
        for k in ("g0", "g1", "g2"):
            pairs = [(v, w) for kk, v, w in rows if kk == k]
            assert abs(got[k] - _ref_qiw(pairs, level)) < 1e-12, (k, level)


def test_quantile_interpolated_weighted_skips_nulls_and_bad_weights(spark):
    from myscaledb_spark.operators.agg_extras import quantile_interpolated_weighted

    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", None, 99), ("g", 2.0, 0), ("g", 3.0, 1)],
        "k string, v double, w int",
    )
    out = quantile_interpolated_weighted(df, ["k"], "v", "w", [0.5]).collect()[0]
    # only v=1 (w=1) and v=3 (w=1) participate: p = [0.25, 0.75] → q50 = 2.0
    assert out[1] == 2.0


def test_curation_pipeline_ppl_filter_composes(spark):
    from myscaledb_spark.pipelines import curate_documents

    docs = spark.table("documents")
    base = curate_documents(docs)
    # an absurdly low threshold must strictly shrink the kept set; a huge
    # one must change nothing (default path untouched)
    strict = curate_documents(docs, max_avg_neg_logprob=0.1)
    loose = curate_documents(docs, max_avg_neg_logprob=1e9)
    nb, ns, nl = base.count(), strict.count(), loose.count()
    assert ns == 0 and nl == nb and nb > 0
