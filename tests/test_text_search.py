"""BM25 text search + hybrid fusion vs pure-python oracles.

Oracle implements tantivy/Lucene BM25 (k1=1.2, b=0.75,
idf = ln(1 + (N - df + 0.5)/(df + 0.5))) and the reference fusion formulas
(HybridSearchUtils.cpp:163-314)."""

from __future__ import annotations

import math
import re

import numpy as np
import pytest

from myscaledb_spark.functions.text import text_search, tokenize_query
from myscaledb_spark.operators.hybrid import hybrid_search

K1, B = 1.2, 0.75


def _tok(s):
    return [t for t in re.split("[^a-z0-9]+", s.lower()) if t]


@pytest.fixture(scope="module")
def docs(spark):
    return [(r.doc_id, _tok(r.text)) for r in spark.table("documents").select("doc_id", "text").collect()]


def _bm25_oracle(docs, query, operator="OR"):
    terms = tokenize_query(query)
    n = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n
    df = {t: sum(1 for _, toks in docs if t in toks) for t in terms}
    out = []
    for doc_id, toks in docs:
        tfs = {t: toks.count(t) for t in terms}
        if operator == "AND" and not all(tfs[t] > 0 for t in terms):
            continue
        if not any(tfs[t] > 0 for t in terms):
            continue
        score = 0.0
        for t in terms:
            tf = tfs[t]
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(toks) / avgdl))
        out.append((doc_id, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


QUERY = "vector search fast"


def test_bm25_topk_matches_oracle(spark, docs):
    got = text_search(
        spark.table("documents"), "text", QUERY, 15, id_col="doc_id"
    ).select("doc_id", "bm25_score").collect()
    want = _bm25_oracle(docs, QUERY)[:15]
    assert [r.doc_id for r in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [r.bm25_score for r in got], [s for _, s in want], rtol=1e-9
    )


def test_bm25_and_operator(spark, docs):
    got = text_search(
        spark.table("documents"), "text", QUERY, 15, id_col="doc_id", operator="AND"
    ).select("doc_id").collect()
    want = _bm25_oracle(docs, QUERY, operator="AND")[:15]
    assert [r.doc_id for r in got] == [d for d, _ in want]


def _fusion_oracle(vec_list, txt_list, kind, k, asc=True, w=0.5, k0=60):
    """vec_list: [(id, dist)] ordered; txt_list: [(id, score)] ordered desc."""
    scores = {}
    if kind == "rrf":
        for rank, (i, _) in enumerate(vec_list, 1):
            scores[i] = scores.get(i, 0.0) + 1.0 / (k0 + rank)
        for rank, (i, _) in enumerate(txt_list, 1):
            scores[i] = scores.get(i, 0.0) + 1.0 / (k0 + rank)
    else:
        def norm(lst):
            vals = [s for _, s in lst]
            mn, mx = min(vals), max(vals)
            if mn == mx:
                return {i: 1.0 for i, _ in lst}
            return {i: (s - mn) / (mx - mn) for i, s in lst}
        tn = norm(txt_list)
        vn = norm(vec_list)
        for i, s in tn.items():
            scores[i] = scores.get(i, 0.0) + s * w
        for i, s in vn.items():
            d = s if not asc else (1.0 - s)
            scores[i] = scores.get(i, 0.0) + d * (1 - w)
    out = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("kind", ["rsf", "rrf"])
def test_hybrid_search(spark, docs, kind):
    # documents has no vector column — join embeddings on row id for the test
    d = spark.table("documents")
    e = spark.table("embeddings")
    df = d.join(e, d.doc_id == e.vec_id).select("doc_id", "text", "embedding")

    rng = np.random.default_rng(3)
    q = rng.standard_normal(64).tolist()
    k = 8

    got = hybrid_search(
        df, "embedding", "text", q, QUERY, k, "doc_id", fusion_type=kind
    ).collect()

    # oracle candidate lists from our own (already numpy-verified) primitives
    from myscaledb_spark.operators.topk import vector_topk
    from myscaledb_spark.functions.text import text_search as ts

    vec_list = [
        (r.doc_id, r.dist * r.dist)
        for r in vector_topk(df, "embedding", q, k, "L2", id_col="doc_id")
        .select("doc_id", "dist")
        .collect()
    ]
    txt_list = [
        (r.doc_id, r.bm25_score)
        for r in ts(df, "text", QUERY, k, id_col="doc_id")
        .select("doc_id", "bm25_score")
        .collect()
    ]
    want = _fusion_oracle(vec_list, txt_list, kind, k)
    assert [r.doc_id for r in got] == [i for i, _ in want]
    np.testing.assert_allclose(
        [r.fusion_score for r in got], [s for _, s in want], rtol=1e-9
    )


def test_fmm_tokenizer():
    from myscaledb_spark.functions.zh_tokenize import fmm_tokenize

    # longest match wins: 数据库 over 数据
    assert fmm_tokenize("数据库查询") == ["数据库", "查询"]
    assert fmm_tokenize("人工智能与机器学习") == ["人工智能", "与", "机器学习"]
    # mixed latin/CJK, punctuation separates
    assert fmm_tokenize("Spark引擎，fast查询!") == ["spark", "引擎", "fast", "查询"]
    # unknown CJK chars fall back to single-char tokens
    assert fmm_tokenize("鑫淼") == ["鑫", "淼"]
    assert fmm_tokenize("") == []
    assert fmm_tokenize(None) is None


def test_fmm_boundary_pairs():
    """Every ordered pair of gate-mapped words must segment back to exactly
    the pair — guarantees the bm25_cjk_topk oracle construction is valid."""
    from myscaledb_spark.functions.zh_tokenize import fmm_tokenize
    from myscaledb_spark.suite.search import ZH_MAP

    words = list(ZH_MAP.values())
    for a in words:
        for b in words:
            assert fmm_tokenize(a + b) == [a, b], (a, b)


def test_fmm_column_parity(spark):
    """fmm_tokenize_col (regex-alternation JVM form) must be bit-identical
    to the Python fmm_tokenize on adversarial mixed CJK/latin/punct input —
    the BM25 gate hash depends on it."""
    import random

    from pyspark.sql import functions as F

    from myscaledb_spark.functions.zh_dict import ZH_WORDS
    from myscaledb_spark.functions.zh_tokenize import fmm_tokenize, fmm_tokenize_col

    rng = random.Random(7)
    words = sorted(ZH_WORDS)
    chars = sorted({c for w in words for c in w})
    samples = [
        None, "", "hello world", "数据查询快速", "数据库查询",
        "人工智能与机器学习", "ABC数据123", "xx人工智能yy", "深度学习framework",
        "，。数据！查询？", "é数据é", "一二三四五", "数据数据数据",
    ]
    for _ in range(120):
        n = rng.randint(0, 24)
        samples.append("".join(
            rng.choice([rng.choice(chars), rng.choice(words),
                        rng.choice("abcXYZ019 ,.!-_é中")])
            for _ in range(n)
        ))
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id int, t string"
    )
    got = {
        r["id"]: r["toks"]
        for r in df.select("id", fmm_tokenize_col(F.col("t")).alias("toks")).collect()
    }
    for i, s in enumerate(samples):
        assert got[i] == fmm_tokenize(s), repr(s)


def _phrase_tf(toks, phrase):
    L = len(phrase)
    if len(toks) < L:
        return 0
    return sum(1 for i in range(len(toks) - L + 1) if toks[i : i + L] == phrase)


def _nlq_oracle(docs, clauses, k):
    """clauses: [(tokens, must, must_not)] in parse order."""
    pos = [c for c in clauses if not c[2]]
    neg = [c for c in clauses if c[2]]
    n = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n
    df = [sum(1 for _, toks in docs if _phrase_tf(toks, c[0]) > 0) for c in pos]
    out = []
    for doc_id, toks in docs:
        tfs = [_phrase_tf(toks, c[0]) for c in pos]
        if any(c[1] and tfs[i] == 0 for i, c in enumerate(pos)):
            continue
        plain = [tfs[i] for i, c in enumerate(pos) if not c[1]]
        if plain and not any(t > 0 for t in plain):
            continue
        if any(_phrase_tf(toks, c[0]) > 0 for c in neg):
            continue
        score = 0.0
        for i in range(len(pos)):
            tf = tfs[i]
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[i] + 0.5) / (df[i] + 0.5))
            score += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(toks) / avgdl))
        out.append((doc_id, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_parse_nlq():
    from myscaledb_spark.functions.text import parse_nlq

    got = parse_nlq('"table hash" +vector -slow fast')
    assert got == [
        {"tokens": ["table", "hash"], "phrase": True, "must": False, "must_not": False},
        {"tokens": ["vector"], "phrase": False, "must": True, "must_not": False},
        {"tokens": ["slow"], "phrase": False, "must": False, "must_not": True},
        {"tokens": ["fast"], "phrase": False, "must": False, "must_not": False},
    ]
    # bare multi-token term becomes a phrase (tantivy behavior)
    assert parse_nlq("foo-bar")[0]["phrase"] is True


def test_nlq_search_matches_oracle(spark, docs):
    from myscaledb_spark.functions.text import nlq_search

    q = '"table hash" +vector -slow'
    got = (
        nlq_search(spark.table("documents"), "text", q, 15, id_col="doc_id")
        .select("doc_id", "bm25_score")
        .collect()
    )
    clauses = [
        (["table", "hash"], False, False),
        (["vector"], True, False),
        (["slow"], False, True),
    ]
    want = _nlq_oracle(docs, clauses, 15)
    assert [r.doc_id for r in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [r.bm25_score for r in got], [s for _, s in want], rtol=1e-9
    )


def test_phrase_tf_overlap_semantics(spark):
    """Self-overlapping phrases count overlapping positions (HOF path);
    non-overlapping phrases use the replace-count fast path — both must
    equal the positional definition."""
    from pyspark.sql import Row
    from myscaledb_spark.functions.text import _clause_tf

    df = spark.createDataFrame(
        [Row(toks="a a a b a a".split()), Row(toks="x a b a b y".split()),
         Row(toks=[]), Row(toks=["a"])]
    )
    r = df.select(
        _clause_tf("toks", ["a", "a"]).alias("aa"),
        _clause_tf("toks", ["a", "b"]).alias("ab"),
    ).collect()
    got = [(x.aa, x.ab) for x in r]
    # positional oracle: [a,a,a,b,a,a]: aa at 0,1,4 -> 3; ab at 2 -> 1
    #                    [x,a,b,a,b,y]: aa 0; ab at 1,3 -> 2
    assert got == [(3.0, 1.0), (0.0, 2.0), (0.0, 0.0), (0.0, 0.0)]


def test_nlq_phrase_short_doc_guard(spark):
    """Docs shorter than the phrase must not crash (sequence(1,0) trap)."""
    from pyspark.sql import Row
    from myscaledb_spark.functions.text import nlq_scores

    df = spark.createDataFrame(
        [Row(id=1, text="table"), Row(id=2, text=""), Row(id=3, text="table hash x")]
    )
    rows = nlq_scores(df, "text", '"table hash"').select("id").collect()
    assert [r.id for r in rows] == [3]


def test_tokenizer_options(spark):
    from pyspark.sql import functions as F
    from myscaledb_spark.functions.text import tokenize, tokenize_any

    df = spark.range(1).select(
        tokenize(F.lit("The Quick brown fox the"), "simple",
                 stop_words=["the"]).alias("sw"),
        tokenize(F.lit("a ab abc abcd"), "simple", length_limit=3).alias("ll"),
        tokenize(F.lit("Spark数据引擎fast"), "chinese").alias("cjk"),
        tokenize(F.lit("Spark数据引擎fast"), "chinese_char").alias("cjk_char"),
        tokenize_any(F.array(F.lit("a b"), F.lit("c d")), "array<string>").alias("arr"),
        tokenize_any(
            F.create_map(F.lit("k"), F.lit("hello world")), "map<string,string>"
        ).alias("mp"),
    ).first()
    assert df.sw == ["quick", "brown", "fox"]
    assert df.ll == ["a", "ab", "abc"]
    assert df.cjk == ["spark", "数据", "引擎", "fast"]
    assert df.cjk_char == ["spark", "数", "据", "引", "擎", "fast"]
    assert df.arr == ["a", "b", "c", "d"]
    assert df.mp == ["hello", "world"]


def test_hybrid_search_indexed_matches_bruteforce(spark, tmp_path):
    """Index-backed hybrid (full-recall settings) must equal the brute-force
    hybrid exactly — candidates coincide when the index probes everything."""
    import numpy as np
    from myscaledb_spark.operators.hybrid import hybrid_search, hybrid_search_indexed
    from myscaledb_spark.plans.vector_index import build_ivf_index

    d = spark.table("documents")
    e = spark.table("embeddings")
    df = d.join(e, d.doc_id == e.vec_id).select("doc_id", "text", "embedding")

    art = str(tmp_path / "idx")
    build_ivf_index(df, "embedding", "doc_id", art, num_centroids=4)

    rng = np.random.default_rng(3)
    q = rng.standard_normal(64).tolist()
    brute = hybrid_search(
        df, "embedding", "text", q, QUERY, 8, "doc_id", fusion_type="rsf"
    ).collect()
    indexed = hybrid_search_indexed(
        spark, art, df, "text", q, QUERY, 8, "doc_id",
        index_kind="ivf", fusion_type="rsf", nprobe=4, vec_col="embedding",
    ).collect()
    assert [(r.doc_id, r.fusion_score) for r in brute] == [
        (r.doc_id, r.fusion_score) for r in indexed
    ]
