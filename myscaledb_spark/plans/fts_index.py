"""Persisted full-text index — the Spark answer to the reference's per-part
tantivy index (`src/Storages/MergeTree/TantivyIndexStore.h:55-59`,
`MergeTreeIndexTantivy.cpp`; build lifecycle like §3.3).

Artifact layout (parquet):
  <root>/<name>/postings/   (term, doc_id, tf, dl)  partitioned/bucketable
                            by term; dl is inlined per posting (Lucene
                            stores per-doc norms with the index the same
                            way) so scoring needs NO doclens join
  <root>/<name>/doclens/    (doc_id, dl)  kept for stats refresh on append
  <root>/<name>/dfreq/      (term, df)  per-term doc frequency, precomputed
                            at build — the reference's tantivy index stores
                            term dictionaries with doc counts likewise
  <root>/<name>/stats.json  {n_docs, avgdl, tokenizer}
Pre-r8 artifacts (no dl column / no dfreq dir) still work: fts_search
falls back to the join-based plan.

Query path (`fts_search`) computes exactly the same tantivy-style BM25 as
functions/text.py but reads ONLY the query terms' postings (predicate pushed
to the parquet scan) instead of re-tokenizing the corpus — at 100 TB this is
the difference between touching ~kB of postings and re-scanning the table.
Incremental maintenance: append new docs' postings + update stats
(foreachBatch in streaming ingestion, ≈ VIBuilderUpdater on new parts).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myscaledb_spark.errors import InvalidSearchQuery
from myscaledb_spark.functions.text import BM25_B, BM25_K1, tokenize, tokenize_query
from myscaledb_spark.plans.vector_index import IndexRegistry


#: in-memory postings cache — the reference keeps opened tantivy indexes in
#: an LRU store (TantivyIndexStoreFactory); here the postings/doclens
#: frames persist as Spark cached relations (MEMORY_AND_DISK: columnar
#: compressed, spills at scale) so repeated queries skip the parquet read.
#: Keyed by (base, stats.json mtime) — append/rebuild rewrites stats.json,
#: which invalidates the stale entry.
_FRAMES_CACHE: dict[tuple, tuple] = {}


def _cached_index_frames(spark: SparkSession, base: str):
    from pyspark import StorageLevel

    key = (base, os.path.getmtime(os.path.join(base, "stats.json")))
    hit = _FRAMES_CACHE.get(key)
    if hit is None:
        for stale in [k for k in _FRAMES_CACHE if k[0] == base]:
            for df_ in _FRAMES_CACHE.pop(stale):
                if df_ is not None:
                    df_.unpersist()
        postings = spark.read.parquet(os.path.join(base, "postings")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        doclens = spark.read.parquet(os.path.join(base, "doclens")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        dfreq_path = os.path.join(base, "dfreq")
        dfreq = (
            spark.read.parquet(dfreq_path).persist(StorageLevel.MEMORY_AND_DISK)
            if os.path.isdir(dfreq_path)
            else None
        )
        hit = (postings, doclens, dfreq)
        _FRAMES_CACHE[key] = hit
    return hit


#: per-build document-frequency memo: {(base, stats mtime): {term: df|None}}
#: (None = term absent from the index).  The r8 fast path collected the
#: pruned dfreq rows on EVERY query — one whole Spark job per search just
#: to fetch ≤|terms| floats; repeated terms now resolve driver-side.
#: Same key discipline as _FRAMES_CACHE: append/rebuild rewrites
#: stats.json, which invalidates the stale entry.
_DFMAP_CACHE: dict[tuple, dict] = {}
_DFMAP_MAX_TERMS = 4096


def _cached_dfmap(dfreq, base: str, terms: list[str]) -> dict:
    """{term: df} for the terms PRESENT in the index (absent terms omitted,
    matching the pruned-collect behavior), collecting only cache misses."""
    key = (base, os.path.getmtime(os.path.join(base, "stats.json")))
    for stale in [k for k in _DFMAP_CACHE if k[0] == base and k != key]:
        _DFMAP_CACHE.pop(stale)
    memo = _DFMAP_CACHE.setdefault(key, {})
    need = [t for t in set(terms) if t not in memo]
    if need:
        if len(memo) + len(need) > _DFMAP_MAX_TERMS:
            # eviction drops previously-cached terms of THIS query too, so
            # the whole term set must be re-collected, not just the misses
            # (r10 ADVICE: memo[t] below would KeyError otherwise)
            memo.clear()
            need = list(set(terms))
        for r in dfreq.filter(F.col("term").isin(need)).collect():
            memo[r["term"]] = float(r["df"])
        for t in need:
            memo.setdefault(t, None)
    return {t: memo[t] for t in set(terms) if memo[t] is not None}


def _spec_to_json(spec) -> dict | None:
    if spec is None:
        return None
    return {
        "type": spec.type,
        "stop_word_filters": list(spec.stop_word_filters),
        "stem_languages": list(spec.stem_languages),
        "length_limit": spec.length_limit,
    }


def _spec_from_json(obj):
    if not obj:
        return None
    from myscaledb_spark.functions.tokenizer_spec import parse_tokenizer

    return parse_tokenizer(obj)


def build_fts_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    artifact_dir: str,
    name: str = "fts",
    tokenizer: str = "simple",
    spec=None,
) -> dict:
    """``spec`` (TokenizerSpec) persists the reference's full per-column
    tokenizer config with the index artifact (MergeTreeIndexTantivy.cpp
    stores the config in the index metadata the same way), so searches
    always analyze queries with the exact chain the postings were built
    with."""
    reg = IndexRegistry(artifact_dir)
    reg.set_status(name, "InProgress", column=text_col, index_type="fts",
                   params={"tokenizer": tokenizer, "spec": _spec_to_json(spec)})

    toked = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize(text_col, tokenizer, spec=spec).alias("toks"),
    )
    doclens = toked.select("doc_id", F.size("toks").alias("dl"))
    # dl rides along into each posting row (first() over the constant-per-doc
    # dl) so the query path never joins doclens
    postings = (
        toked.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )

    base = os.path.join(artifact_dir, name)
    postings.write.mode("overwrite").parquet(os.path.join(base, "postings"))
    doclens.write.mode("overwrite").parquet(os.path.join(base, "doclens"))
    # per-term doc frequency, precomputed once at build (read back from the
    # written postings so the tokenization pass isn't recomputed)
    spark = df.sparkSession
    spark.read.parquet(os.path.join(base, "postings")).groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    ).write.mode("overwrite").parquet(os.path.join(base, "dfreq"))

    n_docs, avgdl = doclens.agg(
        F.count(F.lit(1)), F.avg("dl")
    ).collect()[0]
    os.makedirs(base, exist_ok=True)
    json.dump(
        {
            "n_docs": int(n_docs),
            "avgdl": float(avgdl),
            "tokenizer": tokenizer,
            "spec": _spec_to_json(spec),
        },
        open(os.path.join(base, "stats.json"), "w"),
    )
    reg.set_status(name, "Built", base=base)
    return reg.get(name)


def fts_search(
    spark: SparkSession,
    artifact_dir: str,
    query: str,
    k: int,
    name: str = "fts",
    operator: str = "OR",
    score_name: str = "bm25_score",
) -> DataFrame:
    """Index-backed BM25 top-k. Same scores as the direct path (table-global
    stats), but the scan touches only the query terms' postings."""
    if k is None or k <= 0:
        raise InvalidSearchQuery("text search requires a positive LIMIT (top-k)")
    reg = IndexRegistry(artifact_dir)
    rec = reg.get(name)
    if rec is None or rec.get("status") != "Built":
        raise RuntimeError(f"fts index {name!r} not built")
    base = rec["base"]
    stats = json.load(open(os.path.join(base, "stats.json")))
    terms = tokenize_query(
        query, stats["tokenizer"], spec=_spec_from_json(stats.get("spec"))
    )
    if not terms:
        raise InvalidSearchQuery("empty text-search query after tokenization")
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])

    all_postings, doclens, dfreq = _cached_index_frames(spark, base)
    # term filter prunes the cached columnar batches (min/max per batch;
    # on a cold cache the same predicate pushes into the parquet scan)
    postings = all_postings.filter(F.col("term").isin(terms))

    if dfreq is not None and "dl" in all_postings.columns:
        # r8 fast path: df comes from the build-time dfreq table (one tiny
        # pruned lookup — ≤ #query-terms rows) and dl is inlined in the
        # postings, so the scoring plan is ONE groupBy pivot over the pruned
        # postings + executeTake — zero joins, one shuffle (map-side
        # partial-agg'd), vs the legacy plan's dfreq shuffle + broadcast
        # join + doclens join.
        dfmap = _cached_dfmap(dfreq, base, terms)
        norm = (
            F.col("tf").cast("double")
            * (BM25_K1 + 1.0)
            / (
                F.col("tf").cast("double")
                + BM25_K1
                * (1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.lit(avgdl))
            )
        )
        # Pivot per-term norms and add idf·norm in query-term order — the
        # same association order as bm25_scores' expression tree
        # (((0+s0)+s1)+s2), so indexed and direct scores are bit-identical
        # doubles. idf's log argument is computed driver-side with the same
        # IEEE op order ((n_docs - df) + 0.5) / (df + 0.5); F.log of the
        # literal is constant-folded by the SAME JVM Math.log as the legacy
        # column expression, so the folded constant is bit-identical too.
        aggs = [
            F.sum(F.when(F.col("term") == t, norm)).alias(f"_n_{i}")
            for i, t in enumerate(terms)
        ] + [F.count(F.lit(1)).alias("_nterms")]
        agg = postings.groupBy("doc_id").agg(*aggs)
        score = F.lit(0.0)
        for i, t in enumerate(terms):
            if t in dfmap:
                idf = F.log(
                    F.lit(1.0 + (n_docs - dfmap[t] + 0.5) / (dfmap[t] + 0.5))
                )
                score = score + F.coalesce(idf * F.col(f"_n_{i}"), F.lit(0.0))
            else:
                # term absent from the index: no posting rows, contributes
                # exactly the 0.0 the legacy inner-join plan contributed
                score = score + F.lit(0.0)
        agg = agg.withColumn(score_name, score)
        if operator.upper() == "AND":
            agg = agg.filter(F.col("_nterms") == len(terms))
        return (
            agg.drop("_nterms", *[f"_n_{i}" for i in range(len(terms))])
            .orderBy(F.col(score_name).desc(), F.col("doc_id").asc())
            .limit(k)
        )

    # legacy plan for pre-r8 artifacts (no dfreq dir / no inlined dl)
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(doclens, "doc_id")
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_s",
            # parenthesized idf * (norm) — the exact association order of
            # bm25_scores' `idf * norm`, keeping indexed scores bit-identical
            F.col("_idf")
            * (
                F.col("tf").cast("double")
                * (BM25_K1 + 1.0)
                / (
                    F.col("tf").cast("double")
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.lit(avgdl))
                )
            ),
        )
    )
    # Pivot per-term scores and add them in query-term order — the same
    # association order as bm25_scores' expression tree (((0+s0)+s1)+s2), so
    # indexed and direct scores are bit-identical doubles, not just close.
    # A float F.sum over term-rows would have nondeterministic add order.
    aggs = [
        F.sum(F.when(F.col("term") == t, F.col("_s"))).alias(f"_s_{i}")
        for i, t in enumerate(terms)
    ] + [F.count(F.lit(1)).alias("_nterms")]
    agg = scored.groupBy("doc_id").agg(*aggs)
    score = F.lit(0.0)
    for i in range(len(terms)):
        score = score + F.coalesce(F.col(f"_s_{i}"), F.lit(0.0))
    agg = agg.withColumn(score_name, score)
    if operator.upper() == "AND":
        agg = agg.filter(F.col("_nterms") == len(terms))
    return (
        agg.drop("_nterms", *[f"_s_{i}" for i in range(len(terms))])
        .orderBy(F.col(score_name).desc(), F.col("doc_id").asc())
        .limit(k)
    )


def append_to_fts_index(
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    artifact_dir: str,
    name: str = "fts",
) -> dict:
    """Incremental maintenance: append postings/doclens for new docs and
    refresh global stats (≈ index build on a freshly inserted part)."""
    reg = IndexRegistry(artifact_dir)
    rec = reg.get(name)
    if rec is None or rec.get("status") != "Built":
        raise RuntimeError(f"fts index {name!r} not built")
    base = rec["base"]
    stats = json.load(open(os.path.join(base, "stats.json")))
    toked = new_docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize(
            text_col, stats["tokenizer"], spec=_spec_from_json(stats.get("spec"))
        ).alias("toks"),
    )
    has_dl = os.path.isdir(os.path.join(base, "dfreq"))
    new_postings = (
        toked.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    if not has_dl:
        # pre-r8 artifact: keep its (term, doc_id, tf) schema
        new_postings = new_postings.drop("dl")
    new_postings.write.mode("append").parquet(os.path.join(base, "postings"))
    doclens = toked.select("doc_id", F.size("toks").alias("dl"))
    doclens.write.mode("append").parquet(os.path.join(base, "doclens"))

    spark = new_docs.sparkSession
    if has_dl:
        # refresh the precomputed per-term df over the merged postings
        # (build-time cost; queries stay join-free)
        merged_df = (
            spark.read.parquet(os.path.join(base, "postings"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        tmp = os.path.join(base, "dfreq_next")
        merged_df.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(os.path.join(base, "dfreq"))
        os.rename(tmp, os.path.join(base, "dfreq"))
    n_docs, avgdl = (
        spark.read.parquet(os.path.join(base, "doclens"))
        .agg(F.count(F.lit(1)), F.avg("dl"))
        .collect()[0]
    )
    stats.update({"n_docs": int(n_docs), "avgdl": float(avgdl)})
    json.dump(stats, open(os.path.join(base, "stats.json"), "w"))
    reg.set_status(name, "Built", base=base)
    return reg.get(name)
