"""End-to-end training-data curation pipeline — the flagship composition of
the LLM-pipeline operator families (driver brief): language ID → quality
filter → exact dedup → MinHash near-dup clustering → token accounting.

One declarative DataFrame graph: Catalyst sees the whole pipeline and prunes
columns/pushes filters across stages. Every stage is an operator that is
individually oracle-proven; `suite/pipeline.py` proves the composition too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myscaledb_spark.functions.text import tokenize
from myscaledb_spark.operators.dedup import (
    dedup_clusters,
    exact_dedup_groups,
    md5_48,
    minhash_dedup_pairs,
)
from myscaledb_spark.suite.text_pipeline import LANG_MARKERS


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_lang_hits: int = 2,
    min_tokens: int = 20,
    min_uniq_ratio: float = 0.3,
    jaccard_threshold: float = 0.5,
    num_hashes: int = 12,
    bands: int = 4,
    max_avg_neg_logprob: float | None = None,
) -> DataFrame:
    """Returns the curated corpus: one row per KEPT document with
    (doc_id, n_tokens, est_bpe_tokens, kept_reason_mask columns folded in).

    Stages (all deterministic):
      1. language: ≥ min_lang_hits marker-token hits for `lang`,
      2. quality: ≥ min_tokens tokens and unique-token ratio ≥ min_uniq_ratio,
      3. exact dedup: drop rows whose normalized-content hash has a smaller id,
      4. near-dup clustering: MinHash-LSH pairs ≥ threshold → connected
         components → keep only the min-id representative of each cluster,
      5. (optional) LM-perplexity filter: drop documents whose average
         negative log-probability under the corpus's own unigram model
         exceeds ``max_avg_neg_logprob`` (the KenLM-style quality gate of
         public LLM-data pipelines; operators/lm_quality.py).
    """
    # _toks is emitted through a single-element explode: the language/
    # quality/length filters below reference it, and plain-Project aliases
    # get substituted under predicate pushdown — every filter would inline
    # its own copy of the full tokenization (~5 evaluations per row).
    # Predicates on GENERATOR output cannot be pushed below the Generate,
    # so the corpus is tokenized exactly once; explode(array(x)) is one
    # row per row, results unchanged (guide §7.2 duplicated subtrees).
    toked = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(F.array(tokenize(text_col))).alias("_toks"),
    ).filter(F.size("_toks") >= 3)

    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    lang_ok = F.size(F.filter("_toks", lambda t: F.array_contains(markers, t))) >= min_lang_hits

    n_tok = F.size("_toks")
    uniq_ratio = F.size(F.array_distinct("_toks")).cast("double") / n_tok
    quality_ok = (n_tok >= min_tokens) & (uniq_ratio >= min_uniq_ratio)

    base = toked.filter(lang_ok & quality_ok)

    # exact dedup: keep the min id per content hash
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    hashed = base.withColumn("_chash", md5_48(norm))
    keep_exact = hashed.groupBy("_chash").agg(F.min(id_col).alias("_keep"))
    base = (
        hashed.join(keep_exact, "_chash")
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_chash", "_keep")
    )
    # the minhash stages consume `base` several times (shingles, signatures,
    # candidate join, jaccard verify, final anti-join) — materialize the
    # filtered+deduped base once instead of re-deriving it per consumer
    base = base.localCheckpoint()

    # near-dup clustering: drop non-canonical cluster members
    pairs = minhash_dedup_pairs(
        base, id_col, F.col("_toks"), 3, num_hashes, bands, jaccard_threshold
    )
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    kept = base.join(losers, id_col, "left_anti")

    if max_avg_neg_logprob is not None:
        from myscaledb_spark.operators.lm_quality import unigram_logprob_scores

        # the scorer consumes `kept` multiple times (model counts, scoring,
        # final anti-join) — materialize the dedup tail once, same
        # discipline as `base` above
        kept = kept.localCheckpoint()
        scores = unigram_logprob_scores(kept, id_col, text_col)
        bad = scores.filter(
            -F.col("avg_logprob") > F.lit(float(max_avg_neg_logprob))
        ).select(id_col)
        kept = kept.join(bad, id_col, "left_anti")

    bpe = F.aggregate(
        F.transform("_toks", lambda t: F.lit(1) + (F.length(t).cast("long") / F.lit(4)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return kept.select(
        F.col(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        bpe.alias("est_bpe_tokens"),
    )


def curation_stats(curated: DataFrame, total_docs: int) -> DataFrame:
    """One-row corpus accounting: docs kept/dropped + token budget."""
    return curated.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.lit(total_docs).cast("long").alias("n_total"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("est_bpe_tokens").alias("total_bpe_tokens"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    target_shard_bytes: int = 256 << 20,
    byte_cols: list[str] | None = None,
    compression: str = "zstd",
    salt_col: str = "shard_salt",
) -> dict:
    """Pack a curated corpus into size-targeted parquet shards — the final
    stage of a training-data pipeline (balanced shards keep downstream data
    loaders and shuffle readers uniform).

    Sizing is data-driven, not row-count-driven: one aggregate pass sums
    octet_length over `byte_cols` (default: every string/binary column), the
    shard count is ceil(total/target), and a round-robin repartition spreads
    rows evenly regardless of document-length skew. At 100 TB this is one
    cheap column-pruned scan plus the one unavoidable write shuffle; nothing
    is collected to the driver but a single sum.

    Returns {"n_shards", "est_bytes"} for observability.
    """
    import math

    if byte_cols is None:
        byte_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() in ("string", "binary")
        ]
    if not byte_cols:
        raise ValueError("write_training_shards needs at least one byte column")
    size_expr = None
    for c in byte_cols:
        term = F.coalesce(F.octet_length(F.col(c)), F.lit(0)).cast("long")
        size_expr = term if size_expr is None else size_expr + term
    [row] = df.agg(F.sum(size_expr).alias("b")).collect()
    est = int(row.b or 0)
    n_shards = max(1, math.ceil(est / target_shard_bytes))
    (
        df.repartition(n_shards)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(path)
    )
    return {"n_shards": n_shards, "est_bytes": est}
