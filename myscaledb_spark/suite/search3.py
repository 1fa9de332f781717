"""Round-5 search-path gates: the GEMM batch_distance execution shape, IVF
incremental maintenance (decoupled-parts analog), and index-auto-routed
text_search — each pinned to the same exact oracles as its brute-force twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register
from myscaledb_spark.suite.artifact_cache import cached_artifact
from myscaledb_spark.suite.search import (
    QTEXT,
    QV,
    QV2,
    QV3,
    _bm25_oracle_sql,
    sql_l2,
    sql_qvec,
)


@register(
    "batch_distance_gemm",
    f"""
    WITH q AS (
      SELECT * FROM (VALUES (0, {sql_qvec(QV)}), (1, {sql_qvec(QV2)}), (2, {sql_qvec(QV3)}))
      AS t(query_id, qv)
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             sqrt(list_reduce(list_transform(range(1, len(e.embedding)+1),
               i -> (CAST(e.embedding[i] AS DOUBLE) - qv[i]) * (CAST(e.embedding[i] AS DOUBLE) - qv[i])),
               (a, b) -> a + b)) AS d
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, ROUND(d, 4) AS dist
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d ASC, vec_id ASC) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def batch_distance_gemm(spark, sf_dir):
    """batch_distance via the blocked-GEMM mapInPandas path
    (`operators/topk.py batch_vector_topk_large`) — the nq≫100 scale shape
    (reference suite 3 sweeps nq to 10k, benchmark.py:72-79). Same query set
    and the SAME oracle as the explode-path `batch_distance_l2`, proving
    GEMM ≡ explode at 4-decimal rounding (the kernel uses the
    x²+q²-2xy factorization; association differs only at ~1e-12)."""
    from myscaledb_spark.operators.topk import batch_vector_topk_large

    emb = load_table(spark, sf_dir, "embeddings")
    out = batch_vector_topk_large(
        emb, "embedding", [QV, QV2, QV3], 5, "L2", id_col="vec_id"
    )
    return out.select(
        F.col("query_id").cast("int").alias("query_id"),
        "vec_id",
        F.round("dist", 4).alias("dist"),
    )


@register(
    "ivf_append_search",
    f"""
    SELECT vec_id, ROUND({sql_l2('embedding', QV2)}, 4) AS dist
    FROM embeddings
    ORDER BY {sql_l2('embedding', QV2)} ASC, vec_id ASC
    LIMIT 12
    """,
)
def ivf_append_search(spark, sf_dir):
    """Decoupled-parts analog (MergeTreeSettings.h:179
    enable_decouple_vector_index): the IVF artifact is built on HALF the
    corpus (vec_id % 2 = 0), the other half is APPENDED via
    `append_to_ivf_index` (assignment against the frozen centroids — the
    reference's freshly-inserted-part path), and the post-append search with
    exhaustive probing (nprobe = ncentroids) must equal brute force over the
    FULL corpus — the same exact-mode oracle trick as the other index gates,
    here proving the appended rows are genuinely searchable."""
    from myscaledb_spark.plans.vector_index import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")

    def _build(art: str) -> None:
        build_ivf_index(
            emb.filter(F.col("vec_id") % 2 == 0), "embedding", "vec_id", art,
            name="ivf", num_centroids=8,
        )
        append_to_ivf_index(
            emb.filter(F.col("vec_id") % 2 == 1), "embedding", "vec_id", art,
            name="ivf",
        )

    art = cached_artifact(sf_dir, "ivf_append", _build)
    out = ivf_search(
        spark, art, QV2, 12, name="ivf", nprobe=8, metric="L2",
        id_col="vec_id", vec_col="embedding",
    )
    return out.select("vec_id", F.round("dist", 4).alias("dist"))


@register(
    "text_search_routed", _bm25_oracle_sql(["vector", "search", "fast"], 15)
)
def text_search_routed(spark, sf_dir):
    """`text_search` with automatic index routing (r4 VERDICT stretch #10):
    the SAME call as bm25_topk, plus artifact_dir — the function consults
    the registry, finds the built postings index, and serves the query from
    term-pruned postings + a broadcast row-recovery join instead of
    tokenizing the corpus (the reference uses the tantivy index
    transparently once built). Same oracle as bm25_topk because indexed
    scores are bit-identical to direct scores by construction."""
    from myscaledb_spark.functions.text import text_search
    from myscaledb_spark.plans.fts_index import build_fts_index

    docs = load_table(spark, sf_dir, "documents")

    def _build(art: str) -> None:
        build_fts_index(docs, "text", "doc_id", art, name="fts")

    art = cached_artifact(sf_dir, "fts_route", _build)
    out = text_search(
        docs, "text", QTEXT, 15, id_col="doc_id", artifact_dir=art
    )
    return out.select("doc_id", F.round("bm25_score", 4).alias("bm25_score"))
