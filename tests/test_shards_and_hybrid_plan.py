"""Training-shard packing sink + hybrid single-scan plan properties."""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.pipelines import write_training_shards

SF = "/root/testdata/sf0.001"


def test_write_training_shards_sizing_and_roundtrip(spark):
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    out = tempfile.mkdtemp(prefix="shards_") + "/corpus"
    # tiny target -> multiple shards even at sf0.001
    info = write_training_shards(docs, out, target_shard_bytes=64 << 10)
    files = glob.glob(out + "/part-*.parquet")
    assert info["n_shards"] >= 2
    assert len(files) == info["n_shards"]
    back = spark.read.parquet(out)
    assert back.count() == n
    # shards are balanced: no file more than 3x the smallest (round-robin)
    import os

    sizes = sorted(os.path.getsize(f) for f in files)
    assert sizes[-1] <= 3 * max(sizes[0], 1)


def test_write_training_shards_single_shard(spark):
    docs = load_table(spark, SF, "documents")
    out = tempfile.mkdtemp(prefix="shards1_") + "/corpus"
    info = write_training_shards(docs, out, target_shard_bytes=1 << 40)
    assert info["n_shards"] == 1


def test_hybrid_fused_plan_reads_no_corpus(spark):
    """After the single-scan refactor, the RETURNED hybrid plan reads only
    the checkpointed k'-row candidate lists: no file scan, no Python eval —
    re-collecting the fusion result never rescans the corpus."""
    from myscaledb_spark.operators.hybrid import hybrid_search

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    corpus = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )
    qvec = [0.1] * 64
    out = hybrid_search(
        corpus, "embedding", "text", qvec, "data systems", 5, "doc_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "Scan parquet" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert out.count() == 5


def test_hybrid_search_auto_routes_through_artifacts(spark, tmp_path):
    """hybrid_search(artifact_dir=...) consults the registry and, when both
    the vector and fts artifacts are Built, serves through the indexed path
    — with exhaustive probing the result equals the default single-scan
    path exactly; a missing artifact falls back silently."""
    from pyspark.sql import functions as F

    from myscaledb_spark.operators.hybrid import hybrid_search
    from myscaledb_spark.plans.fts_index import build_fts_index
    from myscaledb_spark.plans.vector_index import build_ivf_index

    docs = spark.createDataFrame(
        [
            (i, f"{'ancient' if i % 3 == 0 else 'modern'} text number {i}",
             [float(i), float(i % 5), 1.0])
            for i in range(30)
        ],
        "doc_id long, text string, embedding array<double>",
    )
    art = str(tmp_path / "hyb_route")
    build_ivf_index(docs, "embedding", "doc_id", art, name="ivf", num_centroids=4)
    build_fts_index(docs, "text", "doc_id", art, name="fts")

    direct = hybrid_search(
        docs, "embedding", "text", [2.0, 2.0, 1.0], "ancient", 5, "doc_id"
    ).collect()
    routed = hybrid_search(
        docs, "embedding", "text", [2.0, 2.0, 1.0], "ancient", 5, "doc_id",
        artifact_dir=art, nprobe=4,  # exhaustive: 4 of 4 centroids
    ).collect()
    assert [(r["doc_id"], round(r["fusion_score"], 9)) for r in routed] == [
        (r["doc_id"], round(r["fusion_score"], 9)) for r in direct
    ]
    # unbuilt artifact name → silent fallback to the single-scan path
    fallback = hybrid_search(
        docs, "embedding", "text", [2.0, 2.0, 1.0], "ancient", 5, "doc_id",
        artifact_dir=art, index_name="nope",
    ).collect()
    assert [(r["doc_id"], round(r["fusion_score"], 9)) for r in fallback] == [
        (r["doc_id"], round(r["fusion_score"], 9)) for r in direct
    ]
