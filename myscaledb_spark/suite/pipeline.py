"""The full curation pipeline through the driver gate — its oracle composes
the (already individually proven) stage oracles into one WITH-chain."""

from __future__ import annotations

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register
from myscaledb_spark.suite.dedup import BANDS, NUM_HASHES, ROWS, _sql_md5_48
from myscaledb_spark.suite.text_pipeline import LANG_MARKERS

SQL_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_EN = "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS["en"]) + "]"
_NORM_HASH = _sql_md5_48("lower(regexp_replace(text, '\\s+', ' ', 'g'))")


def _pipeline_ctes() -> str:
    mins = ", ".join(
        "MIN(" + _sql_md5_48("'%d:' || sh" % s) + ") AS mh%d" % s
        for s in range(NUM_HASHES)
    )
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, %d AS band, %s AS band_key FROM sig"
        % (b, " || ',' || ".join("CAST(mh%d AS VARCHAR)" % (b * ROWS + r) for r in range(ROWS)))
        for b in range(BANDS)
    )
    return f"""
    toked AS (
      SELECT doc_id, text, {SQL_TOKS} AS toks FROM documents
    ),
    base0 AS (
      SELECT doc_id, text, toks FROM toked
      WHERE len(toks) >= 3
        AND len(list_filter(toks, t -> list_contains({_EN}, t))) >= 2
        AND len(toks) >= 20
        AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3
    ),
    hashed AS (
      SELECT *, {_NORM_HASH} AS chash
      FROM base0
    ),
    base AS (
      SELECT h.doc_id, h.toks FROM hashed h
      JOIN (SELECT chash, MIN(doc_id) AS keep FROM hashed GROUP BY chash) k
        ON h.chash = k.chash AND h.doc_id = k.keep
    ),
    sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
      FROM base, UNNEST(range(1, len(toks)-1)) t(i)
    ),
    sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    banded AS ({band_rows}),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS i
      FROM cands c
      JOIN sh s1 ON s1.doc_id = c.id_a
      JOIN sh s2 ON s2.doc_id = c.id_b AND s2.sh = s1.sh
      GROUP BY c.id_a, c.id_b
    ),
    dup_pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.5
    ),
    e AS (
      SELECT id_a AS a, id_b AS b FROM dup_pairs
      UNION ALL SELECT id_b, id_a FROM dup_pairs
    ),
    reach(id, r) AS (
      SELECT DISTINCT a, a FROM e
      UNION
      SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id
    ),
    losers AS (
      SELECT id AS doc_id FROM (SELECT id, MIN(r) AS cid FROM reach GROUP BY id)
      WHERE id <> cid
    ),
    kept AS (
      SELECT base.doc_id, toks FROM base
      WHERE base.doc_id NOT IN (SELECT doc_id FROM losers)
    ),
    curated AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             CAST(list_aggregate(list_transform(toks, t -> 1 + (length(t) // 4)), 'sum') AS BIGINT) AS est_bpe_tokens
      FROM kept
    )
    """


@register(
    "curation_pipeline",
    f"WITH RECURSIVE {_pipeline_ctes()} SELECT doc_id, n_tokens, est_bpe_tokens FROM curated",
)
def curation_pipeline(spark, sf_dir):
    from myscaledb_spark.pipelines import curate_documents

    docs = load_table(spark, sf_dir, "documents")
    return curate_documents(docs)


@register(
    "curation_stats",
    f"""
    WITH RECURSIVE {_pipeline_ctes()}
    SELECT COUNT(*) AS n_kept,
           (SELECT COUNT(*) FROM documents) AS n_total,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(est_bpe_tokens) AS BIGINT) AS total_bpe_tokens
    FROM curated
    """,
)
def curation_stats_q(spark, sf_dir):
    from myscaledb_spark.pipelines import curate_documents, curation_stats

    docs = load_table(spark, sf_dir, "documents")
    return curation_stats(curate_documents(docs), docs.count())
