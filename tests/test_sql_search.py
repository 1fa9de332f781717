"""sql_search: verbatim SQL forms of textsearch/hybridsearch/batch_distance —
shape routing plus the reference's error rules (one search per query,
mandatory LIMIT, ORDER BY direction, unknown params)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.errors import InvalidSearchQuery
from myscaledb_spark.sql_dialect import ChSqlError, ch_sql


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    docs = spark.createDataFrame(
        [
            (0, "ancient empires rise and fall", [0.0, 0.0, 0.0]),
            (1, "artistic expressions reflect cultures", [1.0, 1.0, 1.0]),
            (2, "ancient philosophies provide wisdom", [2.0, 2.0, 2.0]),
            (3, "strategic military campaigns", [3.0, 3.0, 3.0]),
        ],
        "id long, doc string, vector array<double>",
    )
    docs.createOrReplaceTempView("t_search")
    yield


def test_textsearch_sql_end_to_end(spark):
    out = ch_sql(
        spark,
        "SELECT id, textsearch(doc, 'ancient') AS bm25 FROM t_search "
        "ORDER BY bm25 DESC LIMIT 3",
    )
    rows = out.collect()
    assert out.columns == ["id", "bm25"]
    assert {r["id"] for r in rows} == {0, 2}  # only matching docs
    assert rows[0]["bm25"] >= rows[-1]["bm25"]


def test_textsearch_sql_where_prefilters(spark):
    rows = ch_sql(
        spark,
        "SELECT id, textsearch(doc, 'ancient') AS bm25 FROM t_search "
        "WHERE id < 2 ORDER BY bm25 DESC LIMIT 5",
    ).collect()
    assert [r["id"] for r in rows] == [0]


def test_hybridsearch_sql_matches_operator(spark):
    from myscaledb_spark.operators.hybrid import hybrid_search

    out = ch_sql(
        spark,
        "SELECT id, hybridsearch('fusion_type=rsf')"
        "(vector, doc, [1.0, 1.0, 1.0], 'ancient') AS score "
        "FROM t_search ORDER BY score DESC, id LIMIT 3",
    ).collect()
    want = hybrid_search(
        spark.table("t_search"), "vector", "doc", [1.0, 1.0, 1.0], "ancient",
        3, "id", fusion_type="rsf",
    ).collect()
    assert [(r["id"], r["score"]) for r in out] == [
        (r["id"], r["fusion_score"]) for r in want
    ]


def test_batch_distance_sql_shape(spark):
    out = ch_sql(
        spark,
        "SELECT id, batch_distance(vector, [[0.0, 0.0, 0.0], [3.0, 3.0, 3.0]]) "
        "AS dist FROM t_search ORDER BY dist.1, dist.2 LIMIT 2 BY dist.1",
    )
    rows = out.collect()
    assert out.columns == ["id", "dist"]
    got = [(r["dist"]["q"], r["id"]) for r in rows]
    assert got == [(0, 0), (0, 1), (1, 3), (1, 2)]  # per-query top-2, L2


def test_search_sql_error_rules(spark):
    # one search function per query (reference serverError 62)
    with pytest.raises(ChSqlError, match="one"):
        ch_sql(
            spark,
            "SELECT id, textsearch(doc, 'a') AS b, "
            "hybridsearch('fusion_type=rsf')(vector, doc, [1.0], 'a') AS s "
            "FROM t_search ORDER BY b DESC LIMIT 3",
        )
    with pytest.raises(ChSqlError, match="62"):
        ch_sql(
            spark,
            "SELECT id, textsearch(doc, 'a') AS b, distance(vector, [1.0,1,1]) AS d "
            "FROM t_search ORDER BY b DESC LIMIT 3",
        )
    # LIMIT is mandatory (top-k extracted from LIMIT)
    with pytest.raises(InvalidSearchQuery, match="LIMIT"):
        ch_sql(
            spark,
            "SELECT id, textsearch(doc, 'a') AS b FROM t_search ORDER BY b DESC",
        )
    # score direction must be DESC
    with pytest.raises(InvalidSearchQuery, match="DESC"):
        ch_sql(
            spark,
            "SELECT id, textsearch(doc, 'a') AS b FROM t_search "
            "ORDER BY b ASC LIMIT 3",
        )
    # unknown hybridsearch parameter (reference BAD_ARGUMENTS on dense_alpha)
    with pytest.raises(ChSqlError, match="dense_alpha"):
        ch_sql(
            spark,
            "SELECT id, hybridsearch('dense_alpha=3', 'fusion_type=rsf')"
            "(vector, doc, [1.0, 1.0, 1.0], 'a') AS s "
            "FROM t_search ORDER BY s DESC LIMIT 3",
        )
    # batch_distance needs LIMIT n BY dist.1
    with pytest.raises(InvalidSearchQuery, match="BY"):
        ch_sql(
            spark,
            "SELECT id, batch_distance(vector, [[1.0, 1.0, 1.0]]) AS dist "
            "FROM t_search ORDER BY dist.1, dist.2 LIMIT 3",
        )


def test_search_sql_trailing_settings_stripped(spark):
    # the reference's own tests end in SETTINGS enable_brute_force...=1
    rows = ch_sql(
        spark,
        "SELECT id, textsearch(doc, 'ancient') AS bm25 FROM t_search "
        "ORDER BY bm25 DESC LIMIT 3 SETTINGS enable_brute_force_vector_search=1",
    ).collect()
    assert {r["id"] for r in rows} == {0, 2}


def test_search_sql_rejects_trailing_text_after_limit(spark):
    with pytest.raises(ChSqlError, match="after LIMIT"):
        ch_sql(
            spark,
            "SELECT id, textsearch(doc, 'a') AS b FROM t_search "
            "ORDER BY b DESC LIMIT 3, 4",
        )
    with pytest.raises(ChSqlError, match="after LIMIT"):
        ch_sql(
            spark,
            "SELECT id, textsearch(doc, 'a') AS b FROM t_search "
            "ORDER BY b DESC LIMIT 3 OFFSET 2",
        )
