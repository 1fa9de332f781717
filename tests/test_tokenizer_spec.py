"""Tokenizer config parity — the reference's per-column fts('{...}') JSON
(MergeTreeIndexTantivy.cpp:710-751; test
02888_tantivy_text_search_multi_col.sql:37)."""

from __future__ import annotations

import pytest

from myscaledb_spark.errors import InvalidSearchQuery
from myscaledb_spark.functions.tokenizer_spec import (
    STOP_WORD_FILTERS,
    TokenizerSpec,
    parse_fts_config,
)

REF_CONFIG = (
    '{ "col1": { "tokenizer": { "type": "stem", '
    '"stop_word_filters": ["english", "french"], '
    '"stem_languages": ["german", "english"], "length_limit": 60} }, '
    '"col2": { "tokenizer": {"type": "simple"} } }'
)


def test_parse_reference_config_shape():
    specs = parse_fts_config(REF_CONFIG)
    assert set(specs) == {"col1", "col2"}
    s1 = specs["col1"]
    assert s1.type == "stem"
    assert s1.stop_word_filters == ("english", "french")
    assert s1.stem_languages == ("german", "english")
    assert s1.length_limit == 60
    assert specs["col2"] == TokenizerSpec(type="simple")


def test_stop_word_union_order_preserving():
    s = parse_fts_config(REF_CONFIG)["col1"]
    words = s.stop_words()
    assert len(words) == len(set(words))
    assert set(STOP_WORD_FILTERS["english"]) <= set(words)
    assert set(STOP_WORD_FILTERS["french"]) <= set(words)
    # english listed first → its words lead
    assert words[0] == STOP_WORD_FILTERS["english"][0]


def test_stem_patterns_per_language_order():
    s = parse_fts_config(REF_CONFIG)["col1"]
    pats = s.stem_patterns()
    assert len(pats) == 2  # german then english, as listed
    assert "ung" in pats[0] and "ing" in pats[1]
    # bare stem type defaults to english
    assert TokenizerSpec(type="stem").stem_patterns() == [
        TokenizerSpec(type="stem", stem_languages=("english",)).stem_patterns()[0]
    ]
    # simple type, no stem languages → no stemming
    assert TokenizerSpec(type="simple").stem_patterns() == []


def test_invalid_configs_raise():
    with pytest.raises(InvalidSearchQuery):
        parse_fts_config("{not json")
    with pytest.raises(InvalidSearchQuery):
        parse_fts_config('{"c": {"no_tokenizer": {}}}')
    with pytest.raises(InvalidSearchQuery):
        TokenizerSpec(type="bogus")
    with pytest.raises(InvalidSearchQuery):
        TokenizerSpec(stop_word_filters=("klingon",))
    with pytest.raises(InvalidSearchQuery):
        TokenizerSpec(stem_languages=("klingon",))


def test_query_and_column_analyzers_agree(spark):
    """Document and query sides must normalize into the same token space:
    stop words removed, multi-language stems applied, chain order
    split → length_limit → stop → stem on both."""
    from pyspark.sql import functions as F

    from myscaledb_spark.functions.text import tokenize, tokenize_query

    spec = parse_fts_config(
        '{ "t": { "tokenizer": { "type": "stem", '
        '"stop_word_filters": ["english"], '
        '"stem_languages": ["english", "german"], "length_limit": 10 } } }'
    )["t"]
    text = "the Searching Vectors straightforwardly fast"
    df = spark.createDataFrame([(text,)], "t string")
    col_toks = df.select(tokenize("t", spec=spec).alias("toks")).first().toks
    q_toks = tokenize_query(text, spec=spec)
    # 'the' is a stop word; the >10-char token is length-limited out;
    # searching→search, vectors→vector (english), then german pass
    assert col_toks == ["search", "vector", "fast"]
    assert q_toks == ["search", "vector", "fast"]

    # german stemming actually fires: 'wohnungen' → 'wohn'
    g = parse_fts_config(
        '{ "t": { "tokenizer": { "type": "stem", "stem_languages": ["german"] } } }'
    )["t"]
    df2 = spark.createDataFrame([("Wohnungen Bücher",)], "t string")
    toks2 = df2.select(tokenize("t", spec=g).alias("toks")).first().toks
    assert toks2 == tokenize_query("Wohnungen Bücher", spec=g)
    assert toks2[0] == "wohn"
