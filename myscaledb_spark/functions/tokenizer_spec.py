"""Per-column FTS tokenizer configuration — parity with the reference's
tantivy index spec (`MergeTreeIndexTantivy.cpp:710-751`, test
`02888_tantivy_text_search_multi_col.sql:37`):

    fts('{ "col1": { "tokenizer": { "type": "stem",
                                    "stop_word_filters": ["english", "french"],
                                    "stem_languages": ["german", "english"],
                                    "length_limit": 60 } },
           "col2": { "tokenizer": { "type": "simple" } } }')

This module parses that exact JSON shape into :class:`TokenizerSpec` records
and resolves named stop-word filters / stem languages into the concrete
column expressions `functions.text.tokenize` applies.  The filter chain
follows tantivy's analyzer order: lowercase+split → length limit →
stop-word removal → stemming.

Stemming is the same suffix-strip ("porter-lite") approach the English path
used in rounds 1-2, generalized per language: a single anchored alternation
regex per language, longest suffix first, applied once.  It is intentionally
NOT a full snowball implementation — deterministic, JVM-regex-only (stays in
whole-stage codegen) and reproducible in the DuckDB oracle with the same
pattern, which is what the correctness gate needs.

Stop-word lists are compact subsets of the classic public snowball lists —
enough to pin the config surface and the filter semantics; swapping in the
full lists is a data change, not a code change.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from myscaledb_spark.errors import InvalidSearchQuery

# Named stop-word filters (reference: tantivy's per-language stop-word
# filters selected by name). Subsets of the public snowball lists.
STOP_WORD_FILTERS: dict[str, tuple[str, ...]] = {
    "english": (
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
        "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
        "such", "that", "the", "their", "then", "there", "these", "they",
        "this", "to", "was", "will", "with",
    ),
    "french": (
        "au", "aux", "avec", "ce", "ces", "dans", "de", "des", "du",
        "elle", "en", "et", "eux", "il", "je", "la", "le", "les", "leur",
        "lui", "ma", "mais", "me", "même", "mes", "moi", "mon", "ne",
        "nos", "notre", "nous", "on", "ou", "par", "pas", "pour", "qu",
        "que", "qui", "sa", "se", "ses", "son", "sur", "ta", "te", "tes",
        "toi", "ton", "tu", "un", "une", "vos", "votre", "vous",
    ),
    "german": (
        "aber", "alle", "als", "also", "am", "an", "auch", "auf", "aus",
        "bei", "bin", "bis", "bist", "da", "damit", "dann", "das", "dass",
        "dein", "dem", "den", "der", "des", "die", "doch", "dort", "du",
        "durch", "ein", "eine", "einem", "einen", "einer", "eines", "er",
        "es", "für", "hab", "habe", "hat", "hier", "ich", "ihr", "im",
        "in", "ist", "ja", "kann", "mein", "mit", "nach", "nicht", "noch",
        "nur", "oder", "sein", "sich", "sie", "sind", "so", "über", "um",
        "und", "uns", "von", "vor", "war", "was", "weiter", "wenn", "wie",
        "wir", "zu", "zum", "zur",
    ),
    "spanish": (
        "a", "al", "algo", "como", "con", "de", "del", "donde", "el",
        "ella", "ellas", "ellos", "en", "era", "es", "esa", "ese", "eso",
        "esta", "este", "esto", "fue", "ha", "hay", "la", "las", "le",
        "les", "lo", "los", "me", "mi", "muy", "más", "ni", "no", "nos",
        "o", "para", "pero", "por", "que", "se", "ser", "si", "sin",
        "sobre", "su", "sus", "te", "tu", "un", "una", "uno", "y", "ya",
    ),
}

# Anchored suffix-strip alternations, longest-first (regex alternation is
# leftmost-longest-listed in both Java regex and DuckDB RE2 when ordered
# explicitly, so the same pattern behaves identically on both sides).
STEM_SUFFIX_RULES: dict[str, str] = {
    "english": "(ing|edly|ed|es|s)$",
    "french": "(issements|issement|ements|ement|euses|euse|ives|ive|eaux|aux|es|s)$",
    "german": "(ungen|ung|keiten|keit|heiten|heit|ern|eren|en|er|es|e|n|s)$",
    "spanish": "(amientos|amiento|aciones|acion|adoras|adora|ismos|ismo|anzas|anza|es|s)$",
}


@dataclass(frozen=True)
class TokenizerSpec:
    """One column's tokenizer config (the reference's `"tokenizer": {...}`)."""

    type: str = "simple"
    stop_word_filters: tuple[str, ...] = ()
    stem_languages: tuple[str, ...] = ()
    length_limit: int | None = None
    extra: dict = field(default_factory=dict, compare=False)

    def __post_init__(self) -> None:
        if self.type not in ("raw", "simple", "stem", "chinese", "chinese_char"):
            raise InvalidSearchQuery(f"unknown tokenizer type {self.type!r}")
        for f in self.stop_word_filters:
            if f not in STOP_WORD_FILTERS:
                raise InvalidSearchQuery(
                    f"unknown stop_word_filter {f!r} "
                    f"(available: {sorted(STOP_WORD_FILTERS)})"
                )
        for lang in self.stem_languages:
            if lang not in STEM_SUFFIX_RULES:
                raise InvalidSearchQuery(
                    f"unknown stem_language {lang!r} "
                    f"(available: {sorted(STEM_SUFFIX_RULES)})"
                )

    def stop_words(self) -> list[str]:
        """Union of the named lists, order-preserving, deduped."""
        seen: dict[str, None] = {}
        for f in self.stop_word_filters:
            for w in STOP_WORD_FILTERS[f]:
                seen.setdefault(w)
        return list(seen)

    def stem_patterns(self) -> list[str]:
        """One anchored regex per stem language, applied in listed order.
        type='stem' with no explicit languages keeps the round-1 English
        default."""
        langs = self.stem_languages or (
            ("english",) if self.type == "stem" else ()
        )
        return [STEM_SUFFIX_RULES[lang] for lang in langs]


def parse_tokenizer(obj: dict) -> TokenizerSpec:
    """`{"type": ..., "stop_word_filters": [...], "stem_languages": [...],
    "length_limit": N}` → TokenizerSpec."""
    known = {"type", "stop_word_filters", "stem_languages", "length_limit"}
    return TokenizerSpec(
        type=obj.get("type", "simple"),
        stop_word_filters=tuple(obj.get("stop_word_filters", ())),
        stem_languages=tuple(obj.get("stem_languages", ())),
        length_limit=obj.get("length_limit"),
        extra={k: v for k, v in obj.items() if k not in known},
    )


def parse_fts_config(config: str | dict) -> dict[str, TokenizerSpec]:
    """Parse the reference's per-column fts('{...}') JSON into a
    column → TokenizerSpec map. Accepts the JSON string exactly as it
    appears in the DDL, or an already-parsed dict."""
    if isinstance(config, str):
        try:
            config = json.loads(config)
        except json.JSONDecodeError as e:
            raise InvalidSearchQuery(f"invalid fts config JSON: {e}") from e
    if not isinstance(config, dict):
        raise InvalidSearchQuery("fts config must be a JSON object")
    out: dict[str, TokenizerSpec] = {}
    for col, cfg in config.items():
        if not isinstance(cfg, dict) or "tokenizer" not in cfg:
            raise InvalidSearchQuery(
                f"fts config for column {col!r} needs a 'tokenizer' object"
            )
        out[col] = parse_tokenizer(cfg["tokenizer"])
    return out
