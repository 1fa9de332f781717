"""Forward-maximum-matching (FMM) Chinese tokenizer.

Reference parity: tantivy's `chinese` tokenizer config
(`src/Storages/MergeTree/MergeTreeIndexTantivy.cpp:710-751`). jieba is not in
the container, so segmentation is FMM over the vendored frozen dictionary
(`zh_dict.py`): at each CJK position take the longest dictionary word
(up to ZH_MAX_LEN), else emit the single char. Latin/digit runs stay whole
words (lowercased); everything else is a separator.

Scale design: tokenization is the one text op that genuinely needs Python —
it runs as an Arrow-batched pandas_udf (never row-at-a-time), and the
dictionary is a module-level frozenset shipped once per executor via the
cloudpickle closure, not per row.
"""

from __future__ import annotations

from pyspark.sql import Column

from myscaledb_spark.functions.zh_dict import ZH_MAX_LEN, ZH_WORDS


def _is_cjk(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def fmm_tokenize(text: str | None) -> list[str] | None:
    """Segment mixed CJK/latin text: FMM for CJK runs, whole lowercased
    alnum runs for latin, everything else separates."""
    if text is None:
        return None
    text = text.lower()
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if _is_cjk(ch):
            for length in range(min(ZH_MAX_LEN, n - i), 1, -1):
                cand = text[i : i + length]
                if cand in ZH_WORDS:
                    out.append(cand)
                    i += length
                    break
            else:
                out.append(ch)
                i += 1
        elif ch.isascii() and ch.isalnum():
            j = i + 1
            while j < n and text[j].isascii() and text[j].isalnum():
                j += 1
            out.append(text[i:j])
            i = j
        else:
            i += 1
    return out


_UDF = None


def fmm_tokenize_col(col: Column) -> Column:
    """Arrow-batched column form of :func:`fmm_tokenize`."""
    global _UDF
    if _UDF is None:
        import pandas as pd  # noqa: F401
        from pyspark.sql import functions as F

        @F.pandas_udf("array<string>")
        def _zh_fmm(s):  # type: ignore[no-untyped-def]
            return s.map(fmm_tokenize)

        _UDF = _zh_fmm
    return _UDF(col)
