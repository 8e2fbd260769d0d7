"""Tokenizer table-function (SURVEY 2.11 F1).

The reference registers an IK Chinese-analyzer UDTF and applies it via
LATERAL TABLE to search keywords (app/func/KeywordUDTF.java:13-20,
app/dws/DwsTrafficSourceKeywordPageViewWindow.java:96-102). IK smart-mode
is JVM-only and not bit-reproducible here, so the engine's default tokenizer
is a deterministic split on non-word boundaries — JVM-side (split + explode,
whole-stage codegen), no Python in the hot path. A jieba-based Pandas UDF
can be swapped in where the library exists; it is gated behind an import so
the engine has no hard dependency.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize(col: Column | str, pattern: str = r"\s+") -> Column:
    """Split text into a token array, dropping empties (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, pattern), lambda t: t != F.lit(""))


# GPT-2-style pre-tokenizer pattern: contractions, letter runs, digit runs,
# punctuation runs (each with an optional leading space), whitespace runs.
# Restricted to constructs shared by Java regex (Spark) and RE2 (DuckDB) —
# no lookarounds — so the same string drives both engines bit-identically.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+"


def bpe_tokenize(col: Column | str) -> Column:
    """BPE-ish pre-token array: every non-overlapping match of
    :data:`BPE_PATTERN`, in document order (JVM-side, codegen)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0))


def bpe_token_count(col: Column | str) -> Column:
    """Pre-token count — the standard proxy for LLM token budgets when no
    merges table is available (a real BPE only merges within these
    pre-tokens, so the count is a stable lower bound)."""
    return F.size(bpe_tokenize(col))


def explode_tokens(
    df: DataFrame, text_col: str, out_col: str = "word"
) -> DataFrame:
    """LATERAL TABLE(ik_analyze(x)) equivalent: one row per token."""
    return df.withColumn(out_col, F.explode(tokenize(text_col)))


def jieba_tokenizer():
    """Optional CJK tokenizer as an Arrow-batched Pandas UDF.

    Returns None when jieba is unavailable (it is not shipped in this
    container); callers fall back to :func:`tokenize`.
    """
    try:
        import jieba  # noqa: F401
    except ImportError:
        return None

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def _cut(texts: pd.Series) -> pd.Series:
        import jieba

        return texts.map(lambda t: [w for w in jieba.cut(t or "") if w.strip()])

    return _cut
