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

import pandas as pd  # module-level: pandas_udf type hints resolve here
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


# --- real BPE merge folding -------------------------------------------------
# A GPT-2-format merges table upgrades the pre-token proxy to an exact
# token count FOR THE SHIPPED TABLE: within each pre-token, the
# highest-ranked adjacent symbol pair merges repeatedly until no pair is
# in the table (the standard BPE apply loop). The shipped table is a
# small character-level one (data/bpe_merges.txt) — same file format as
# any published merges.txt, so a real GPT-2 table drops in unchanged.
# The fold is inherently iterative per token, so it runs as an
# Arrow-batched Pandas UDF with the rank map broadcast and a per-batch
# token cache (natural-language batches repeat tokens heavily); the
# pre-token proxy stays the default everywhere else.
_MERGES_FILE = __file__.rsplit("/", 1)[0] + "/data/bpe_merges.txt"


def load_merges(path: str | None = None) -> list[tuple[str, str]]:
    """Parse a GPT-2-format merges.txt: optional ``#``-comment header,
    one space-separated symbol pair per line, rank = line order."""
    pairs: list[tuple[str, str]] = []
    with open(path or _MERGES_FILE, encoding="utf-8") as f:
        for ln in f:
            ln = ln.rstrip("\n")
            if not ln or ln.startswith("#"):
                continue
            a, b = ln.split(" ")
            pairs.append((a, b))
    return pairs


def bpe_apply(token: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """The BPE apply loop for one pre-token: start from characters,
    repeatedly merge the lowest-rank adjacent pair present in the table.
    Pure Python (shared by the Pandas UDF and the test fixtures)."""
    symbols = list(token)
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (symbols[best_i], symbols[best_i + 1])
        merged = pair[0] + pair[1]
        out = []
        i = 0
        while i < len(symbols):
            if (
                i < len(symbols) - 1
                and (symbols[i], symbols[i + 1]) == pair
            ):
                out.append(merged)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def bpe_exact_count_udf(spark, merges: list[tuple[str, str]] | None = None):
    """Arrow-batched exact BPE token counter (int column): pre-tokenize
    with :data:`BPE_PATTERN`, fold merges within each pre-token, count
    the resulting symbols. The rank map is broadcast once; a per-batch
    cache collapses repeated tokens."""
    import re

    from pyspark.sql.functions import pandas_udf

    ranks = {
        p: i for i, p in enumerate(merges or load_merges())
    }
    bc = spark.sparkContext.broadcast(ranks)
    pat = re.compile(BPE_PATTERN)

    @pandas_udf("int")
    def _count(texts: pd.Series) -> pd.Series:
        r = bc.value
        cache: dict[str, int] = {}

        def count(t: str | None) -> int:
            total = 0
            for tok in pat.findall(t or ""):
                n = cache.get(tok)
                if n is None:
                    n = len(bpe_apply(tok, r))
                    cache[tok] = n
                total += n
            return total

        return texts.map(count)

    return _count


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
