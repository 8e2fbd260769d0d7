"""Text-analysis functions for the LLM-data-pipeline surface.

All JVM-side column expressions (no Python UDFs): language-ID by stopword
n-gram scoring, quality scoring from length/token statistics, token
counting, and md5 document fingerprinting over normalized text. Each has an
exactly-equivalent ANSI-SQL form used by the DuckDB oracles in
plans.catalog, so the operators are correctness-gated.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokenize import tokenize

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and shared verbatim with the SQL oracle.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "les", "des", "et", "un"),
}


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def normalized_text(col: Column | str) -> Column:
    """Lowercase, collapse all non-alphanumeric runs to single spaces, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def doc_fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text (16-byte key — at
    scale, dedup shuffles digests, not documents)."""
    return F.md5(normalized_text(col))


def quality_score(text_col: Column | str) -> Column:
    """Heuristic quality in [0,1]: token volume + average word length band.

    score = 0.6 * min(1, tokens/50) + 0.4 * (1 if 3<=avg_word_len<=9 else 0),
    rounded to 4 decimals. Mirrors the shape of public pretraining-data
    quality filters (length + word-shape heuristics).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = token_count(c).cast("double")
    # length(text) - (tokens - 1) spaces = total word chars (single-spaced).
    word_chars = F.length(c).cast("double") - (toks - F.lit(1.0))
    avg_len = F.when(toks > 0, word_chars / toks).otherwise(F.lit(0.0))
    band = F.when((avg_len >= 3.0) & (avg_len <= 9.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    vol = F.least(F.lit(1.0), toks / F.lit(50.0))
    return F.round(F.lit(0.6) * vol + F.lit(0.4) * band, 4)


def language_scores(text_col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts over the token array."""
    arr = tokenize(
        F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    )
    out: dict[str, Column] = {}
    for lang, words in LANG_STOPWORDS.items():
        out[lang] = F.size(
            F.filter(arr, lambda t: t.isin(*words))  # noqa: B023
        )
    return out


def predict_language(text_col: Column | str) -> Column:
    """Argmax language with deterministic tie-break by the declared order
    of LANG_STOPWORDS; 'und' when no stopword hits at all."""
    scores = language_scores(text_col)
    # Fold left; strict '>' keeps the earliest language on ties.
    expr_best = None
    expr_score = None
    for lang in scores:
        s = scores[lang]
        if expr_best is None:
            expr_best, expr_score = F.lit(lang), s
        else:
            take_new = s > expr_score
            expr_best = F.when(take_new, F.lit(lang)).otherwise(expr_best)
            expr_score = F.when(take_new, s).otherwise(expr_score)
    return F.when(expr_score > 0, expr_best).otherwise(F.lit("und"))
