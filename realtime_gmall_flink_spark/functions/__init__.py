from .tokenize import tokenize, explode_tokens
from .textstats import (
    token_count,
    normalized_text,
    doc_fingerprint,
    quality_score,
    language_scores,
    predict_language,
)
from .sketches import word_shingles, minhash_hex
from .similarity import cosine_similarity, dot_product, l2_norm

__all__ = [
    "tokenize",
    "explode_tokens",
    "token_count",
    "normalized_text",
    "doc_fingerprint",
    "quality_score",
    "language_scores",
    "predict_language",
    "word_shingles",
    "minhash_hex",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
