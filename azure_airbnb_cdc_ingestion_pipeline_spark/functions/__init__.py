from .semistructured import json_get, parse_json
from .splits import split_bucket, stable_split
from .text import (
    bpe_ish_tokens,
    detect_language,
    fingerprint,
    lit_array,
    normalize_text,
    quality_score,
    shingle_hashes,
    shingles,
    stopword_count,
    token_count,
    tokens,
)

__all__ = [
    "bpe_ish_tokens",
    "detect_language",
    "fingerprint",
    "json_get",
    "lit_array",
    "normalize_text",
    "parse_json",
    "quality_score",
    "shingle_hashes",
    "shingles",
    "split_bucket",
    "stable_split",
    "stopword_count",
    "token_count",
    "tokens",
]
