from .normalize import (
    normalize_entity_text,
    normalize_entity_text_sql,
    address_key,
    address_key_sql,
    address_score,
    address_score_sql,
    confidence_bin,
)
from .textstats import (
    token_count,
    token_count_sql,
    quality_stats,
    quality_stats_sql,
    lang_id_guess,
    doc_fingerprint,
    doc_fingerprint_sql,
)

__all__ = [
    "normalize_entity_text", "normalize_entity_text_sql",
    "address_key", "address_key_sql",
    "address_score", "address_score_sql",
    "confidence_bin",
    "token_count", "token_count_sql",
    "quality_stats", "quality_stats_sql",
    "lang_id_guess",
    "doc_fingerprint", "doc_fingerprint_sql",
]
