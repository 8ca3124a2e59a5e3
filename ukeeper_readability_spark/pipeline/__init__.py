from .dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash,
)
from .multimodal import media_features, synthesize_media
from .similarity import (
    cosine_topk_bruteforce,
    cosine_topk_bucketed,
    embedding_near_duplicates,
)
from .text_analysis import fingerprint, language_id, quality_score, token_counts

__all__ = [
    "exact_duplicates",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard",
    "simhash",
    "media_features",
    "synthesize_media",
    "cosine_topk_bruteforce",
    "embedding_near_duplicates",
    "cosine_topk_bucketed",
    "fingerprint",
    "language_id",
    "quality_score",
    "token_counts",
]
