from .dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash,
)
from .multimodal import media_features, synthesize_media
from .similarity import (
    ann_recall_vs_bruteforce,
    cosine_topk_bruteforce,
    cosine_topk_bucketed,
    cosine_topk_ivf_kmeans,
    cosine_topk_ivf_lsh,
    embedding_dropped_buckets,
    embedding_near_duplicates,
    kmeans_fit,
    probe_centroids,
    with_hyperplane_bucket,
    with_kmeans_bucket,
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
    "embedding_dropped_buckets",
    "probe_centroids",
    "cosine_topk_bucketed",
    "cosine_topk_ivf_lsh",
    "cosine_topk_ivf_kmeans",
    "kmeans_fit",
    "with_hyperplane_bucket",
    "with_kmeans_bucket",
    "ann_recall_vs_bruteforce",
    "fingerprint",
    "language_id",
    "quality_score",
    "token_counts",
]
