from .text import (
    TextQualityScorer,
    add_fingerprints,
    add_token_counts,
    LangIdScorer,
)
from .dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
    embedding_neardup_pairs,
)
from .ann import brute_force_topk, lsh_topk, ivf_topk, train_ivf_centroids

__all__ = [
    "TextQualityScorer",
    "add_fingerprints",
    "add_token_counts",
    "LangIdScorer",
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_buckets",
    "embedding_neardup_pairs",
    "brute_force_topk",
    "lsh_topk",
    "ivf_topk",
    "train_ivf_centroids",
]
