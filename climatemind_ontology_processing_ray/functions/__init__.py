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
    dup_clusters,
)
from .join import bucketed_anti_join, bucketed_hash_join, bucketed_semi_join
from .search import term_doc_frequencies, tfidf_topk
from .bloom import bloom_contains, build_bloom, incremental_new
from .agg import grouped_sum
from .sample import deterministic_sample, stratified_sample
from .windows import tumbling_window, sliding_window, sessionize, ntile
from .ann import brute_force_topk, lsh_topk, ivf_topk, train_ivf_centroids
from .graph_algo import degree_stats, distinct_edges, pagerank_fixed
from .sketch import (
    approx_distinct,
    exact_quantiles,
    exact_quantiles_cont,
    heavy_hitters,
)
from .text import inverted_index
from .codecs import decode_image, decode_png, decode_ppm, encode_png, encode_ppm

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
    "dup_clusters",
    "bucketed_hash_join",
    "bucketed_semi_join",
    "bucketed_anti_join",
    "tfidf_topk",
    "term_doc_frequencies",
    "build_bloom",
    "bloom_contains",
    "incremental_new",
    "grouped_sum",
    "deterministic_sample",
    "stratified_sample",
    "tumbling_window",
    "sliding_window",
    "sessionize",
    "degree_stats",
    "distinct_edges",
    "pagerank_fixed",
    "approx_distinct",
    "exact_quantiles",
    "exact_quantiles_cont",
    "heavy_hitters",
    "inverted_index",
    "ntile",
    "decode_image",
    "decode_png",
    "decode_ppm",
    "encode_png",
    "encode_ppm",
]
