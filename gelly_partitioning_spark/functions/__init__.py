from .dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    token_jaccard_pairs,
)
from .multimodal import attach_media, extract_features, frame_sample_plan
from .similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_near_duplicates,
    ivf_topk,
    with_unit_vectors,
)
from .text import fingerprint, language_id, quality_score, token_count

__all__ = [
    "exact_duplicates",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "token_jaccard_pairs",
    "attach_media",
    "extract_features",
    "frame_sample_plan",
    "ann_lsh_topk",
    "cosine_topk",
    "embedding_near_duplicates",
    "ivf_topk",
    "with_unit_vectors",
    "fingerprint",
    "language_id",
    "quality_score",
    "token_count",
]
