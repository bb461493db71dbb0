from .aggregate import gold_booking_aggregation
from .dedup import (
    cluster_pairs,
    drop_exact_dups,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from .derive import derive
from .lookup import lookup_latest
from .merge import latest_per_key, merge_dataframes
from .multimodal import (
    as_media,
    decode_features,
    decode_media,
    extract_features,
    sample_frames,
)
from .project import select_map
from .similarity import (
    brute_force_topk,
    cosine,
    cosine_pairs,
    dot,
    l2_norm,
    lsh_bucket,
    lsh_topk,
    numpy_topk,
)
from .split import conditional_split
from .windows import topk_per_group

__all__ = [
    "as_media",
    "brute_force_topk",
    "conditional_split",
    "cosine",
    "cosine_pairs",
    "decode_features",
    "decode_media",
    "derive",
    "dot",
    "drop_exact_dups",
    "cluster_pairs",
    "exact_dedup",
    "extract_features",
    "gold_booking_aggregation",
    "l2_norm",
    "latest_per_key",
    "lookup_latest",
    "lsh_bucket",
    "lsh_topk",
    "merge_dataframes",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "numpy_topk",
    "sample_frames",
    "select_map",
    "simhash",
    "simhash_pairs",
    "topk_per_group",
]
