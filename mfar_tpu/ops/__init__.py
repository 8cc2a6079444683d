from mfar_tpu.ops.scoring import (
    dense_topk_chunked,
    fold_queries,
    fuse_and_mix,
    per_field_candidate_scores,
    softmax_field_weights,
)

__all__ = [
    "dense_topk_chunked",
    "fold_queries",
    "fuse_and_mix",
    "per_field_candidate_scores",
    "softmax_field_weights",
]
