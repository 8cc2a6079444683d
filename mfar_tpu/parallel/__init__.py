from mfar_tpu.parallel.mesh import make_mesh, pad_rows, shard_array
from mfar_tpu.parallel.topk import (
    distributed_candidate_scores,
    distributed_dense_topk,
)

__all__ = [
    "make_mesh",
    "pad_rows",
    "shard_array",
    "distributed_dense_topk",
    "distributed_candidate_scores",
]
