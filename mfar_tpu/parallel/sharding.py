"""Parameter sharding rules: tensor parallelism by parameter path.

The reference replicates the full model on every GPU (DDP only, SURVEY.md
section 2.2).  Here encoder parameters shard over the ``model`` mesh axis
Megatron-style -- QKV and MLP-in kernels column-sharded, attention-out and
MLP-out row-sharded, embeddings vocab-sharded -- declared as path-pattern
rules on the parameter pytree.  GSPMD propagates the shardings through the
forward/backward and inserts the ICI collectives; the model definition stays
mesh-agnostic.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfar_tpu.parallel.mesh import MODEL_AXIS

# (path regex, spec builder) -- first match wins.  Paths look like
# "encoder/layers/layer/attn_q/kernel".  Kernels carry a leading scan-layer
# axis, hence the 3d specs.
_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*attn_[qkv]/kernel$", P(None, None, MODEL_AXIS)),
    (r".*attn_[qkv]/bias$", P(None, MODEL_AXIS)),
    (r".*attn_o/kernel$", P(None, MODEL_AXIS, None)),
    (r".*mlp_in/kernel$", P(None, None, MODEL_AXIS)),
    (r".*mlp_in/bias$", P(None, MODEL_AXIS)),
    (r".*mlp_out/kernel$", P(None, MODEL_AXIS, None)),
    # T5 family: gated/plain FFN kernels and the shared token embedding
    (r".*/(wi|wi_0|wi_1)/kernel$", P(None, None, MODEL_AXIS)),
    (r".*/wo/kernel$", P(None, MODEL_AXIS, None)),
    (r".*token_embed/embedding$", P(MODEL_AXIS, None)),
    (r".*word_embeddings/embedding$", P(MODEL_AXIS, None)),
    # everything else (layernorms, biases of row-sharded layers, position
    # embeddings, mixer, batchnorm) replicates
    (r".*", P()),
)


def spec_for_path(path: str) -> P:
    for pattern, spec in _RULES:
        if re.match(pattern, path):
            return spec
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_specs(params: Dict[str, Any], mesh: Mesh = None) -> Dict[str, Any]:
    """PartitionSpec pytree matching the params pytree.  With a mesh, leaves
    whose dimensions don't divide the mesh axis fall back to replication
    (e.g. a vocab size not divisible by the tensor-parallel degree)."""

    def axis_size(ax) -> int:
        axes = ax if isinstance(ax, tuple) else (ax,)
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        return size

    def leaf_spec(key_path, leaf):
        spec = spec_for_path(_path_str(key_path))
        # Guard: never shard an axis the leaf doesn't have or can't divide.
        if len(spec) > getattr(leaf, "ndim", 0):
            return P()
        if mesh is not None:
            for dim, ax in enumerate(spec):
                if ax is not None and leaf.shape[dim] % axis_size(ax) != 0:
                    return P()
        return spec

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def param_shardings(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_specs(params, mesh),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """Place parameters on the mesh per the rules.

    Multi-host: leaves arrive committed to local devices (jit-created init
    state, host-restored checkpoints); a committed local array cannot be
    re-put onto a sharding spanning other processes, so stage through host
    numpy -- every process holds identical values, and device_put of an
    identical host array transfers only the local shards."""
    if jax.process_count() > 1:
        import numpy as np

        params = jax.tree.map(np.asarray, params)
    return jax.tree.map(jax.device_put, params, param_shardings(mesh, params))
