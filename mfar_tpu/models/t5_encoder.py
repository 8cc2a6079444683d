"""T5 encoder family (GTR-T5) in Flax.

The reference's second encoder family: sentence-transformers GTR-T5 -- a T5
encoder with mean pooling, a dense projection, and (stripped by default) a
final normalize (reference: mfar/modeling/util.py:22-36).  Differences from
BERT that this implements:

- RMS layer norm (no bias, no mean subtraction), pre-LN residual blocks;
- no absolute position embeddings; bucketed *relative position bias* added
  to the attention logits, computed once and shared across all layers;
- no sqrt(d_k) attention scaling, no biases on linear layers;
- optional gated FFN (T5 v1.1) next to the classic relu FFN (v1.0 / GTR).

Layers run under ``lax.scan`` like the BERT encoder; weights import from a
HF ``T5EncoderModel`` via :func:`convert_hf_t5`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    d_kv: int = 64
    d_ff: int = 3072
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dropout: float = 0.1
    gated_ffn: bool = False  # True for T5 v1.1 (gelu gated)
    remat: bool = False  # rematerialize layers (trade FLOPs for HBM)
    dtype: Any = jnp.bfloat16
    # Attention softmax dtype (see EncoderConfig.softmax_dtype): bf16 halves
    # the [B, H, S, S] probs HBM traffic at a ~1e-3 embedding shift.
    softmax_dtype: Any = jnp.float32
    projection_dim: Optional[int] = None  # GTR dense head (d_model -> dim)
    normalize: bool = False

    @classmethod
    def gtr_base(cls, **overrides) -> "T5Config":
        defaults = dict(projection_dim=768)
        defaults.update(overrides)
        return cls(**defaults)

    @classmethod
    def tiny(cls, **overrides) -> "T5Config":
        defaults = dict(
            vocab_size=256, d_model=32, num_layers=2, num_heads=2, d_kv=16,
            d_ff=64, dtype=jnp.float32, dropout=0.0,
        )
        defaults.update(overrides)
        return cls(**defaults)


def relative_position_bucket(
    relative_position: jax.Array, num_buckets: int, max_distance: int
) -> jax.Array:
    """T5's bidirectional log-bucketed relative positions."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps) * scale).astype(x.dtype)


class T5Layer(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, hidden, pos_bias, mask_bias, deterministic: bool):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv

        def dense(features, name):
            return nn.Dense(features, use_bias=False, dtype=cfg.dtype,
                            param_dtype=jnp.float32, name=name)

        x = RMSNorm(cfg.layer_norm_eps, name="ln1")(hidden)
        b, s, _ = x.shape
        shape = (b, s, cfg.num_heads, cfg.d_kv)
        q = dense(inner, "attn_q")(x).reshape(shape)
        k = dense(inner, "attn_k")(x).reshape(shape)
        v = dense(inner, "attn_v")(x).reshape(shape)
        # T5 omits the 1/sqrt(d_kv) scaling.
        sm_dtype = cfg.softmax_dtype
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=sm_dtype)
        logits = logits + pos_bias.astype(sm_dtype) + mask_bias.astype(sm_dtype)
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        probs = nn.Dropout(cfg.dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, inner)
        attn_out = dense(cfg.d_model, "attn_o")(ctx)
        hidden = hidden + nn.Dropout(cfg.dropout)(attn_out, deterministic=deterministic)

        x = RMSNorm(cfg.layer_norm_eps, name="ln2")(hidden)
        if cfg.gated_ffn:
            # HF's "gated-gelu" uses gelu_new (the tanh approximation)
            gate = nn.gelu(dense(cfg.d_ff, "wi_0")(x), approximate=True)
            up = dense(cfg.d_ff, "wi_1")(x)
            mlp = dense(cfg.d_model, "wo")(gate * up)
        else:
            mlp = dense(cfg.d_model, "wo")(nn.relu(dense(cfg.d_ff, "wi")(x)))
        hidden = hidden + nn.Dropout(cfg.dropout)(mlp, deterministic=deterministic)
        return hidden


class _ScannedT5Layer(nn.Module):
    config: T5Config
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, _, pos_bias, mask_bias):
        layer = T5Layer(self.config, name="layer")
        return layer(carry, pos_bias, mask_bias, self.deterministic), None


class T5Encoder(nn.Module):
    """T5 encoder stack + mean pooling (+ GTR projection / normalize)."""

    config: T5Config

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True,
                 return_tokens: bool = False):
        cfg = self.config
        seq = input_ids.shape[-1]

        emb = nn.Embed(cfg.vocab_size, cfg.d_model, name="token_embed", dtype=cfg.dtype)(input_ids)
        hidden = nn.Dropout(cfg.dropout)(emb, deterministic=deterministic)

        # Relative position bias: computed once, shared by every layer
        # (T5 stores it on block 0).
        pos = jnp.arange(seq)
        rel = pos[None, :] - pos[:, None]  # key - query
        buckets = relative_position_bucket(
            rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        bias_table = self.param(
            "rel_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        pos_bias = jnp.transpose(bias_table[buckets], (2, 0, 1))[None]  # [1, H, S, S]
        mask_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)

        scan_body = _ScannedT5Layer
        if cfg.remat:
            scan_body = nn.remat(scan_body, prevent_cse=False)
        stack = nn.scan(
            scan_body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_layers,
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
        )(cfg, deterministic, name="layers")
        hidden, _ = stack(hidden, None, pos_bias.astype(jnp.float32), mask_bias)

        hidden = RMSNorm(cfg.layer_norm_eps, name="final_ln")(hidden)
        hidden = nn.Dropout(cfg.dropout)(hidden, deterministic=deterministic)

        mask = attention_mask.astype(jnp.float32)[..., None]
        pooled = jnp.sum(hidden.astype(jnp.float32) * mask, axis=-2) / jnp.maximum(
            jnp.sum(mask, axis=-2), 1e-9
        )
        if cfg.projection_dim:
            pooled = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=jnp.float32, name="projection"
            )(pooled)
        if cfg.normalize:
            pooled = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True).clip(1e-12)
        if return_tokens:
            return pooled, hidden
        return pooled


def init_t5_params(config: T5Config, seed: int = 0, seq_len: int = 8):
    model = T5Encoder(config)
    dummy = jnp.ones((1, seq_len), jnp.int32)
    return model.init({"params": jax.random.PRNGKey(seed)}, dummy, dummy)["params"]


# ---------------------------------------------------------------------------
# HF conversion (torch T5EncoderModel state_dict -> our param tree)
# ---------------------------------------------------------------------------

_T5_LAYER_MAP = {
    "attn_q": "layer.0.SelfAttention.q",
    "attn_k": "layer.0.SelfAttention.k",
    "attn_v": "layer.0.SelfAttention.v",
    "attn_o": "layer.0.SelfAttention.o",
}
_T5_FFN_MAP = {
    False: {"wi": "layer.1.DenseReluDense.wi", "wo": "layer.1.DenseReluDense.wo"},
    True: {
        "wi_0": "layer.1.DenseReluDense.wi_0",
        "wi_1": "layer.1.DenseReluDense.wi_1",
        "wo": "layer.1.DenseReluDense.wo",
    },
}


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_hf_t5(state_dict: Mapping[str, Any], config: T5Config) -> Dict:
    sd = {k.removeprefix("encoder."): v for k, v in state_dict.items()}
    if "shared.weight" not in sd:
        # tied-embedding alias absent (submodule save / dedup'd
        # safetensors): the de-prefixed embed_tokens holds the same tensor
        sd["shared.weight"] = sd["embed_tokens.weight"]

    params: Dict[str, Any] = {
        "token_embed": {"embedding": _np(sd["shared.weight"])},
        "rel_bias": _np(
            sd["block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        ),
        "final_ln": {"weight": _np(sd["final_layer_norm.weight"])},
    }

    layer: Dict[str, Any] = {}
    maps = dict(_T5_LAYER_MAP)
    maps.update(_T5_FFN_MAP[config.gated_ffn])
    for ours, theirs in maps.items():
        layer[ours] = {
            "kernel": np.stack(
                [_np(sd[f"block.{i}.{theirs}.weight"]).T for i in range(config.num_layers)]
            )
        }
    layer["ln1"] = {
        "weight": np.stack(
            [_np(sd[f"block.{i}.layer.0.layer_norm.weight"]) for i in range(config.num_layers)]
        )
    }
    layer["ln2"] = {
        "weight": np.stack(
            [_np(sd[f"block.{i}.layer.1.layer_norm.weight"]) for i in range(config.num_layers)]
        )
    }
    params["layers"] = {"layer": layer}
    return params


def t5_config_from_hf(hf_config, **overrides) -> T5Config:
    cfg = T5Config(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.d_model,
        num_layers=hf_config.num_layers,
        num_heads=hf_config.num_heads,
        d_kv=hf_config.d_kv,
        d_ff=hf_config.d_ff,
        relative_attention_num_buckets=hf_config.relative_attention_num_buckets,
        relative_attention_max_distance=getattr(hf_config, "relative_attention_max_distance", 128),
        gated_ffn="gated" in getattr(hf_config, "feed_forward_proj", "relu"),
    )
    return dataclasses.replace(cfg, **overrides) if overrides else cfg
