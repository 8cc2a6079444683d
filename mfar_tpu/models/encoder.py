"""Shared text encoder: a Contriever-compatible BERT in Flax.

The reference encodes queries and every field through one shared
``SentenceTransformer`` (Contriever = BERT-base + mean pooling, reference:
mfar/modeling/util.py:38-52).  This is the TPU-native equivalent:

- pure-functional Flax module, XLA-compiled; bf16 activations / fp32 params
  by default (MXU-friendly);
- layers run under ``jax.lax.scan`` with optional rematerialization --
  constant compile time in depth and FLOPs-for-memory trading for large
  corpus-encoding batches;
- mean pooling over the attention mask produces the sentence embedding
  (no trailing L2-normalize, matching the reference's Contriever setup;
  ``normalize=True`` restores it);
- weights import from HF ``facebook/contriever-msmarco`` checkpoints via
  :mod:`mfar_tpu.models.hf_convert`.

Tensor-parallel sharding rules for these parameters live in
:mod:`mfar_tpu.parallel.sharding` (rules by param path, keeping the model
definition mesh-agnostic).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    dtype: Any = jnp.bfloat16  # activation/compute dtype
    remat: bool = False  # rematerialize layers (trade FLOPs for HBM)
    # Remat policy: "full" recomputes the whole layer in the backward pass
    # (minimum HBM); "dots" saves dense-matmul outputs (QKV, attn-out, MLP)
    # and recomputes only the un-saveable rest (attention scores, which
    # carry batch dims, plus elementwise) -- more HBM, less recompute.
    remat_policy: str = "full"
    # "xla" (default): let XLA schedule attention -- measured FASTER than the
    # generic Pallas flash kernel at retrieval shapes on v5e (fwd [256,512]:
    # 340 ms vs 558 ms; mag train step: 933 ms vs 1543 ms), i.e. don't
    # hand-schedule what the compiler already does well.  "flash"/"auto":
    # the fused Pallas kernel (parity-verified, more accurate than the bf16
    # XLA path vs an f32 reference) for shapes where it may win; auto gates
    # on TPU + block-aligned seq + inactive attention dropout.
    attention_impl: str = "xla"
    # Softmax accumulation dtype for attention probs.  f32 (default) matches
    # torch numerics; bf16 halves the [B, H, S, S] HBM traffic that
    # dominates the un-fused attention at seq 512 (max-subtracted softmax is
    # stable in bf16; embeddings shift by ~1e-3 relative).
    softmax_dtype: Any = jnp.float32
    normalize: bool = False  # L2-normalize sentence embeddings

    def __post_init__(self):
        # Typos must fail loudly: an unrecognized policy/impl would
        # otherwise silently select the fallback and benchmark the wrong
        # configuration.
        if self.remat_policy not in ("full", "dots", "attn_out"):
            raise ValueError(
                f"remat_policy {self.remat_policy!r} not in full|dots|attn_out"
            )
        if self.attention_impl not in ("xla", "flash", "auto"):
            raise ValueError(
                f"attention_impl {self.attention_impl!r} not in xla|flash|auto"
            )

    @classmethod
    def contriever_base(cls, **overrides) -> "EncoderConfig":
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "EncoderConfig":
        """4-layer toy config for tests and CPU smoke runs."""
        defaults = dict(
            vocab_size=512,
            hidden_size=64,
            num_layers=4,
            num_heads=4,
            intermediate_size=128,
            max_position_embeddings=128,
            dtype=jnp.float32,
        )
        defaults.update(overrides)
        return cls(**defaults)


class Embeddings(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic: bool):
        cfg = self.config
        seq_len = input_ids.shape[-1]
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings", dtype=cfg.dtype)(input_ids)
        pos_ids = jnp.arange(seq_len)[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="position_embeddings", dtype=cfg.dtype
        )(pos_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, name="token_type_embeddings", dtype=cfg.dtype)(
            token_type_ids
        )
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln", dtype=jnp.float32)(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        return x.astype(cfg.dtype)


class TransformerLayer(nn.Module):
    """Post-LN BERT layer (attention -> add&norm -> MLP -> add&norm)."""

    config: EncoderConfig

    @nn.compact
    def __call__(self, hidden, mask_bias, deterministic: bool):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads

        def dense(features, name):
            return nn.Dense(features, dtype=cfg.dtype, param_dtype=jnp.float32, name=name)

        q = dense(cfg.hidden_size, "attn_q")(hidden)
        k = dense(cfg.hidden_size, "attn_k")(hidden)
        v = dense(cfg.hidden_size, "attn_v")(hidden)

        batch, seq = hidden.shape[0], hidden.shape[1]
        shape = (batch, seq, cfg.num_heads, head_dim)
        q, k, v = (t.reshape(shape) for t in (q, k, v))

        # The flash kernel has no dropout and needs TPU + block-aligned seq;
        # "auto" falls back to XLA when any precondition fails, an explicit
        # "flash" refuses loudly rather than silently changing semantics.
        flash_ok = (
            jax.default_backend() == "tpu"
            and seq >= 128 and seq % 128 == 0
            and (deterministic or cfg.attention_dropout == 0.0)
        )
        if cfg.attention_impl == "flash" and not flash_ok:
            raise ValueError(
                "attention_impl='flash' needs a TPU backend, seq % 128 == 0 "
                "(got {}), and inactive attention dropout (got {}); use "
                "'auto' for automatic fallback".format(seq, cfg.attention_dropout)
            )
        use_flash = cfg.attention_impl in ("flash", "auto") and flash_ok
        if use_flash:
            # Fused kernel: never materializes the [B, H, S, S] probs in HBM
            # (the XLA path's dominant traffic at seq 512).  Padding becomes
            # segment ids: valid(1) vs pad(0) pairs are masked; pad-pad pairs
            # attend each other, but pad positions never feed valid ones and
            # the mean pooling drops them, so outputs match the XLA path.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds, flash_attention,
            )

            seg = (mask_bias[:, 0, 0, :] > -1.0).astype(jnp.int32)
            qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            ctx = flash_attention(
                qh, kh, vh,
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=float(1.0 / np.sqrt(head_dim)),
            )
            ctx = ctx.transpose(0, 2, 1, 3).reshape(batch, seq, cfg.hidden_size)
            ctx = ctx.astype(cfg.dtype)
        else:
            # softmax_dtype logits + softmax; contraction on the MXU.
            sm_dtype = cfg.softmax_dtype
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=sm_dtype)
            logits = logits / jnp.sqrt(jnp.asarray(head_dim, sm_dtype))
            logits = logits + mask_bias.astype(sm_dtype)  # [B, 1, 1, S] additive mask
            probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
            probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(batch, seq, cfg.hidden_size)

        attn_out = dense(cfg.hidden_size, "attn_o")(ctx)
        attn_out = nn.Dropout(cfg.hidden_dropout)(attn_out, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln1", dtype=jnp.float32)(
            hidden + attn_out
        ).astype(cfg.dtype)
        # Checkpoint name for the "attn_out" remat policy: saving just this
        # [T, H] residual point (~125 MB/layer at mag shapes) lets the MLP
        # backward skip recomputing the whole attention block (QKV + the
        # [B, H, S, S] score matmuls -- the dominant recompute at seq 512).
        from jax.ad_checkpoint import checkpoint_name

        hidden = checkpoint_name(hidden, "attn_residual")

        mlp = dense(cfg.intermediate_size, "mlp_in")(hidden)
        mlp = nn.gelu(mlp, approximate=False)
        mlp = dense(cfg.hidden_size, "mlp_out")(mlp)
        mlp = nn.Dropout(cfg.hidden_dropout)(mlp, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln2", dtype=jnp.float32)(
            hidden + mlp
        ).astype(cfg.dtype)
        return hidden


class _ScannedLayer(nn.Module):
    """Scan-compatible wrapper: carry = hidden states.

    ``deterministic`` is a module attribute (not a call argument) so that
    ``nn.remat`` never sees a Python bool as a traced operand.
    """

    config: EncoderConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, _, mask_bias):
        layer = TransformerLayer(self.config, name="layer")
        return layer(carry, mask_bias, self.deterministic), None


class Encoder(nn.Module):
    """BERT encoder + mean pooling -> sentence embeddings [B, E]."""

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids,  # i32[B, S]
        attention_mask,  # i32/f32[B, S]
        token_type_ids=None,
        deterministic: bool = True,
        return_tokens: bool = False,
    ):
        cfg = self.config
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        hidden = Embeddings(cfg, name="embeddings")(input_ids, token_type_ids, deterministic)
        mask_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)

        scan_body = _ScannedLayer
        if cfg.remat:
            policy = None
            if cfg.remat_policy == "dots":
                # measured mag all_dense B=24: OOM (18.8 GB demanded vs 15.75)
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif cfg.remat_policy == "attn_out":
                policy = jax.checkpoint_policies.save_only_these_names("attn_residual")
            scan_body = nn.remat(_ScannedLayer, prevent_cse=False, policy=policy)
        stack = nn.scan(
            scan_body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_layers,
            in_axes=(nn.broadcast, nn.broadcast),
        )(cfg, deterministic, name="layers")
        hidden, _ = stack(hidden, None, mask_bias)

        pooled = mean_pool(hidden, attention_mask)
        if cfg.normalize:
            pooled = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True).clip(1e-12)
        if return_tokens:
            return pooled, hidden
        return pooled


def mean_pool(hidden, attention_mask):
    """Attention-mask-weighted mean over the sequence axis, in fp32."""
    mask = attention_mask.astype(jnp.float32)[..., None]
    summed = jnp.sum(hidden.astype(jnp.float32) * mask, axis=-2)
    counts = jnp.maximum(jnp.sum(mask, axis=-2), 1e-9)
    return summed / counts


def init_params(config: EncoderConfig, seed: int = 0, seq_len: int = 8):
    """Random-init parameter pytree (used when no pretrained weights are
    available, e.g. tests and offline environments)."""
    model = Encoder(config)
    dummy = jnp.ones((1, seq_len), jnp.int32)
    return model.init(
        {"params": jax.random.PRNGKey(seed)},
        dummy,
        dummy,
        deterministic=True,
    )["params"]
