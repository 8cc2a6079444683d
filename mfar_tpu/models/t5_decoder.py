"""T5 decoder stack + seq2seq graft (the reference's ``with_decoder``).

The reference optionally grafts a trained GTR-T5 encoder into the full
``google-t5/t5-{size}`` seq2seq model (reference: mfar/modeling/util.py:31-36
-- ``full_t5.encoder = model._first_module().auto_model.encoder``); its own
commands never exercise it (train.py:119, mask_fields.py:75 pass
``with_decoder=False``), so this is a convenience surface for generation-side
experiments on top of the trained retriever.

HF graft semantics, reproduced here: the *encoder* (and its token
embeddings) come from the trained retriever; the *decoder* keeps the
original T5 checkpoint's shared embeddings and (tied or untied) LM head.

TPU notes: the decoder runs the same ``lax.scan``-over-layers pattern as the
encoder modules, fp32 logits out of bf16 matmuls, static shapes throughout.
This is a teacher-forced scoring/training decoder (one forward over the
whole target sequence); no incremental KV-cache decode loop is provided --
the reference has no generation loop either.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mfar_tpu.models.t5_encoder import (
    RMSNorm,
    T5Config,
    T5Encoder,
    _np,
)


def causal_relative_position_bucket(
    relative_position: jax.Array, num_buckets: int, max_distance: int
) -> jax.Array:
    """T5's unidirectional bucketing (decoder self-attention): all
    num_buckets cover the past; future positions clamp to bucket 0 and are
    masked out anyway."""
    n = -jnp.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return jnp.where(is_small, n, val_if_large)


class T5DecoderLayer(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, hidden, enc_hidden, self_bias, cross_bias, deterministic: bool):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv

        def dense(features, name):
            return nn.Dense(features, use_bias=False, dtype=cfg.dtype,
                            param_dtype=jnp.float32, name=name)

        def attention(x, kv, bias, prefix):
            b, s, _ = x.shape
            sk = kv.shape[1]
            q = dense(inner, f"{prefix}_q")(x).reshape(b, s, cfg.num_heads, cfg.d_kv)
            k = dense(inner, f"{prefix}_k")(kv).reshape(b, sk, cfg.num_heads, cfg.d_kv)
            v = dense(inner, f"{prefix}_v")(kv).reshape(b, sk, cfg.num_heads, cfg.d_kv)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            logits = logits + bias
            probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
            probs = nn.Dropout(cfg.dropout)(probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, inner)
            return dense(cfg.d_model, f"{prefix}_o")(ctx)

        x = RMSNorm(cfg.layer_norm_eps, name="ln1")(hidden)
        out = attention(x, x, self_bias, "self")
        hidden = hidden + nn.Dropout(cfg.dropout)(out, deterministic=deterministic)

        x = RMSNorm(cfg.layer_norm_eps, name="ln2")(hidden)
        out = attention(x, enc_hidden, cross_bias, "cross")
        hidden = hidden + nn.Dropout(cfg.dropout)(out, deterministic=deterministic)

        x = RMSNorm(cfg.layer_norm_eps, name="ln3")(hidden)
        if cfg.gated_ffn:
            gate = nn.gelu(dense(cfg.d_ff, "wi_0")(x), approximate=True)
            mlp = dense(cfg.d_model, "wo")(gate * dense(cfg.d_ff, "wi_1")(x))
        else:
            mlp = dense(cfg.d_model, "wo")(nn.relu(dense(cfg.d_ff, "wi")(x)))
        hidden = hidden + nn.Dropout(cfg.dropout)(mlp, deterministic=deterministic)
        return hidden


class _ScannedT5DecoderLayer(nn.Module):
    config: T5Config
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, _, enc_hidden, self_bias, cross_bias):
        layer = T5DecoderLayer(self.config, name="layer")
        return layer(carry, enc_hidden, self_bias, cross_bias, self.deterministic), None


class T5Decoder(nn.Module):
    """Teacher-forced T5 decoder: causal self-attn (+ unidirectional relative
    bias) and cross-attn over encoder token states; returns final hidden."""

    config: T5Config

    @nn.compact
    def __call__(self, decoder_input_ids, enc_hidden, enc_mask,
                 deterministic: bool = True):
        cfg = self.config
        seq = decoder_input_ids.shape[-1]

        emb = nn.Embed(cfg.vocab_size, cfg.d_model, name="token_embed", dtype=cfg.dtype)(
            decoder_input_ids
        )
        hidden = nn.Dropout(cfg.dropout)(emb, deterministic=deterministic)

        pos = jnp.arange(seq)
        rel = pos[None, :] - pos[:, None]  # key - query
        buckets = causal_relative_position_bucket(
            rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        bias_table = self.param(
            "rel_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        pos_bias = jnp.transpose(bias_table[buckets], (2, 0, 1))[None]  # [1, H, S, S]
        causal = jnp.where(rel > 0, -1e9, 0.0)[None, None]  # key after query
        self_bias = (pos_bias + causal).astype(jnp.float32)
        cross_bias = jnp.where(enc_mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)

        scan_body = _ScannedT5DecoderLayer
        if cfg.remat:
            scan_body = nn.remat(scan_body, prevent_cse=False)
        stack = nn.scan(
            scan_body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_layers,
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
        )(cfg, deterministic, name="layers")
        hidden, _ = stack(hidden, None, enc_hidden.astype(cfg.dtype), self_bias, cross_bias)

        hidden = RMSNorm(cfg.layer_norm_eps, name="final_ln")(hidden)
        return nn.Dropout(cfg.dropout)(hidden, deterministic=deterministic)


@dataclasses.dataclass(frozen=True)
class T5Seq2SeqConfig:
    encoder: T5Config
    decoder: T5Config
    tie_lm_head: bool = True  # T5 v1.0: lm_head = shared embed, scaled logits


class T5Seq2Seq(nn.Module):
    """T5ForConditionalGeneration-equivalent: grafted encoder + decoder + LM
    head.  Encoder params may come from a trained retriever (the graft)."""

    config: T5Seq2SeqConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, decoder_input_ids,
                 deterministic: bool = True):
        cfg = self.config
        _, enc_hidden = T5Encoder(cfg.encoder, name="encoder")(
            input_ids, attention_mask, deterministic=deterministic, return_tokens=True
        )
        dec = T5Decoder(cfg.decoder, name="decoder")(
            decoder_input_ids, enc_hidden, attention_mask, deterministic=deterministic
        )
        dec = dec.astype(jnp.float32)
        if cfg.tie_lm_head:
            # v1.0 ties lm_head to the shared embedding and rescales.
            table = self.variables["params"]["decoder"]["token_embed"]["embedding"]
            dec = dec * (cfg.decoder.d_model ** -0.5)
            logits = jnp.dot(dec, jnp.asarray(table, jnp.float32).T,
                             preferred_element_type=jnp.float32)
        else:
            logits = nn.Dense(cfg.decoder.vocab_size, use_bias=False,
                              dtype=jnp.float32, name="lm_head")(dec)
        return logits


def init_seq2seq_params(config: T5Seq2SeqConfig, seed: int = 0, seq_len: int = 8):
    model = T5Seq2Seq(config)
    dummy = jnp.ones((1, seq_len), jnp.int32)
    return model.init({"params": jax.random.PRNGKey(seed)}, dummy, dummy, dummy)["params"]


# ---------------------------------------------------------------------------
# HF conversion (torch T5ForConditionalGeneration state_dict -> decoder tree)
# ---------------------------------------------------------------------------

_DEC_ATTN_MAP = {
    "self_q": "layer.0.SelfAttention.q",
    "self_k": "layer.0.SelfAttention.k",
    "self_v": "layer.0.SelfAttention.v",
    "self_o": "layer.0.SelfAttention.o",
    "cross_q": "layer.1.EncDecAttention.q",
    "cross_k": "layer.1.EncDecAttention.k",
    "cross_v": "layer.1.EncDecAttention.v",
    "cross_o": "layer.1.EncDecAttention.o",
}
_DEC_FFN_MAP = {
    False: {"wi": "layer.2.DenseReluDense.wi", "wo": "layer.2.DenseReluDense.wo"},
    True: {
        "wi_0": "layer.2.DenseReluDense.wi_0",
        "wi_1": "layer.2.DenseReluDense.wi_1",
        "wo": "layer.2.DenseReluDense.wo",
    },
}
_DEC_LN_MAP = {"ln1": "layer.0", "ln2": "layer.1", "ln3": "layer.2"}


def convert_hf_t5_decoder(state_dict: Mapping[str, Any], config: T5Config) -> Dict:
    """Decoder subtree of a HF T5ForConditionalGeneration state_dict."""
    sd = {k.removeprefix("decoder."): v for k, v in state_dict.items() if k.startswith("decoder.")}
    params: Dict[str, Any] = {
        "token_embed": {"embedding": _np(
            state_dict["shared.weight"] if "shared.weight" in state_dict
            else sd["embed_tokens.weight"]  # tied alias absent (see
            #   convert_hf_t5)
        )},
        "rel_bias": _np(sd["block.0.layer.0.SelfAttention.relative_attention_bias.weight"]),
        "final_ln": {"weight": _np(sd["final_layer_norm.weight"])},
    }
    layer: Dict[str, Any] = {}
    maps = dict(_DEC_ATTN_MAP)
    maps.update(_DEC_FFN_MAP[config.gated_ffn])
    for ours, theirs in maps.items():
        layer[ours] = {
            "kernel": np.stack(
                [_np(sd[f"block.{i}.{theirs}.weight"]).T for i in range(config.num_layers)]
            )
        }
    for ours, theirs in _DEC_LN_MAP.items():
        layer[ours] = {
            "weight": np.stack(
                [_np(sd[f"block.{i}.{theirs}.layer_norm.weight"]) for i in range(config.num_layers)]
            )
        }
    params["layers"] = {"layer": layer}
    return params


def graft_encoder_into_seq2seq(
    encoder_params: Dict,
    full_state_dict: Mapping[str, Any],
    encoder_config: T5Config,
    decoder_config: Optional[T5Config] = None,
) -> tuple:
    """The reference's graft: trained retriever encoder + checkpoint decoder.

    ``encoder_params`` is our (possibly fine-tuned) T5Encoder tree; the GTR
    projection head is dropped (the seq2seq consumes token states, reference
    grafts only ``auto_model.encoder``).  Returns (config, params).
    """
    decoder_config = decoder_config or encoder_config
    enc = {k: v for k, v in encoder_params.items() if k != "projection"}
    enc_cfg = dataclasses.replace(encoder_config, projection_dim=None, normalize=False)
    # HF state_dicts list lm_head.weight even when tied -- tied means it IS
    # the shared embedding, so compare values, not key presence.
    untied = "lm_head.weight" in full_state_dict and not np.array_equal(
        _np(full_state_dict["lm_head.weight"]), _np(full_state_dict["shared.weight"])
    )
    config = T5Seq2SeqConfig(encoder=enc_cfg, decoder=decoder_config,
                             tie_lm_head=not untied)
    params: Dict[str, Any] = {
        "encoder": enc,
        "decoder": convert_hf_t5_decoder(full_state_dict, decoder_config),
    }
    if untied:
        params["lm_head"] = {"kernel": _np(full_state_dict["lm_head.weight"]).T}
    return config, params
