"""HuggingFace BERT/Contriever checkpoint -> Flax parameter pytree.

The reference loads ``facebook/contriever-msmarco`` through
sentence-transformers (reference: mfar/modeling/util.py:38-52); here the
torch state_dict (or a safetensors file) converts directly into the scanned
Flax layout of :class:`mfar_tpu.models.encoder.Encoder`:

- torch ``Linear`` weights ``[out, in]`` transpose to Flax kernels
  ``[in, out]``;
- per-layer tensors stack along a leading layer axis (the encoder runs its
  layers under ``lax.scan``).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from mfar_tpu.models.encoder import EncoderConfig

_LAYER_MAP = {
    # our dense name -> (hf submodule path, transpose kernel)
    "attn_q": "attention.self.query",
    "attn_k": "attention.self.key",
    "attn_v": "attention.self.value",
    "attn_o": "attention.output.dense",
    "mlp_in": "intermediate.dense",
    "mlp_out": "output.dense",
}
_LAYER_LN_MAP = {
    "ln1": "attention.output.LayerNorm",
    "ln2": "output.LayerNorm",
}


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_hf_bert(state_dict: Mapping[str, Any], config: EncoderConfig) -> Dict:
    """Convert a HF ``BertModel`` state_dict to our Encoder params."""
    sd = {k.removeprefix("bert."): v for k, v in state_dict.items()}

    params: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": _np(sd["embeddings.word_embeddings.weight"])},
            "position_embeddings": {"embedding": _np(sd["embeddings.position_embeddings.weight"])},
            "token_type_embeddings": {"embedding": _np(sd["embeddings.token_type_embeddings.weight"])},
            "ln": {
                "scale": _np(sd["embeddings.LayerNorm.weight"]),
                "bias": _np(sd["embeddings.LayerNorm.bias"]),
            },
        }
    }

    layer: Dict[str, Any] = {}
    for ours, theirs in _LAYER_MAP.items():
        kernels, biases = [], []
        for i in range(config.num_layers):
            kernels.append(_np(sd[f"encoder.layer.{i}.{theirs}.weight"]).T)
            biases.append(_np(sd[f"encoder.layer.{i}.{theirs}.bias"]))
        layer[ours] = {"kernel": np.stack(kernels), "bias": np.stack(biases)}
    for ours, theirs in _LAYER_LN_MAP.items():
        scales, biases = [], []
        for i in range(config.num_layers):
            scales.append(_np(sd[f"encoder.layer.{i}.{theirs}.weight"]))
            biases.append(_np(sd[f"encoder.layer.{i}.{theirs}.bias"]))
        layer[ours] = {"scale": np.stack(scales), "bias": np.stack(biases)}

    params["layers"] = {"layer": layer}
    return params


def config_from_hf(hf_config) -> EncoderConfig:
    return EncoderConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
    )


def load_pretrained(model_name_or_dir: str, **config_overrides):
    """Load a HF BERT-architecture checkpoint (local dir or hub cache) into
    (EncoderConfig, params).  Requires torch + transformers on the host."""
    from transformers import AutoConfig, AutoModel

    hf_config = AutoConfig.from_pretrained(model_name_or_dir)
    torch_model = AutoModel.from_pretrained(model_name_or_dir)
    config = config_from_hf(hf_config)
    if config_overrides:
        import dataclasses

        config = dataclasses.replace(config, **config_overrides)
    params = convert_hf_bert(torch_model.state_dict(), config)
    return config, params
