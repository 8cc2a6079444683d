"""Model registry: resolve a model id to (config, params, tokenizer).

Covers the reference's ``prepare_model`` surface (reference:
mfar/modeling/util.py:16-71):

- ``facebook/contriever*`` and other HF BERT-architecture ids: convert the
  torch checkpoint to our Flax encoder (requires the HF cache or a local
  download -- offline environments must pass a local directory);
- a local directory containing a HF checkpoint;
- ``gtr-t5*`` / ``t5:*`` ids: the Flax T5 encoder family (t5_encoder.py);
- ``synthetic[:vocab_size[:hidden_size]]``: deterministic random-init tiny
  encoder + corpus-built tokenizer, for offline smoke runs (the reference
  has no offline path; its --max_docs truncation plays this role).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from mfar_tpu.models.encoder import EncoderConfig, init_params
from mfar_tpu.models.tokenizer import HFTokenizer, SimpleVocabTokenizer


def prepare_model(
    model_id: str,
    normalize: bool = False,
    corpus_texts: Optional[Sequence[str]] = None,
    dtype=jnp.bfloat16,
    max_length: int = 512,
    with_decoder: bool = False,
):
    """Returns (encoder_config, params, tokenizer)[, seq2seq].

    ``with_decoder`` mirrors the reference's optional full-T5 graft for
    GTR-T5 ids (reference: mfar/modeling/util.py:31-36): additionally
    returns a (T5Seq2SeqConfig, params) bundle whose encoder is this
    retriever encoder and whose decoder comes from the matching
    ``google-t5/t5-{size}`` checkpoint.  See graft_t5_decoder.
    """
    if is_t5_family(model_id):
        out = _prepare_gtr(model_id, normalize=normalize, max_length=max_length,
                           dtype=dtype)
        if with_decoder:
            return (*out, graft_t5_decoder(model_id, out[0], out[1]))
        return out
    if with_decoder:
        raise ValueError(f"with_decoder is a GTR-T5 surface; got {model_id!r}")

    if model_id.startswith("synthetic"):
        parts = model_id.split(":")
        assert corpus_texts is not None, "synthetic model needs corpus_texts for its vocab"
        max_vocab = int(parts[1]) if len(parts) > 1 else 32768
        tokenizer = SimpleVocabTokenizer.build(
            corpus_texts, max_vocab=max_vocab, max_length=min(max_length, 128)
        )  # capped at the tiny config's max_position_embeddings
        overrides = {}
        if len(parts) > 2:  # synthetic:vocab:hidden -- TPU-shaped smoke runs
            hidden = int(parts[2])
            overrides = dict(hidden_size=hidden, intermediate_size=4 * hidden,
                             num_heads=max(4, hidden // 64))
        config = EncoderConfig.tiny(vocab_size=tokenizer.vocab_size, normalize=normalize, **overrides)
        params = init_params(config, seed=0)
        return config, params, tokenizer

    # HF hub id or local directory
    from mfar_tpu.models.hf_convert import load_pretrained

    config, params = load_pretrained(model_id, dtype=dtype, normalize=normalize)
    tok_source = model_id
    if os.path.isdir(model_id) and os.path.exists(os.path.join(model_id, "tokenizer.json")):
        tokenizer = HFTokenizer.from_file(os.path.join(model_id, "tokenizer.json"), max_length)
    else:
        tokenizer = HFTokenizer.from_pretrained(tok_source, max_length)
    return config, params, tokenizer


def is_t5_family(model_id: str) -> bool:
    """True when :func:`prepare_model` routes this id to the T5 encoder
    family -- the ONE routing gate (optimizer selection keys on it too:
    T5 trains with Adafactor, reference contrastive.py:321)."""
    return (
        "gtr-t5" in model_id or model_id.startswith("t5:") or _is_t5_dir(model_id)
    )


def _is_t5_dir(model_id: str) -> bool:
    """A local HF checkpoint directory whose config declares a T5-family
    architecture (covers ``T5EncoderModel.save_pretrained`` output and HF
    hub snapshots of google/t5 or gtr weights downloaded by hand)."""
    cfg_path = os.path.join(model_id, "config.json")
    if not (os.path.isdir(model_id) and os.path.exists(cfg_path)):
        return False
    import json

    try:
        with open(cfg_path) as f:
            return json.load(f).get("model_type") in ("t5", "mt5")
    except (OSError, ValueError):
        return False


def _prepare_t5_dir(path: str, normalize: bool, max_length: int, dtype=jnp.bfloat16):
    """Direct T5-encoder loading from a local checkpoint DIRECTORY -- no
    sentence_transformers / network required (the reference can only reach
    GTR weights through SentenceTransformer, reference
    mfar/modeling/util.py:22-36; a hand-downloaded snapshot works here).
    No dense projection module (that is part of the sentence-transformers
    GTR packaging, not the T5 checkpoint itself)."""
    from transformers import T5EncoderModel

    from mfar_tpu.models.t5_encoder import convert_hf_t5, t5_config_from_hf

    t5 = T5EncoderModel.from_pretrained(path)
    config = t5_config_from_hf(t5.config, normalize=normalize, dtype=dtype)
    params = convert_hf_t5(t5.state_dict(), config)
    tok_json = os.path.join(path, "tokenizer.json")
    if os.path.exists(tok_json):
        tokenizer = HFTokenizer.from_file(tok_json, max_length)
    else:
        tokenizer = HFTokenizer.from_pretrained(path, max_length)
    return config, params, tokenizer


def _prepare_gtr(model_id: str, normalize: bool, max_length: int, dtype=jnp.bfloat16):
    """GTR-T5 via sentence-transformers: T5 encoder + mean pooling + dense
    projection (+ Normalize, stripped unless ``normalize``) -- the module
    stack the reference builds (reference: mfar/modeling/util.py:22-36).
    Local T5 checkpoint directories load directly (no sentence_transformers
    dependency) via :func:`_prepare_t5_dir`."""
    import numpy as np

    from mfar_tpu.models.t5_encoder import convert_hf_t5, t5_config_from_hf

    if model_id.startswith("t5:"):
        # explicit direct-T5 spelling: ``t5:<hf-id-or-local-dir>`` loads the
        # bare T5 encoder (no sentence-transformers packaging/projection)
        return _prepare_t5_dir(model_id[3:], normalize=normalize,
                               max_length=max_length, dtype=dtype)
    if _is_t5_dir(model_id) and not os.path.exists(
        os.path.join(model_id, "modules.json")  # an ST save keeps its stack
    ):
        return _prepare_t5_dir(model_id, normalize=normalize,
                               max_length=max_length, dtype=dtype)

    from sentence_transformers import SentenceTransformer

    st = SentenceTransformer(model_id)
    t5 = st._first_module().auto_model
    dense_mods = [m for m in st._modules.values() if type(m).__name__ == "Dense"]
    projection_dim = None
    if dense_mods:
        projection_dim = dense_mods[0].linear.out_features
    config = t5_config_from_hf(
        t5.config, projection_dim=projection_dim, normalize=normalize, dtype=dtype
    )
    params = convert_hf_t5(t5.state_dict(), config)
    if dense_mods:
        params["projection"] = {
            "kernel": np.asarray(dense_mods[0].linear.weight.detach().cpu().numpy().T)
        }
    tokenizer = HFTokenizer(st.tokenizer, max_length)
    return config, params, tokenizer


def graft_t5_decoder(model_id: str, encoder_config, encoder_params):
    """Graft the (trained) GTR encoder into the full T5 seq2seq stack.

    Loads ``google-t5/t5-{size}`` for the decoder + LM head (reference:
    mfar/modeling/util.py:31-34 derives the size from the GTR id suffix) and
    returns (T5Seq2SeqConfig, params) for :class:`T5Seq2Seq`.
    """
    from transformers import T5ForConditionalGeneration

    from mfar_tpu.models.t5_decoder import graft_encoder_into_seq2seq
    from mfar_tpu.models.t5_encoder import t5_config_from_hf

    # The size-from-suffix rule is only defined for the GTR family (the
    # reference gates on this prefix too, mfar/modeling/util.py:22).
    if not model_id.startswith("sentence-transformers/gtr-t5"):
        raise ValueError(
            f"with_decoder grafting is defined for sentence-transformers/"
            f"gtr-t5-* ids (got {model_id!r})"
        )
    t5_size = model_id.split("-")[-1]
    # GTR is built on ORIGINAL T5 (its configs use feed_forward_proj=relu,
    # not v1.1's gated-gelu), whose xl/xxl checkpoints are hosted as
    # t5-3b/t5-11b; google-t5/t5-xl does not exist.
    hf_size = {"xl": "3b", "xxl": "11b"}.get(t5_size, t5_size)
    full = T5ForConditionalGeneration.from_pretrained(f"google-t5/t5-{hf_size}")
    decoder_config = t5_config_from_hf(
        full.config, num_layers=full.config.num_decoder_layers
    )
    return graft_encoder_into_seq2seq(
        encoder_params, full.state_dict(), encoder_config, decoder_config
    )
