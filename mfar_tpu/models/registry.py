"""Model registry: resolve a model id to (config, params, tokenizer).

Covers the reference's ``prepare_model`` surface (reference:
mfar/modeling/util.py:16-71):

- ``facebook/contriever*`` and other HF BERT-architecture ids: convert the
  torch checkpoint to our Flax encoder (requires the HF cache or a local
  download -- offline environments must pass a local directory);
- a local directory containing a HF checkpoint;
- ``synthetic[:vocab_size]``: deterministic random-init tiny encoder +
  corpus-built tokenizer, for offline smoke runs (the reference has no
  offline path; its --max_docs truncation plays this role).

GTR-T5 (a T5 encoder) is not yet implemented in the Flax stack; requesting
it raises with a clear message.
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
):
    """Returns (encoder_config, params, tokenizer)."""
    if model_id.startswith("sentence-transformers/gtr-t5"):
        raise NotImplementedError(
            "GTR-T5 requires the T5 encoder family, which is not yet ported; "
            "use facebook/contriever* or a local BERT-architecture checkpoint."
        )

    if model_id.startswith("synthetic"):
        parts = model_id.split(":")
        assert corpus_texts is not None, "synthetic model needs corpus_texts for its vocab"
        max_vocab = int(parts[1]) if len(parts) > 1 else 32768
        tokenizer = SimpleVocabTokenizer.build(corpus_texts, max_vocab=max_vocab, max_length=128)
        config = EncoderConfig.tiny(vocab_size=tokenizer.vocab_size, normalize=normalize)
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
