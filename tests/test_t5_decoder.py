"""T5 decoder / seq2seq graft (the reference's with_decoder surface)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfar_tpu.models.t5_decoder import (
    T5Seq2Seq,
    T5Seq2SeqConfig,
    causal_relative_position_bucket,
    convert_hf_t5_decoder,
    graft_encoder_into_seq2seq,
    init_seq2seq_params,
)
from mfar_tpu.models.t5_encoder import T5Config, convert_hf_t5, init_t5_params, t5_config_from_hf


def _tiny_cfg():
    return dataclasses.replace(T5Config.tiny(), projection_dim=None)


def test_seq2seq_forward_shapes():
    cfg = T5Seq2SeqConfig(encoder=_tiny_cfg(), decoder=_tiny_cfg())
    params = init_seq2seq_params(cfg)
    ids = jnp.ones((2, 7), jnp.int32)
    dec_ids = jnp.zeros((2, 5), jnp.int32)
    logits = T5Seq2Seq(cfg).apply({"params": params}, ids, jnp.ones_like(ids), dec_ids)
    assert logits.shape == (2, 5, cfg.decoder.vocab_size)


def test_decoder_is_causal():
    """Changing a future decoder token must not change earlier logits."""
    cfg = T5Seq2SeqConfig(encoder=_tiny_cfg(), decoder=_tiny_cfg())
    params = init_seq2seq_params(cfg)
    model = T5Seq2Seq(cfg)
    ids = jnp.ones((1, 4), jnp.int32)
    mask = jnp.ones_like(ids)
    dec_a = jnp.asarray([[3, 5, 7, 9, 11, 13]], jnp.int32)
    dec_b = dec_a.at[0, 4].set(200)  # mutate position 4 only
    la = model.apply({"params": params}, ids, mask, dec_a)
    lb = model.apply({"params": params}, ids, mask, dec_b)
    np.testing.assert_allclose(np.asarray(la[:, :4]), np.asarray(lb[:, :4]), atol=1e-6)
    assert not np.allclose(np.asarray(la[:, 4:]), np.asarray(lb[:, 4:]))


def test_causal_bucket_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers.models.t5.modeling_t5 import T5Attention

    pos = np.arange(-40, 40).reshape(1, -1)
    ours = np.asarray(causal_relative_position_bucket(jnp.asarray(pos), 32, 128))
    theirs = T5Attention._relative_position_bucket(
        torch.tensor(pos), bidirectional=False, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("ffn", ["relu", "gated-gelu"])
def test_hf_parity_seq2seq(ffn):
    """Full logits parity vs torch T5ForConditionalGeneration (random init,
    offline).  gated-gelu exercises the untied-lm-head (v1.1) path."""
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    hf_config = HFT5Config(
        vocab_size=128, d_model=32, num_layers=3, num_heads=4, d_kv=8, d_ff=64,
        dropout_rate=0.0, feed_forward_proj=ffn,
        tie_word_embeddings=(ffn == "relu"),
    )
    torch.manual_seed(0)
    torch_model = T5ForConditionalGeneration(hf_config).eval()
    sd = torch_model.state_dict()

    cfg = dataclasses.replace(t5_config_from_hf(hf_config), dtype=jnp.float32, dropout=0.0)
    enc_params = convert_hf_t5(sd, cfg)
    config, params = graft_encoder_into_seq2seq(enc_params, sd, cfg)
    assert config.tie_lm_head == (ffn == "relu")

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 9))
    mask = np.ones((2, 9), dtype=np.int64)
    mask[1, 6:] = 0
    dec_ids = rng.integers(0, 128, size=(2, 5))

    with torch.no_grad():
        want = torch_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.tensor(dec_ids),
        ).logits.numpy()
    got = T5Seq2Seq(config).apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        jnp.asarray(dec_ids, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


def test_graft_uses_trained_encoder():
    """The graft keeps the (fine-tuned) encoder weights and drops the GTR
    projection head -- reference semantics (mfar/modeling/util.py:34)."""
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    hf_config = HFT5Config(
        vocab_size=128, d_model=32, num_layers=2, num_heads=2, d_kv=16, d_ff=64,
        dropout_rate=0.0, feed_forward_proj="relu", tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    sd = T5ForConditionalGeneration(hf_config).eval().state_dict()

    cfg = dataclasses.replace(
        t5_config_from_hf(hf_config), dtype=jnp.float32, dropout=0.0, projection_dim=24
    )
    trained = init_t5_params(cfg, seed=7)  # stands in for a fine-tuned encoder
    assert "projection" in trained
    config, params = graft_encoder_into_seq2seq(trained, sd, cfg)
    assert "projection" not in params["encoder"]
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["token_embed"]["embedding"]),
        np.asarray(trained["token_embed"]["embedding"]),
    )
    # decoder embeddings stay the checkpoint's, not the retriever's
    assert not np.array_equal(
        np.asarray(params["decoder"]["token_embed"]["embedding"]),
        np.asarray(params["encoder"]["token_embed"]["embedding"]),
    )
    logits = T5Seq2Seq(config).apply(
        {"params": params},
        jnp.ones((1, 6), jnp.int32), jnp.ones((1, 6), jnp.int32),
        jnp.zeros((1, 3), jnp.int32),
    )
    assert logits.shape == (1, 3, 128) and np.isfinite(np.asarray(logits)).all()
