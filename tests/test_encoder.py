import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfar_tpu.models.encoder import Encoder, EncoderConfig, init_params, mean_pool
from mfar_tpu.models.tokenizer import SimpleVocabTokenizer, pad_to_bucket


@pytest.fixture(scope="module")
def tiny():
    config = EncoderConfig.tiny()
    params = init_params(config, seed=0)
    return config, params


def test_forward_shapes(tiny):
    config, params = tiny
    model = Encoder(config)
    ids = jnp.ones((3, 16), jnp.int32)
    mask = jnp.ones((3, 16), jnp.int32)
    emb = model.apply({"params": params}, ids, mask)
    assert emb.shape == (3, config.hidden_size)
    pooled, tokens = model.apply({"params": params}, ids, mask, return_tokens=True)
    assert tokens.shape == (3, 16, config.hidden_size)


def test_scan_param_layout(tiny):
    config, params = tiny
    k = params["layers"]["layer"]["attn_q"]["kernel"]
    assert k.shape == (config.num_layers, config.hidden_size, config.hidden_size)


def test_mask_affects_padding_only(tiny):
    config, params = tiny
    model = Encoder(config)
    ids = jnp.array([[5, 6, 7, 0, 0, 0, 0, 0]], jnp.int32)
    mask = jnp.array([[1, 1, 1, 0, 0, 0, 0, 0]], jnp.int32)
    emb1 = model.apply({"params": params}, ids, mask)
    # garbage in padded positions must not change the embedding
    ids2 = ids.at[0, 5].set(99)
    emb2 = model.apply({"params": params}, ids2, mask)
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb2), atol=1e-5)


def test_mean_pool():
    hidden = jnp.array([[[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]]])
    mask = jnp.array([[1, 1, 0]])
    np.testing.assert_allclose(np.asarray(mean_pool(hidden, mask)), [[2.0, 3.0]])


def test_normalize_flag(tiny):
    config, params = tiny
    import dataclasses

    norm_config = dataclasses.replace(config, normalize=True)
    model = Encoder(norm_config)
    ids = jnp.ones((2, 8), jnp.int32)
    emb = model.apply({"params": params}, ids, jnp.ones_like(ids))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)


def test_dropout_active_in_training_mode(tiny):
    config, params = tiny
    model = Encoder(config)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones_like(ids)
    out1 = model.apply(
        {"params": params}, ids, mask, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    out2 = model.apply(
        {"params": params}, ids, mask, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_remat_matches_plain(tiny):
    import dataclasses

    config, params = tiny
    ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % config.vocab_size
    mask = jnp.ones_like(ids)
    plain = Encoder(config).apply({"params": params}, ids, mask)
    remat = Encoder(dataclasses.replace(config, remat=True)).apply({"params": params}, ids, mask)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(remat), atol=1e-5)


def test_bf16_softmax_close_to_f32(tiny):
    """softmax_dtype=bf16 (the measured 826->726 ms/step training knob) must
    track the f32 softmax closely: near-unit cosine similarity of the
    pooled embeddings."""
    import dataclasses

    cfg32 = dataclasses.replace(tiny[0], dtype=jnp.float32)
    cfg16 = dataclasses.replace(cfg32, softmax_dtype=jnp.bfloat16)
    params = init_params(cfg32, seed=0)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg32.vocab_size, size=(4, 24)), jnp.int32)
    mask = jnp.ones((4, 24), jnp.int32)
    e32 = np.asarray(Encoder(cfg32).apply({"params": params}, ids, mask))
    e16 = np.asarray(Encoder(cfg16).apply({"params": params}, ids, mask))
    cos = np.sum(e32 * e16, -1) / (
        np.linalg.norm(e32, axis=-1) * np.linalg.norm(e16, axis=-1)
    )
    assert np.all(cos > 0.999), cos
    np.testing.assert_allclose(e16, e32, rtol=5e-2, atol=5e-2)


def test_remat_policies_match_plain(tiny):
    """Every remat policy computes the same function (only the backward
    memory/recompute schedule differs)."""
    import dataclasses

    base = dataclasses.replace(tiny[0], dtype=jnp.float32, remat=False)
    params = init_params(base, seed=0)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, base.vocab_size, size=(3, 16)), jnp.int32)
    mask = jnp.ones((3, 16), jnp.int32)
    want = np.asarray(Encoder(base).apply({"params": params}, ids, mask))
    for policy in ("full", "dots", "attn_out"):
        cfg = dataclasses.replace(base, remat=True, remat_policy=policy)

        def loss(p):
            return Encoder(cfg).apply({"params": p}, ids, mask).sum()

        out = np.asarray(Encoder(cfg).apply({"params": params}, ids, mask))
        np.testing.assert_allclose(out, want, atol=1e-5, err_msg=policy)
        g = jax.grad(loss)(params)  # backward compiles and is finite
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(l)) for l in leaves), policy


def test_hf_parity_torch_bert():
    """Outputs must match torch's BertModel + mean pooling on the same
    (random) weights -- validates architecture + converter together."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from mfar_tpu.models.hf_convert import config_from_hf, convert_hf_bert

    hf_config = BertConfig(
        vocab_size=97,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    torch_model = BertModel(hf_config, add_pooling_layer=False).eval()

    config = config_from_hf(hf_config)
    import dataclasses

    config = dataclasses.replace(config, dtype=jnp.float32)
    params = convert_hf_bert(torch_model.state_dict(), config)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 97, size=(4, 12))
    mask = np.ones((4, 12), dtype=np.int64)
    mask[2, 8:] = 0
    mask[3, 5:] = 0

    with torch.no_grad():
        torch_out = torch_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    torch_pooled = (torch_out * mask[..., None]).sum(1) / mask.sum(1, keepdims=True)

    ours_pooled, ours_tokens = Encoder(config).apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        return_tokens=True,
    )
    np.testing.assert_allclose(np.asarray(ours_tokens), torch_out, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_pooled), torch_pooled, atol=2e-4)


def test_tokenizer_roundtrip_and_buckets():
    texts = ["red shoe glows", "a blue lamp", "red shoe"]
    tok = SimpleVocabTokenizer.build(texts, max_length=32)
    batch = tok.encode_batch(texts)
    assert batch["input_ids"].shape == batch["attention_mask"].shape
    assert batch["input_ids"].shape[1] == 8  # bucket of longest (3+2=5 -> 8)
    assert batch["attention_mask"][0].sum() == 5
    # same word -> same id across texts
    red = tok.vocab["red"]
    assert batch["input_ids"][0][1] == red
    assert batch["input_ids"][2][1] == red


def test_pad_to_bucket():
    assert pad_to_bucket(5, 512) == 8
    assert pad_to_bucket(8, 512) == 8
    assert pad_to_bucket(9, 512) == 16
    assert pad_to_bucket(600, 512) == 512
    assert pad_to_bucket(300, 64) == 64


def test_tokenizer_save_load(tmp_path):
    tok = SimpleVocabTokenizer.build(["alpha beta gamma"], max_length=16)
    tok.save(str(tmp_path / "tok.json"))
    back = SimpleVocabTokenizer.load(str(tmp_path / "tok.json"))
    assert back.vocab == tok.vocab
    np.testing.assert_array_equal(
        back.encode_batch(["alpha gamma"])["input_ids"],
        tok.encode_batch(["alpha gamma"])["input_ids"],
    )
