import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfar_tpu.models.t5_encoder import (
    T5Config,
    T5Encoder,
    convert_hf_t5,
    init_t5_params,
    relative_position_bucket,
    t5_config_from_hf,
)


def test_forward_shapes():
    config = T5Config.tiny()
    params = init_t5_params(config)
    model = T5Encoder(config)
    ids = jnp.ones((2, 10), jnp.int32)
    out = model.apply({"params": params}, ids, jnp.ones_like(ids))
    assert out.shape == (2, config.d_model)


def test_projection_and_normalize():
    import dataclasses

    config = dataclasses.replace(T5Config.tiny(), projection_dim=24, normalize=True)
    params = init_t5_params(config)
    out = T5Encoder(config).apply(
        {"params": params}, jnp.ones((3, 6), jnp.int32), jnp.ones((3, 6), jnp.int32)
    )
    assert out.shape == (3, 24)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)


def test_relative_position_bucket_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers.models.t5.modeling_t5 import T5Attention

    pos = np.arange(-40, 40).reshape(1, -1)
    ours = np.asarray(relative_position_bucket(jnp.asarray(pos), 32, 128))
    theirs = T5Attention._relative_position_bucket(
        torch.tensor(pos), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_hf_parity_t5_encoder():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_config = HFT5Config(
        vocab_size=128,
        d_model=32,
        num_layers=3,
        num_heads=4,
        d_kv=8,
        d_ff=64,
        dropout_rate=0.0,
        feed_forward_proj="relu",
    )
    torch.manual_seed(0)
    torch_model = T5EncoderModel(hf_config).eval()

    import dataclasses

    config = dataclasses.replace(t5_config_from_hf(hf_config), dtype=jnp.float32, dropout=0.0)
    params = convert_hf_t5(torch_model.state_dict(), config)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(3, 9))
    mask = np.ones((3, 9), dtype=np.int64)
    mask[1, 6:] = 0

    with torch.no_grad():
        torch_out = torch_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    _, ours_tokens = T5Encoder(config).apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        return_tokens=True,
    )
    np.testing.assert_allclose(np.asarray(ours_tokens), torch_out, atol=3e-4)


def test_gated_ffn_parity():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_config = HFT5Config(
        vocab_size=64, d_model=16, num_layers=2, num_heads=2, d_kv=8, d_ff=32,
        dropout_rate=0.0, feed_forward_proj="gated-gelu",
    )
    torch.manual_seed(1)
    torch_model = T5EncoderModel(hf_config).eval()
    import dataclasses

    config = dataclasses.replace(t5_config_from_hf(hf_config), dtype=jnp.float32, dropout=0.0)
    assert config.gated_ffn
    params = convert_hf_t5(torch_model.state_dict(), config)
    ids = np.arange(12).reshape(2, 6) % 64
    mask = np.ones((2, 6), dtype=np.int64)
    with torch.no_grad():
        torch_out = torch_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    _, ours = T5Encoder(config).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        return_tokens=True,
    )
    np.testing.assert_allclose(np.asarray(ours), torch_out, atol=3e-4)


def test_mfar_model_with_t5_encoder_trains():
    """The flagship model composes with the T5 family end-to-end."""
    import dataclasses

    from mfar_tpu.train.model import MFARModel
    from mfar_tpu.train.optim import make_optimizer
    from mfar_tpu.train.train_step import init_state, make_train_step

    config = dataclasses.replace(T5Config.tiny(), projection_dim=24)
    model = MFARModel(encoder_config=config, num_fields=2, temperature=0.05)
    opt = make_optimizer(encoder_lr=1e-3, weights_lr=1e-1)
    state = init_state(model, opt, seed=0)
    assert state.params["mixer"]["weight"].shape == (24, 2)

    rng = np.random.default_rng(0)

    def toks(n):
        return {
            "input_ids": jnp.asarray(rng.integers(4, 256, size=(n, 8)), jnp.int32),
            "attention_mask": jnp.ones((n, 8), jnp.int32),
        }

    batch = {
        "query": toks(4),
        "pos": {"a_dense": toks(4), "b_dense": toks(4)},
        "neg": {"a_dense": toks(4), "b_dense": toks(4)},
    }
    step = jax.jit(make_train_step(model, opt))
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_t5_sharding_rules():
    from mfar_tpu.parallel.sharding import param_specs

    config = T5Config.tiny()
    params = {"encoder": init_t5_params(config)}
    specs = param_specs(params)
    layer = specs["encoder"]["layers"]["layer"]
    assert "model" in str(layer["wi"]["kernel"])
    assert "model" in str(layer["wo"]["kernel"])
    assert "model" in str(specs["encoder"]["token_embed"]["embedding"])
    assert str(specs["encoder"]["rel_bias"]) == "PartitionSpec()"
