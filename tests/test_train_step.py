import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfar_tpu.models.encoder import EncoderConfig
from mfar_tpu.train.model import MFARModel
from mfar_tpu.train.optim import make_optimizer, param_labels
from mfar_tpu.train.train_step import init_state, make_eval_loss_step, make_train_step

B, Nn, S = 4, 1, 2
FIELD_KEYS = ["alpha_dense", "beta_dense"]


def make_model(use_batchnorm=False, num_sparse=0):
    return MFARModel(
        encoder_config=EncoderConfig.tiny(num_layers=2, hidden_size=32, num_heads=2, vocab_size=64),
        num_fields=len(FIELD_KEYS) + num_sparse,
        query_cond=True,
        use_batchnorm=use_batchnorm,
        temperature=0.05,
    )


def make_batch(rng, num_sparse=0, seq=8):
    def toks(n):
        return {
            "input_ids": jnp.asarray(rng.integers(4, 64, size=(n, seq)), jnp.int32),
            "attention_mask": jnp.ones((n, seq), jnp.int32),
        }

    batch = {
        "query": toks(B),
        "pos": {fk: toks(B) for fk in FIELD_KEYS},
        "neg": {fk: toks(B * Nn) for fk in FIELD_KEYS},
    }
    if num_sparse:
        batch["sparse_pos"] = jnp.asarray(rng.normal(size=(B, B, num_sparse)), jnp.float32)
        batch["sparse_neg"] = jnp.asarray(rng.normal(size=(B, B * Nn, num_sparse)), jnp.float32)
    return batch


def test_train_step_runs_and_loss_decreases():
    model = make_model()
    opt = make_optimizer(encoder_lr=1e-3, weights_lr=1e-1)
    state = init_state(model, opt, seed=0)
    step = jax.jit(make_train_step(model, opt))
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 12
    assert np.isfinite(losses).all()


def test_hybrid_with_sparse_and_batchnorm():
    model = make_model(use_batchnorm=True, num_sparse=S)
    opt = make_optimizer(encoder_lr=1e-3, weights_lr=1e-1)
    state = init_state(model, opt, seed=0)
    step = jax.jit(make_train_step(model, opt))
    batch = make_batch(np.random.default_rng(1), num_sparse=S)
    before = jax.tree.map(np.asarray, state.batch_stats)
    state, metrics = step(state, batch)
    after = jax.tree.map(np.asarray, state.batch_stats)
    assert np.isfinite(float(metrics["loss"]))
    # running stats moved
    leaves_b = jax.tree.leaves(before)
    leaves_a = jax.tree.leaves(after)
    assert any(not np.allclose(b, a) for b, a in zip(leaves_b, leaves_a))


def test_param_labels_split():
    model = make_model(use_batchnorm=True, num_sparse=S)
    opt = make_optimizer(encoder_lr=1e-3, weights_lr=1e-1)
    state = init_state(model, opt, seed=0)
    labels = param_labels(state.params)
    assert set(jax.tree.leaves(labels)) == {"encoder", "head"}
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    for path, label in flat:
        top = path[0].key
        assert label == ("encoder" if top == "encoder" else "head")


def test_freeze_encoder_keeps_encoder_fixed():
    model = make_model()
    opt = make_optimizer(encoder_lr=1e-3, weights_lr=1e-1, freeze_encoder=True)
    state = init_state(model, opt, seed=0)
    step = jax.jit(make_train_step(model, opt))
    batch = make_batch(np.random.default_rng(2))
    enc_before = jax.tree.map(np.asarray, state.params["encoder"])
    mix_before = np.asarray(state.params["mixer"]["weight"])
    state, _ = step(state, batch)
    enc_after = jax.tree.map(np.asarray, state.params["encoder"])
    for b, a in zip(jax.tree.leaves(enc_before), jax.tree.leaves(enc_after)):
        np.testing.assert_array_equal(b, a)
    assert not np.allclose(mix_before, np.asarray(state.params["mixer"]["weight"]))


def test_two_lr_groups_apply_different_scales():
    model = make_model()
    opt = make_optimizer(encoder_lr=1e-5, weights_lr=1e-1)
    state = init_state(model, opt, seed=0)
    step = jax.jit(make_train_step(model, opt))
    batch = make_batch(np.random.default_rng(3))
    mix_before = np.asarray(state.params["mixer"]["weight"])
    enc_leaf_before = np.asarray(state.params["encoder"]["embeddings"]["word_embeddings"]["embedding"])
    state, _ = step(state, batch)
    mix_delta = np.abs(np.asarray(state.params["mixer"]["weight"]) - mix_before).max()
    enc_delta = np.abs(
        np.asarray(state.params["encoder"]["embeddings"]["word_embeddings"]["embedding"]) - enc_leaf_before
    ).max()
    # adam steps are ~lr-sized: head step should be orders larger
    assert mix_delta > 50 * enc_delta


def test_eval_loss_deterministic():
    model = make_model()
    opt = make_optimizer(encoder_lr=1e-3, weights_lr=1e-1)
    state = init_state(model, opt, seed=0)
    eval_step = jax.jit(make_eval_loss_step(model))
    batch = make_batch(np.random.default_rng(4))
    l1 = float(eval_step(state, batch))
    l2 = float(eval_step(state, batch))
    assert l1 == l2


def test_train_step_sharded_over_mesh():
    """Full pjit train step with batch over 'data' and params tensor-sharded
    over 'model' on a 4x2 mesh -- the dryrun_multichip core."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mfar_tpu.parallel.mesh import make_mesh
    from mfar_tpu.parallel.sharding import shard_params

    model = make_model()
    opt = make_optimizer(encoder_lr=1e-3, weights_lr=1e-1)
    state = init_state(model, opt, seed=0)
    single_step = jax.jit(make_train_step(model, opt))
    batch = make_batch(np.random.default_rng(5))
    _, want = single_step(state, batch)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded_params = shard_params(mesh, state.params)
    state2 = state._replace(params=sharded_params)
    data_sharding = NamedSharding(mesh, P("data"))
    batch2 = jax.tree.map(lambda x: jax.device_put(x, data_sharding) if x.shape and x.shape[0] % 4 == 0 else x, batch)
    step2 = jax.jit(make_train_step(model, opt))
    state2, got = step2(state2, batch2)
    np.testing.assert_allclose(float(got["loss"]), float(want["loss"]), rtol=1e-4)
    # params keep their shardings through the update
    k = state2.params["encoder"]["layers"]["layer"]["mlp_in"]["kernel"]
    assert "model" in str(k.sharding)


def test_remat_preserves_loss_and_grads():
    """remat=True must be numerically identical (same loss, same update)."""
    import dataclasses

    from mfar_tpu.models.encoder import EncoderConfig
    from mfar_tpu.train.model import MFARModel
    from mfar_tpu.train.optim import make_optimizer
    from mfar_tpu.train.train_step import init_state, make_train_step

    rng = np.random.default_rng(0)

    def toks(n, s=8):
        return {
            "input_ids": jnp.asarray(rng.integers(4, 256, size=(n, s)), jnp.int32),
            "attention_mask": jnp.ones((n, s), jnp.int32),
        }

    batch = {
        "query": toks(4),
        "pos": {"a_dense": toks(4)},
        "neg": {"a_dense": toks(4)},
    }
    losses = []
    for remat in (False, True):
        config = dataclasses.replace(
            EncoderConfig.tiny(), remat=remat, dtype=jnp.float32,
            hidden_dropout=0.0, attention_dropout=0.0,
        )
        model = MFARModel(encoder_config=config, num_fields=1, temperature=0.05)
        opt = make_optimizer(encoder_lr=1e-3, weights_lr=1e-1)
        state = init_state(model, opt, seed=0)
        step = jax.jit(make_train_step(model, opt))
        state, m = step(state, batch)
        state, m2 = step(state, batch)
        losses.append((float(m["loss"]), float(m2["loss"])))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_train_step_t5_family():
    """The GTR/T5 encoder family trains through the same step: loss finite
    and decreasing over a few repeats of one batch, params updating."""
    from mfar_tpu.models import T5Config

    rng = np.random.default_rng(0)
    config = T5Config(
        vocab_size=64, d_model=32, d_kv=8, num_heads=4, num_layers=2,
        d_ff=64, dropout=0.0, projection_dim=16,
    )
    model = MFARModel(encoder_config=config, num_fields=2, query_cond=True)
    opt = make_optimizer(encoder_lr=5e-3, weights_lr=1e-1, use_adafactor=True)
    state = init_state(model, opt, seed=0)
    batch = make_batch(rng)
    step = jax.jit(make_train_step(model, opt))
    w0 = np.asarray(
        jax.tree.leaves(state.params["encoder"])[0]
    ).copy()
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    w1 = np.asarray(jax.tree.leaves(state.params["encoder"])[0])
    assert not np.allclose(w0, w1)
