"""Pin-tests for behaviors corrected in the round-3 review campaign."""

import warnings

import numpy as np
import pytest

import jax.numpy as jnp


def test_is_t5_family_routes_like_prepare_model(tmp_path):
    """Optimizer selection keys on the registry's routing: a local T5 dir
    without 't5' in its path is T5; an unrelated path containing 't5' is
    not."""
    from mfar_tpu.models.registry import is_t5_family

    d = tmp_path / "gtr-base-checkpoint"  # no 't5' substring
    d.mkdir()
    (d / "config.json").write_text('{"model_type": "t5"}')
    assert is_t5_family(str(d))

    other = tmp_path / "part5" / "contriever"  # 't5' substring, not T5
    other.mkdir(parents=True)
    assert not is_t5_family(str(other))
    assert is_t5_family("sentence-transformers/gtr-t5-base")
    assert is_t5_family("t5:/some/dir")
    assert not is_t5_family("facebook/contriever-msmarco")


def test_head_optimizer_uses_torch_default_weight_decay():
    """The reference's head AdamW inherits torch's default decay (0.01);
    with zero gradients the decoupled decay is the ONLY update, so one
    step moves a head param by exactly -lr * 0.01 * p."""
    import optax

    from mfar_tpu.train.optim import make_optimizer

    opt = make_optimizer(encoder_lr=1e-3, weights_lr=0.1)
    params = {"encoder": {"w": jnp.ones((2,))}, "mixer": {"weight": jnp.ones((2,))}}
    state = opt.init(params)
    zero = {"encoder": {"w": jnp.zeros((2,))}, "mixer": {"weight": jnp.zeros((2,))}}
    updates, _ = opt.update(zero, state, params)
    np.testing.assert_allclose(
        np.asarray(updates["mixer"]["weight"]), -0.1 * 0.01 * 1.0, rtol=1e-6
    )
    # encoder decay defaults to 0 (--regularizer), so zero grads = no move
    np.testing.assert_allclose(np.asarray(updates["encoder"]["w"]), 0.0, atol=1e-12)


def test_adafactor_warns_on_ignored_weight_decay():
    from mfar_tpu.train.optim import make_optimizer

    with pytest.warns(UserWarning, match="ignored with adafactor"):
        make_optimizer(encoder_lr=1e-3, weights_lr=0.1, weight_decay=0.01,
                       use_adafactor=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        make_optimizer(encoder_lr=1e-3, weights_lr=0.1, use_adafactor=True)


def test_bm25_score_cache_bounded_by_bytes():
    """Full-corpus vectors are n_docs*4 bytes each; the cache evicts
    oldest-first under a byte budget instead of clearing wholesale."""
    from mfar_tpu.sparse import bm25 as bm25_mod
    from mfar_tpu.sparse.bm25 import BM25Index

    idx = BM25Index.create([("a", "red shoe"), ("b", "blue shoe")])
    old = bm25_mod._SCORE_CACHE_MAX_BYTES
    bm25_mod._SCORE_CACHE_MAX_BYTES = 3 * 8  # three 2-float vectors
    try:
        idx._score_cache.clear()
        idx._score_cache_bytes = 0
        for q in ("q1 red", "q2 blue", "q3 shoe", "q4 red"):
            idx.get_scores(q)
        assert len(idx._score_cache) <= 3
        assert "q1 red" not in idx._score_cache  # oldest evicted
        assert "q4 red" in idx._score_cache
        assert idx._score_cache_bytes <= bm25_mod._SCORE_CACHE_MAX_BYTES
    finally:
        bm25_mod._SCORE_CACHE_MAX_BYTES = old


def test_encoder_config_rejects_unknown_policy_strings():
    from mfar_tpu.models.encoder import EncoderConfig

    with pytest.raises(ValueError, match="remat_policy"):
        EncoderConfig(remat_policy="attn-out")  # hyphen typo
    with pytest.raises(ValueError, match="attention_impl"):
        EncoderConfig(attention_impl="Flash")
