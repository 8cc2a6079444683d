import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfar_tpu.train.losses import (
    contrastive_loss,
    decomposed_simple_loss,
    dense_field_components,
    hybrid_contrastive_loss,
)

B, F, Nn, E, S = 5, 3, 2, 8, 2


def softmax_np(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def log_softmax_np(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=axis, keepdims=True))


def mix_np(comp, q, W):
    w = softmax_np(q @ W)
    return np.einsum("qdf,qf->qd", comp, w)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return dict(
        q=rng.normal(size=(B, E)).astype(np.float32),
        d_pos=rng.normal(size=(B, F, E)).astype(np.float32),
        d_neg=rng.normal(size=(B, F, Nn, E)).astype(np.float32),
        sp=rng.normal(size=(B, B, S)).astype(np.float32),
        sn=rng.normal(size=(B, B * Nn, S)).astype(np.float32),
        W=rng.normal(size=(E, F + S)).astype(np.float32),
        Wd=rng.normal(size=(E, F)).astype(np.float32),
    )


def manual_hybrid_loss(q, d_pos, d_neg, sp, sn, W, temp, reverse=True):
    """Independent numpy re-derivation of the mFAR loss for cross-checking."""
    pos_dense = np.einsum("be,mfe->bmf", q, d_pos) / temp  # [B, B, F]
    flat = d_neg.transpose(0, 2, 1, 3).reshape(B * Nn, F, E)
    neg_dense = np.einsum("be,mfe->bmf", q, flat) / temp  # [B, B*Nn, F]
    pos_comp = np.concatenate([pos_dense, sp], -1) if sp is not None else pos_dense
    neg_comp = np.concatenate([neg_dense, sn], -1) if sn is not None else neg_dense
    comp = np.concatenate([pos_comp, neg_comp], 1)  # [B, B+B*Nn, Ftot]
    scores = mix_np(comp, q, W)
    logp = log_softmax_np(scores)
    nll = -np.mean(np.diagonal(logp[:, :B]))
    if reverse:
        rev_dense = np.einsum("ge,mfe->gmf", q, d_pos) / temp
        rev_comp = np.concatenate([rev_dense, sp], -1) if sp is not None else rev_dense
        rev = mix_np(rev_comp, q, W).T  # [docs, queries]
        logp_r = log_softmax_np(rev)
        nll += -np.mean(np.diagonal(logp_r[:, :B]))
    return nll


def _mk_mix(W):
    def mix_fn(comp, q):
        w = jax.nn.softmax(jnp.dot(q, jnp.asarray(W)), axis=-1)
        return jnp.einsum("qdf,qf->qd", comp, w)

    return mix_fn


def test_hybrid_loss_matches_manual(data):
    d = data
    got = hybrid_contrastive_loss(
        jnp.asarray(d["q"]), jnp.asarray(d["d_pos"]), jnp.asarray(d["d_neg"]),
        jnp.asarray(d["sp"]), jnp.asarray(d["sn"]),
        mix_fn=_mk_mix(d["W"]), temperature=0.05, reverse=True,
    )
    want = manual_hybrid_loss(d["q"], d["d_pos"], d["d_neg"], d["sp"], d["sn"], d["W"], 0.05)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_dense_only_decomposed(data):
    d = data
    got = hybrid_contrastive_loss(
        jnp.asarray(d["q"]), jnp.asarray(d["d_pos"]), jnp.asarray(d["d_neg"]),
        None, None, mix_fn=_mk_mix(d["Wd"]), temperature=0.05,
    )
    want = manual_hybrid_loss(d["q"], d["d_pos"], d["d_neg"], None, None, d["Wd"], 0.05)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_temperature_hits_dense_not_sparse(data):
    """Scaling temperature changes dense components only; verify the sparse
    block is untouched by comparing against a manual recompute."""
    d = data
    for temp in (0.01, 1.0):
        got = hybrid_contrastive_loss(
            jnp.asarray(d["q"]), jnp.asarray(d["d_pos"]), jnp.asarray(d["d_neg"]),
            jnp.asarray(d["sp"]), jnp.asarray(d["sn"]),
            mix_fn=_mk_mix(d["W"]), temperature=temp,
        )
        want = manual_hybrid_loss(d["q"], d["d_pos"], d["d_neg"], d["sp"], d["sn"], d["W"], temp)
        np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_perfect_alignment_gives_low_loss():
    """Orthonormal positives aligned with queries -> near-zero loss."""
    q = np.eye(4, 8, dtype=np.float32) * 10
    d_pos = np.repeat(q[:, None, :], 2, axis=1).astype(np.float32)  # same vector per field
    d_neg = np.zeros((4, 2, 1, 8), np.float32)
    loss = hybrid_contrastive_loss(
        jnp.asarray(q), jnp.asarray(d_pos), jnp.asarray(d_neg), None, None,
        mix_fn=_mk_mix(np.zeros((8, 2), np.float32)), temperature=0.05,
    )
    assert float(loss) < 1e-3


def test_contrastive_loss_single_vector(data):
    d = data
    q, dp = d["q"], d["d_pos"][:, 0]
    dn = d["d_neg"][:, 0]
    got = contrastive_loss(jnp.asarray(q), jnp.asarray(dp), jnp.asarray(dn), temperature=0.05)
    pos = q @ dp.T / 0.05
    neg = q @ dn.reshape(-1, E).T / 0.05
    scores = np.concatenate([pos, neg], 1)
    want = -np.mean(np.diagonal(log_softmax_np(scores)[:, :B]))
    rev = dp @ q.T / 0.05
    want += -np.mean(np.diagonal(log_softmax_np(rev)[:, :B]))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_neg_flattening_doc_major(data):
    d = data
    _, neg = dense_field_components(
        jnp.asarray(d["q"]), jnp.asarray(d["d_pos"]), jnp.asarray(d["d_neg"]), 1.0
    )
    # column m*Nn+j must be doc m's j-th negative
    m, j = 3, 1
    want = d["q"] @ d["d_neg"][m, :, j, :].T  # [B, F]
    np.testing.assert_allclose(np.asarray(neg)[:, m * Nn + j, :], want, rtol=1e-5)


def test_decomposed_simple_loss_matches_manual(data):
    """Multi-field in_batch_negative=False branch (reference
    mfar/modeling/losses.py:86-110): own positive at column 0, own negatives
    only, per-field scores mixed, no reverse, no sparse."""
    d = data
    got = decomposed_simple_loss(
        jnp.asarray(d["q"]), jnp.asarray(d["d_pos"]), jnp.asarray(d["d_neg"]),
        mix_fn=_mk_mix(d["Wd"]), temperature=0.05,
    )
    w = softmax_np(d["q"] @ d["Wd"])  # [B, F]
    pos_pf = np.einsum("be,bfe->bf", d["q"], d["d_pos"]) / 0.05  # [B, F]
    neg_pf = np.einsum("be,bfne->bnf", d["q"], d["d_neg"]) / 0.05  # [B, Nn, F]
    scores = np.concatenate(
        [np.einsum("bf,bf->b", pos_pf, w)[:, None], np.einsum("bnf,bf->bn", neg_pf, w)],
        axis=1,
    )
    want = -np.mean(log_softmax_np(scores)[:, 0])
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_simple_loss_perfect_alignment():
    """Aligned positives + orthogonal negatives -> near-zero simple loss."""
    q = np.eye(4, 8, dtype=np.float32) * 10
    d_pos = np.repeat(q[:, None, :], 2, axis=1)
    d_neg = np.zeros((4, 2, 3, 8), np.float32)
    loss = decomposed_simple_loss(
        jnp.asarray(q), jnp.asarray(d_pos), jnp.asarray(d_neg),
        mix_fn=_mk_mix(np.zeros((8, 2), np.float32)), temperature=0.05,
    )
    assert float(loss) < 1e-3


def test_model_simple_loss_branch():
    """MFARModel(in_batch=False) routes compute_loss through the simple
    loss (finite, differs from the in-batch loss on the same batch)."""
    from mfar_tpu.models import EncoderConfig
    from mfar_tpu.train.model import MFARModel
    from mfar_tpu.train.optim import make_optimizer
    from mfar_tpu.train.train_step import init_state

    rng = np.random.default_rng(0)
    toks = lambda n, s: {
        "input_ids": jnp.asarray(rng.integers(4, 64, size=(n, s)), jnp.int32),
        "attention_mask": jnp.ones((n, s), jnp.int32),
    }
    batch = dict(
        query=toks(4, 8),
        pos={"a_dense": toks(4, 8), "b_dense": toks(4, 8)},
        neg={"a_dense": toks(8, 8), "b_dense": toks(8, 8)},
    )
    cfg = EncoderConfig.tiny(vocab_size=64, hidden_size=16, num_layers=1, num_heads=2)
    losses = {}
    for in_batch in (True, False):
        model = MFARModel(encoder_config=cfg, num_fields=2, in_batch=in_batch)
        state = init_state(model, make_optimizer(1e-4, 1e-1), seed=0)
        losses[in_batch] = float(
            model.apply(
                {"params": state.params},
                batch["query"], batch["pos"], batch["neg"], None, None,
                train=False, method=model.compute_loss,
            )
        )
    assert np.isfinite(losses[False]) and losses[False] > 0
    assert abs(losses[True] - losses[False]) > 1e-6

    # Hybrid + in_batch=False is a reference-identical dead end (its
    # simple_loss feeds dense-only components into an all-fields mixer,
    # losses.py:87-110): must fail with a clear error, not a shape crash.
    hybrid = MFARModel(encoder_config=cfg, num_fields=3, in_batch=False)
    state = init_state(hybrid, make_optimizer(1e-4, 1e-1), seed=0)
    sp = jnp.zeros((4, 4, 1), jnp.float32)
    sn = jnp.zeros((4, 8, 1), jnp.float32)
    import pytest

    with pytest.raises(ValueError, match="dense-only"):
        hybrid.apply(
            {"params": state.params},
            batch["query"], batch["pos"], batch["neg"], sp, sn,
            train=False, method=hybrid.compute_loss,
        )


def test_loss_sharded_batch_matches_single_device(data):
    """GSPMD: batch sharded over 8 devices gives the identical global loss."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mfar_tpu.parallel.mesh import make_mesh

    d = data
    rng = np.random.default_rng(7)
    Bg = 8
    q = rng.normal(size=(Bg, E)).astype(np.float32)
    d_pos = rng.normal(size=(Bg, F, E)).astype(np.float32)
    d_neg = rng.normal(size=(Bg, F, Nn, E)).astype(np.float32)

    mix_fn = _mk_mix(d["Wd"])

    def loss(q_, p_, n_):
        return hybrid_contrastive_loss(q_, p_, n_, None, None, mix_fn=mix_fn, temperature=0.05)

    single = float(loss(jnp.asarray(q), jnp.asarray(d_pos), jnp.asarray(d_neg)))

    mesh = make_mesh(n_data=8)
    shard = NamedSharding(mesh, P("data"))
    qs = jax.device_put(q, shard)
    ps = jax.device_put(d_pos, shard)
    ns = jax.device_put(d_neg, shard)
    sharded = float(jax.jit(loss)(qs, ps, ns))
    np.testing.assert_allclose(sharded, single, rtol=1e-5)
