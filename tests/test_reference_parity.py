"""Direct numeric parity against the REFERENCE's own loss/mixer code.

The rest of the suite checks our losses against independent numpy
derivations; this file closes the loop by importing the reference's torch
modules (mfar/modeling/losses.py, mfar/modeling/weighting.py) and driving
BOTH implementations with identical inputs across the branch matrix
(contrastive / decomposed / hybrid / simple, query-cond on/off, reverse
on/off, batchnorm on/off, temperature).  Any semantic drift the numpy
derivations might share with the JAX code is caught here.

Harness notes (facts about the reference, not changes to it):

- Single-process ``HybridContrastiveLoss`` cannot run as written: its
  ``gather_all_embeddings`` only defines the flattened text lists inside the
  ``use_multi_gpu`` branch (reference mfar/modeling/losses.py:254-273), so a
  no-distributed call raises NameError.  The reference always runs under
  Lightning DDP (even on 1 GPU), where torch.distributed IS initialized --
  we reproduce that posture with a world-size-1 gloo process group.
- The sparse score stack is hard-wired to ``.cuda()`` (reference
  losses.py:323-325); on this CPU-only host the test maps that to a no-op.
- The reference's decomposed/hybrid in-batch path only supports ONE hard
  negative per query: ``d_neg.permute(0, 2, 1, 3).view(...)`` (reference
  losses.py:186) raises on the non-contiguous permute whenever
  neg_samples_per_query > 1; it only happens to work at the reference's
  n_sample=1 default (commands/train.py:40), where the permuted tensor is
  view-compatible.  Parity for those branches is therefore pinned at Nn=1
  (the configuration every reference run uses); our implementation's Nn>1
  behavior is covered by the numpy-derivation tests in test_losses.py.
"""

import os
import pickle
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE = "/root/reference"
if not os.path.isdir(os.path.join(REFERENCE, "mfar")):  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

torch = pytest.importorskip("torch")
sys.path.insert(0, REFERENCE)

from mfar.modeling.losses import (  # noqa: E402
    ContrastiveLoss,
    DecomposedContrastiveLoss,
    HybridContrastiveLoss,
)
from mfar.modeling.weighting import LinearWeights  # noqa: E402

from mfar_tpu.ops.scoring import softmax_field_weights  # noqa: E402
from mfar_tpu.train.losses import (  # noqa: E402
    contrastive_loss,
    decomposed_contrastive_loss,
    decomposed_simple_loss,
    hybrid_contrastive_loss,
)

B, E, FD, FS, NN = 5, 16, 3, 2, 2  # queries, emb, dense/sparse fields, negs
TOL = dict(rtol=2e-5, atol=2e-5)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="module")
def world(rng):
    """One shared random world: embeddings, mixer weights, sparse scores."""
    d = dict(
        q=rng.normal(size=(B, E)).astype(np.float32),
        d_pos=rng.normal(size=(B, FD, E)).astype(np.float32),
        d_neg=rng.normal(size=(B, FD, NN, E)).astype(np.float32),
        d_neg1=rng.normal(size=(B, FD, 1, E)).astype(np.float32),
        sparse_neg1=rng.normal(size=(B, B, FS)).astype(np.float32),
        W=rng.normal(size=(E, FD + FS)).astype(np.float32) * 0.3,
        W_dense=rng.normal(size=(E, FD)).astype(np.float32) * 0.3,
        W_global=rng.normal(size=(FD, 1)).astype(np.float32),
        sparse_pos=rng.normal(size=(B, B, FS)).astype(np.float32),
        sparse_neg=rng.normal(size=(B, B * NN, FS)).astype(np.float32),
        d1_pos=rng.normal(size=(B, E)).astype(np.float32),
        d1_neg=rng.normal(size=(B, NN, E)).astype(np.float32),
    )
    return d


def torch_linear_weights(W: np.ndarray, query_cond: bool) -> LinearWeights:
    lw = LinearWeights(W.shape[0], W.shape[1], query_cond=query_cond)
    with torch.no_grad():
        lw.weight.copy_(torch.from_numpy(W))
    return lw


def jax_mix_fn(W: np.ndarray, query_cond: bool):
    """Our mixer as a mix_fn closure -- same math path the trainer uses
    (FieldMixer / softmax_field_weights over [E, F] or global [F, 1])."""

    def mix(components, q):
        w = softmax_field_weights(jnp.asarray(W), q if query_cond else None)
        w = jnp.broadcast_to(w, (components.shape[0], w.shape[-1]))
        return jnp.einsum("qdf,qf->qd", components.astype(jnp.float32), w)

    return mix


# ---------------------------------------------------------------------------
# Mixer


@pytest.mark.parametrize("query_cond", [True, False])
def test_linear_weights_parity(world, query_cond):
    """softmax field mixing == reference LinearWeights, both weight layouts
    ([E, F] query-conditioned; [F, 1] global, reference
    contrastive.py:277-283)."""
    W = world["W_dense"] if query_cond else world["W_global"]
    x = np.random.default_rng(1).normal(size=(B, 7, FD)).astype(np.float32)
    ref = torch_linear_weights(W, query_cond)(
        torch.from_numpy(x), torch.from_numpy(world["q"])
    )
    got = jax_mix_fn(W, query_cond)(jnp.asarray(x), jnp.asarray(world["q"]))
    np.testing.assert_allclose(np.asarray(got), ref.detach().numpy(), **TOL)


# ---------------------------------------------------------------------------
# Single-vector ContrastiveLoss


@pytest.mark.parametrize("reverse", [True, False])
@pytest.mark.parametrize("temperature", [0.05, 0.01])
def test_contrastive_loss_parity(world, reverse, temperature):
    ref_loss = ContrastiveLoss(
        temperature=temperature, reverse=reverse, all_gather_multi_gpu=False
    )
    ref = ref_loss(
        torch.from_numpy(world["q"]),
        torch.from_numpy(world["d1_pos"]),
        torch.from_numpy(world["d1_neg"]),
    )
    got = contrastive_loss(
        jnp.asarray(world["q"]),
        jnp.asarray(world["d1_pos"]),
        jnp.asarray(world["d1_neg"]),
        temperature=temperature,
        reverse=reverse,
    )
    np.testing.assert_allclose(float(got), float(ref), **TOL)


def test_contrastive_simple_loss_parity(world):
    ref_loss = ContrastiveLoss(
        temperature=0.05, in_batch_negative=False, all_gather_multi_gpu=False
    )
    ref = ref_loss(
        torch.from_numpy(world["q"]),
        torch.from_numpy(world["d1_pos"]),
        torch.from_numpy(world["d1_neg"]),
    )
    got = contrastive_loss(
        jnp.asarray(world["q"]),
        jnp.asarray(world["d1_pos"]),
        jnp.asarray(world["d1_neg"]),
        temperature=0.05,
        in_batch=False,
    )
    np.testing.assert_allclose(float(got), float(ref), **TOL)


# ---------------------------------------------------------------------------
# DecomposedContrastiveLoss


@pytest.mark.parametrize("query_cond", [True, False])
@pytest.mark.parametrize("reverse", [True, False])
def test_decomposed_loss_parity(world, query_cond, reverse):
    W = world["W_dense"] if query_cond else world["W_global"]
    ref_loss = DecomposedContrastiveLoss(
        temperature=0.05,
        reverse=reverse,
        all_gather_multi_gpu=False,
        mixture_of_fields_layer=torch_linear_weights(W, query_cond),
    )
    ref = ref_loss(
        torch.from_numpy(world["q"]),
        torch.from_numpy(world["d_pos"]),
        torch.from_numpy(world["d_neg1"]),
    )
    got = decomposed_contrastive_loss(
        jnp.asarray(world["q"]),
        jnp.asarray(world["d_pos"]),
        jnp.asarray(world["d_neg1"]),
        jax_mix_fn(W, query_cond),
        temperature=0.05,
        reverse=reverse,
    )
    np.testing.assert_allclose(float(got), float(ref), **TOL)


def test_decomposed_simple_loss_parity(world):
    """in_batch_negative=False multi-field branch (reference simple_loss,
    losses.py:87-110 with multi_fields=True)."""
    W = world["W_dense"]
    ref_loss = DecomposedContrastiveLoss(
        temperature=0.05,
        in_batch_negative=False,
        all_gather_multi_gpu=False,
        mixture_of_fields_layer=torch_linear_weights(W, True),
    )
    ref = ref_loss(
        torch.from_numpy(world["q"]),
        torch.from_numpy(world["d_pos"]),
        torch.from_numpy(world["d_neg"]),
    )
    got = decomposed_simple_loss(
        jnp.asarray(world["q"]),
        jnp.asarray(world["d_pos"]),
        jnp.asarray(world["d_neg"]),
        jax_mix_fn(W, True),
        temperature=0.05,
    )
    np.testing.assert_allclose(float(got), float(ref), **TOL)


# ---------------------------------------------------------------------------
# HybridContrastiveLoss (world-size-1 process group; see module docstring)


@pytest.fixture(scope="module")
def dist_group():
    if not torch.distributed.is_available():  # pragma: no cover
        pytest.skip("torch.distributed unavailable")
    torch.distributed.init_process_group(
        "gloo", init_method="tcp://127.0.0.1:29712", rank=0, world_size=1
    )
    yield
    torch.distributed.destroy_process_group()


class FakeSparseIndex:
    """Stands in for the reference BM25sSparseIndex: returns the SAME sparse
    score values our loss receives as dense [.., Fs] tensors."""

    def __init__(self, table):
        self.table = table  # (query_text, doc_id) -> float

    def score_batch(self, queries, doc_ids):
        return torch.tensor(
            [[self.table[(q, d)] for d in doc_ids] for q in queries],
            dtype=torch.float32,
        )


@pytest.mark.parametrize("use_batchnorm", [False, True])
@pytest.mark.parametrize("reverse", [True, False])
def test_hybrid_loss_parity(world, dist_group, monkeypatch, use_batchnorm, reverse):
    """The full mFAR training loss: dense components + live sparse scores +
    optional field batchnorm + query-conditioned mixing + bidirectional NLL
    (reference losses.py:206-360) vs our global-batch hybrid loss."""
    monkeypatch.setattr(
        torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False
    )
    queries = [f"query {i}" for i in range(B)]
    pos_ids = [f"pos{i}" for i in range(B)]
    neg_ids = [f"neg{b}" for b in range(B)]  # Nn=1 (see module docstring)
    query_ids = list(range(B))

    indices = {}
    for s in range(FS):
        table = {}
        for qi, qt in enumerate(queries):
            for m, d in enumerate(pos_ids):
                table[(qt, d)] = float(world["sparse_pos"][qi, m, s])
            for m, d in enumerate(neg_ids):
                table[(qt, d)] = float(world["sparse_neg1"][qi, m, s])
        indices[f"f{s}_sparse"] = FakeSparseIndex(table)

    W = world["W"]
    ref_loss = HybridContrastiveLoss(
        temperature=0.05,
        reverse=reverse,
        mixture_of_fields_layer=torch_linear_weights(W, True),
        sparse_indices_dict=indices,
        num_fields=FD + FS,
        use_batchnorm=use_batchnorm,
    )
    ref = ref_loss(
        torch.from_numpy(world["q"]),
        pickle.dumps(queries),
        torch.from_numpy(world["d_pos"]),
        pickle.dumps(pos_ids),
        torch.from_numpy(world["d_neg1"]),
        pickle.dumps(neg_ids),
        pickle.dumps(query_ids),
        sparse_scores={},  # no cache -> live score_batch path
    )

    normalize_fn = None
    if use_batchnorm:
        import flax.linen as nn

        bn = nn.BatchNorm(axis=-1, momentum=0.9, epsilon=1e-5)
        variables = bn.init(
            __import__("jax").random.PRNGKey(0),
            jnp.zeros((1, 1, FD + FS)),
            use_running_average=False,
        )

        def normalize_fn(x):
            out, _ = bn.apply(
                variables, x, use_running_average=False, mutable=["batch_stats"]
            )
            return out

    got = hybrid_contrastive_loss(
        jnp.asarray(world["q"]),
        jnp.asarray(world["d_pos"]),
        jnp.asarray(world["d_neg1"]),
        jnp.asarray(world["sparse_pos"]),
        jnp.asarray(world["sparse_neg1"]),
        jax_mix_fn(W, True),
        temperature=0.05,
        reverse=reverse,
        normalize_fn=normalize_fn,
    )
    np.testing.assert_allclose(float(got), float(ref), **TOL)


def test_hybrid_loss_no_sparse_matches_decomposed(world, dist_group, monkeypatch):
    """Hybrid with zero sparse fields == decomposed (reference empty-dict
    branch, losses.py:324-325)."""
    monkeypatch.setattr(
        torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False
    )
    W = world["W_dense"]
    queries = [f"query {i}" for i in range(B)]
    ref_loss = HybridContrastiveLoss(
        temperature=0.05,
        mixture_of_fields_layer=torch_linear_weights(W, True),
        sparse_indices_dict={},
        num_fields=FD,
    )
    ref = ref_loss(
        torch.from_numpy(world["q"]),
        pickle.dumps(queries),
        torch.from_numpy(world["d_pos"]),
        pickle.dumps([f"pos{i}" for i in range(B)]),
        torch.from_numpy(world["d_neg1"]),
        pickle.dumps([f"neg{b}" for b in range(B)]),
        pickle.dumps(list(range(B))),
        sparse_scores={},
    )
    got = decomposed_contrastive_loss(
        jnp.asarray(world["q"]),
        jnp.asarray(world["d_pos"]),
        jnp.asarray(world["d_neg1"]),
        jax_mix_fn(W, True),
        temperature=0.05,
    )
    np.testing.assert_allclose(float(got), float(ref), **TOL)
