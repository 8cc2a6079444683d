"""Contrastive loss family, written in global-batch form.

The reference implements in-batch negatives with explicit NCCL choreography:
differentiable all_gather of embeddings, per-rank score slices, rank-sliced
softmax diagonals, and an all_reduce mean (reference:
mfar/modeling/losses.py:42-84).  That choreography is just the DDP
decomposition of one *global* loss -- so the TPU-native form computes the
loss over the global batch directly and lets GSPMD partition it: with the
batch sharded over the ``data`` mesh axis, XLA inserts exactly the
all-gathers the reference hand-wrote, and the gradient flows through them
natively.

Loss hierarchy parity (reference mfar/modeling/losses.py:12,113,149,206):

- :func:`contrastive_loss`          <-> ContrastiveLoss (single vector)
- :func:`decomposed_contrastive_loss` <-> DecomposedContrastiveLoss
  (per-field score components mixed by query-conditioned softmax weights)
- :func:`hybrid_contrastive_loss`   <-> HybridContrastiveLoss
  (+ per-field BM25 sparse scores concatenated before mixing)

Parity details preserved (SURVEY.md section 7 "hard parts"):

- temperature divides *dense* score components only, never sparse
  (reference: mfar/modeling/losses.py:184-187 vs :303-325);
- optional batchnorm over the field axis of the concatenated score tensor
  (reference: mfar/modeling/losses.py:220-223,346);
- bidirectional loss: query->doc plus doc->query with the *global* query
  embeddings conditioning the reverse-direction field weights
  (reference: mfar/modeling/losses.py:297-300,352-360);
- negatives enter the softmax denominator for every query (in-batch).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

# normalize_fn: [Q, D, F] score components -> same shape (batchnorm or identity)
NormalizeFn = Callable[[jax.Array], jax.Array]
# mix_fn: (components [Q, D, F], query_embs [Q, E]) -> [Q, D]
MixFn = Callable[[jax.Array, jax.Array], jax.Array]


def _diag_nll(scores: jax.Array) -> jax.Array:
    """-mean(log softmax diagonal): row b's positive is column b."""
    log_probs = jax.nn.log_softmax(scores, axis=-1)
    diag = jnp.diagonal(log_probs[:, : scores.shape[0]])
    return -jnp.mean(diag)


def contrastive_loss(
    q: jax.Array,  # [B, E]
    d_pos: jax.Array,  # [B, E]
    d_neg: Optional[jax.Array],  # [B, Nn, E]
    temperature: float = 0.01,
    reverse: bool = True,
    in_batch: bool = True,
) -> jax.Array:
    """Single-vector InfoNCE with in-batch + explicit negatives."""
    if in_batch:
        pos = jnp.dot(q, d_pos.T, preferred_element_type=jnp.float32) / temperature
        parts = [pos]
        if d_neg is not None and d_neg.size:
            neg = (
                jnp.dot(q, d_neg.reshape(-1, d_neg.shape[-1]).T, preferred_element_type=jnp.float32)
                / temperature
            )
            parts.append(neg)
        scores = jnp.concatenate(parts, axis=1)
        nll = _diag_nll(scores)
        if reverse:
            rev = jnp.dot(d_pos, q.T, preferred_element_type=jnp.float32) / temperature
            nll = nll + _diag_nll(rev)
        return nll
    # simple (own-negatives-only) variant, reference mfar/modeling/losses.py:87-110
    pos = jnp.einsum("be,be->b", q, d_pos)[:, None] / temperature
    neg = jnp.einsum("be,bne->bn", q, d_neg) / temperature
    scores = jnp.concatenate([pos, neg], axis=1)
    return -jnp.mean(jax.nn.log_softmax(scores, axis=-1)[:, 0])


def dense_field_components(
    q: jax.Array,  # [B, E]
    d_pos: jax.Array,  # [B, F, E]
    d_neg: Optional[jax.Array],  # [B, F, Nn, E]
    temperature: float,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Per-field dense score components for every (query, global doc) pair.

    Negative docs flatten doc-major (doc m's negatives are contiguous),
    matching the reference's permute+view (mfar/modeling/losses.py:186)."""
    pos = jnp.einsum("be,mfe->bmf", q, d_pos, preferred_element_type=jnp.float32) / temperature
    neg = None
    if d_neg is not None and d_neg.size:
        b, f, nn_, e = d_neg.shape
        flat = jnp.transpose(d_neg, (0, 2, 1, 3)).reshape(b * nn_, f, e)
        neg = jnp.einsum("be,mfe->bmf", q, flat, preferred_element_type=jnp.float32) / temperature
    return pos, neg


def decomposed_simple_loss(
    q: jax.Array,  # [B, E]
    d_pos: jax.Array,  # [B, F, E]
    d_neg: jax.Array,  # [B, F, Nn, E]
    mix_fn: MixFn,
    temperature: float = 0.01,
) -> jax.Array:
    """Multi-field own-negatives-only loss: the ``in_batch_negative=False``
    branch of the decomposed/hybrid losses (reference:
    mfar/modeling/losses.py:86-110, dispatched at :133,:172,:240).

    Each query scores only its own positive and its own sampled negatives
    per field; the mixer folds the field axis; the positive sits at column
    0 of the softmax.  The reference applies neither sparse scores nor the
    reverse direction on this branch -- kept identical."""
    pos = jnp.einsum("be,bfe->bf", q, d_pos, preferred_element_type=jnp.float32)
    pos = pos[:, None, :] / temperature  # [B, 1, F]
    neg = (
        jnp.einsum("be,bfne->bnf", q, d_neg, preferred_element_type=jnp.float32)
        / temperature
    )  # [B, Nn, F]
    scores_pos = mix_fn(pos, q)  # [B, 1]
    scores_neg = mix_fn(neg, q)  # [B, Nn]
    all_scores = jnp.concatenate([scores_pos, scores_neg], axis=1)
    return -jnp.mean(jax.nn.log_softmax(all_scores, axis=-1)[:, 0])


def decomposed_contrastive_loss(
    q: jax.Array,
    d_pos: jax.Array,  # [B, F, E]
    d_neg: Optional[jax.Array],  # [B, F, Nn, E]
    mix_fn: MixFn,
    temperature: float = 0.01,
    reverse: bool = True,
) -> jax.Array:
    """Per-field decomposition, no sparse scores."""
    return hybrid_contrastive_loss(
        q, d_pos, d_neg, None, None, mix_fn, temperature=temperature, reverse=reverse
    )


def hybrid_contrastive_loss(
    q: jax.Array,  # [B, E]
    d_pos: jax.Array,  # [B, Fd, E]
    d_neg: Optional[jax.Array],  # [B, Fd, Nn, E]
    sparse_pos: Optional[jax.Array],  # [B, B, Fs] BM25(query b, pos doc m)
    sparse_neg: Optional[jax.Array],  # [B, B*Nn, Fs] doc-major flattened
    mix_fn: MixFn,
    temperature: float = 0.01,
    reverse: bool = True,
    normalize_fn: Optional[NormalizeFn] = None,
) -> jax.Array:
    """The full mFAR training loss in global-batch form."""
    normalize_fn = normalize_fn or (lambda x: x)

    dense_pos, dense_neg = dense_field_components(q, d_pos, d_neg, temperature)

    def with_sparse(dense, sparse):
        if sparse is None:
            return dense
        return jnp.concatenate([dense, sparse.astype(dense.dtype)], axis=-1)

    pos_comp = with_sparse(dense_pos, sparse_pos)  # [B, B, Ftot]
    if dense_neg is not None:
        neg_comp = with_sparse(dense_neg, sparse_neg)  # [B, B*Nn, Ftot]
        comp = jnp.concatenate([pos_comp, neg_comp], axis=1)
    else:
        comp = pos_comp
    comp = normalize_fn(comp)
    scores = mix_fn(comp, q)  # [B, B(+B*Nn)]
    nll = _diag_nll(scores)

    if reverse:
        # doc -> query: global queries score local (= global) positive docs;
        # the field weights condition on the *query* axis embeddings.
        rev_dense = (
            jnp.einsum("ge,mfe->gmf", q, d_pos, preferred_element_type=jnp.float32)
            / temperature
        )
        rev_comp = with_sparse(rev_dense, sparse_pos)
        # Second normalize_fn call per step is reference-identical: the
        # torch code batch-norms BOTH directions (losses.py:346 forward,
        # :359 reverse), so running stats update twice there too.
        rev_comp = normalize_fn(rev_comp)
        rev_scores = mix_fn(rev_comp, q)  # [B(queries), B(docs)]
        # rows = docs, columns = queries; diagonal pairs doc m with query m
        nll = nll + _diag_nll(rev_scores.T)
    return nll
