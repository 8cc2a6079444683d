"""The flagship model: shared encoder + query-conditioned field mixer (+BN).

Bundles what the reference spreads across ``RetrievalTrainingModule``,
``LinearWeights`` and ``HybridContrastiveLoss``'s BatchNorm (reference:
mfar/modeling/contrastive.py:277-293, mfar/modeling/weighting.py:3-29,
mfar/modeling/losses.py:220-223) into one Flax module with three parameter
groups -- ``encoder``, ``mixer``, ``bn`` -- which is exactly the split the
two-learning-rate optimizer needs (reference:
mfar/modeling/contrastive.py:305-374).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mfar_tpu.models import build_encoder, encoder_dim
from mfar_tpu.models.encoder import EncoderConfig
from mfar_tpu.train.losses import decomposed_simple_loss, hybrid_contrastive_loss


class FieldMixer(nn.Module):
    """softmax(q @ W) field weights, ones-initialized like the reference
    (mfar/modeling/weighting.py:14); ``query_cond=False`` learns a single
    global distribution."""

    num_fields: int
    emb_size: int
    query_cond: bool = True

    @nn.compact
    def __call__(self, components: jax.Array, q: jax.Array) -> jax.Array:
        # components: [Q, D, F]; q: [Q, E] -> [Q, D]
        rows = self.emb_size if self.query_cond else 1
        w = self.param("weight", nn.initializers.ones, (rows, self.num_fields))
        if self.query_cond:
            logits = jnp.dot(q.astype(jnp.float32), w, preferred_element_type=jnp.float32)
        else:
            logits = jnp.broadcast_to(w, (q.shape[0], self.num_fields))
        weights = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("qdf,qf->qd", components.astype(jnp.float32), weights)

    @staticmethod
    def weights_of(params: Dict, q: Optional[jax.Array]) -> jax.Array:
        """Softmax field weights from a param subtree (serving path)."""
        w = params["weight"]
        if w.shape[0] > 1:
            if q is None:
                # softmax(w[0]) would be the weights conditioned on one
                # arbitrary embedding dimension -- plausible-looking garbage
                raise ValueError(
                    f"query-conditioned mixer ({w.shape}) needs q"
                )
            logits = jnp.dot(q.astype(jnp.float32), w)
        else:
            logits = jnp.broadcast_to(w[:1], (q.shape[0] if q is not None else 1, w.shape[1]))
        return jax.nn.softmax(logits, axis=-1)


class MFARModel(nn.Module):
    """Encoder + mixer (+ field batchnorm) with a jit-able training loss."""

    encoder_config: Any  # EncoderConfig (BERT) or T5Config (GTR)
    num_fields: int  # total fields: dense + sparse, dense first
    query_cond: bool = True
    use_batchnorm: bool = False
    temperature: float = 0.05
    reverse: bool = True
    in_batch: bool = True  # False: own-negatives-only simple loss (reference
    #                        in_batch_negative=False, losses.py:86-110)

    def setup(self):
        self.encoder = build_encoder(self.encoder_config, name="encoder")
        self.mixer = FieldMixer(
            self.num_fields,
            encoder_dim(self.encoder_config),
            self.query_cond,
            name="mixer",
        )
        if self.use_batchnorm:
            # Stats over (queries, docs) per field; torch BatchNorm1d
            # momentum 0.1 == flax momentum 0.9 (decay convention).
            self.bn = nn.BatchNorm(axis=-1, momentum=0.9, epsilon=1e-5, name="bn")

    def encode(self, input_ids, attention_mask, deterministic: bool = True):
        return self.encoder(input_ids, attention_mask, deterministic=deterministic)

    def mix(self, components, q):
        return self.mixer(components, q)

    def normalize_components(self, components, train: bool):
        if not self.use_batchnorm:
            return components
        return self.bn(components, use_running_average=not train)

    def __call__(self, input_ids, attention_mask):
        """Default apply = query encoding (used for init)."""
        q = self.encode(input_ids, attention_mask)
        # Touch mixer/bn params so init creates them.
        comp = jnp.zeros((q.shape[0], 1, self.num_fields), jnp.float32)
        comp = self.normalize_components(comp, train=False)
        _ = self.mix(comp, q)
        return q

    def compute_loss(
        self,
        query_tokens: Dict[str, jax.Array],
        pos_tokens: Dict[str, Dict[str, jax.Array]],  # per dense field key
        neg_tokens: Dict[str, Dict[str, jax.Array]],
        sparse_pos: Optional[jax.Array],  # [B, B, Fs]
        sparse_neg: Optional[jax.Array],  # [B, B*Nn, Fs]
        train: bool = True,
    ) -> jax.Array:
        """Full training-step forward: the reference's 1 + 2*|dense fields|
        encoder passes (mfar/modeling/contrastive.py:409-446), here batched
        by sequence length -- every (query/pos/neg, field) text padded to the
        same per-field budget rides ONE encoder call, so the MXU sees a few
        large batches instead of 1+2F small ones (same math: the encoder is
        row-independent)."""
        det = not train
        field_keys = sorted(pos_tokens.keys())
        jobs = [("q", None, query_tokens)]
        jobs += [("pos", fk, pos_tokens[fk]) for fk in field_keys]
        if neg_tokens:
            # all dense fields carry negatives or none do (collate invariant)
            jobs += [("neg", fk, neg_tokens[fk]) for fk in field_keys]

        by_len: Dict[int, list] = {}
        for job in jobs:
            by_len.setdefault(job[2]["input_ids"].shape[-1], []).append(job)
        outputs: Dict[Any, jax.Array] = {}
        for group in by_len.values():
            ids = jnp.concatenate([t["input_ids"] for _, _, t in group], axis=0)
            mask = jnp.concatenate([t["attention_mask"] for _, _, t in group], axis=0)
            embs = self.encode(ids, mask, det)
            start = 0
            for tag, fk, t in group:
                rows = t["input_ids"].shape[0]
                outputs[(tag, fk)] = embs[start : start + rows]
                start += rows

        q = outputs[("q", None)]
        if field_keys:
            pos_embs = jnp.stack([outputs[("pos", fk)] for fk in field_keys], axis=1)  # [B, Fd, E]
        else:
            pos_embs = jnp.zeros((q.shape[0], 0, q.shape[-1]), q.dtype)
        if field_keys and neg_tokens:
            b = q.shape[0]
            neg_stack = jnp.stack(
                [outputs[("neg", fk)] for fk in field_keys], axis=1
            )  # [B*Nn, Fd, E]  (b-major: row b*Nn+j is item b's j-th negative)
            nn_ = neg_stack.shape[0] // b
            neg_embs = neg_stack.reshape(b, nn_, len(field_keys), -1).transpose(0, 2, 1, 3)
        else:
            neg_embs = None
            sparse_neg = None

        if not self.in_batch:
            assert neg_embs is not None, "simple loss needs sampled negatives"
            if len(field_keys) != self.num_fields:
                # Reference-identical limitation, surfaced early: its
                # simple_loss (losses.py:87-110) feeds DENSE-only components
                # into a mixer sized to all fields, so hybrid schemas crash
                # there too (in_batch_negative=False never composes with
                # sparse fields in either implementation).
                raise ValueError(
                    f"in_batch=False (simple loss) supports dense-only "
                    f"schemas: the mixer spans {self.num_fields} fields but "
                    f"only {len(field_keys)} dense components exist. Drop "
                    f"the sparse fields or use in-batch negatives."
                )
            return decomposed_simple_loss(
                q.astype(jnp.float32),
                pos_embs.astype(jnp.float32),
                neg_embs.astype(jnp.float32),
                mix_fn=self.mix,
                temperature=self.temperature,
            )
        return hybrid_contrastive_loss(
            q.astype(jnp.float32),
            pos_embs.astype(jnp.float32),
            None if neg_embs is None else neg_embs.astype(jnp.float32),
            sparse_pos,
            sparse_neg,
            mix_fn=self.mix,
            temperature=self.temperature,
            reverse=self.reverse,
            normalize_fn=lambda c: self.normalize_components(c, train),
        )
