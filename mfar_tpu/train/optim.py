"""Two-group optimization: encoder LR vs mixer/bn ("weights") LR.

The reference runs two manually-stepped torch optimizers -- AdamW (or
Adafactor for T5) on encoder params at ``encoder_lr`` and AdamW on the
mixture/batchnorm params at ``weights_lr`` (reference:
mfar/modeling/contrastive.py:305-374, stepped manually at :448-463).  In
optax this is a single ``multi_transform`` over parameter labels, which
composes with pjit sharding for free.  ``freeze_encoder`` maps the encoder
group to ``set_to_zero`` (reference: mfar/modeling/util.py:42-45).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import optax


def param_labels(params: Dict[str, Any]) -> Dict[str, Any]:
    """Label each top-level parameter group: 'encoder' vs 'head'
    (mixer + batchnorm)."""
    import jax

    def label_tree(group_name, tree):
        return jax.tree.map(lambda _: group_name, tree)

    return {
        key: label_tree("encoder" if key == "encoder" else "head", sub)
        for key, sub in params.items()
    }


def make_optimizer(
    encoder_lr: float = 1e-4,
    weights_lr: Optional[float] = None,
    weight_decay: float = 0.0,
    freeze_encoder: bool = False,
    use_adafactor: bool = False,
) -> optax.GradientTransformation:
    if weights_lr is None:
        raise ValueError("weights_lr must be specified (mirrors the reference CLI contract)")
    if freeze_encoder:
        encoder_opt = optax.set_to_zero()
    elif use_adafactor:
        # T5-style memory-frugal optimizer (reference:
        # mfar/modeling/contrastive.py:321-341).  The reference's Adafactor
        # carries NO weight decay; surface (rather than silently drop) a
        # requested regularizer.
        if weight_decay:
            import warnings

            warnings.warn(
                f"weight_decay={weight_decay} is ignored with adafactor "
                f"(the reference's T5 optimizer has no decay either)",
                stacklevel=2,
            )
        encoder_opt = optax.adafactor(
            learning_rate=encoder_lr,
            multiply_by_parameter_scale=False,
            clipping_threshold=1.0,
            decay_rate=0.8,
        )
    else:
        encoder_opt = optax.adamw(encoder_lr, weight_decay=weight_decay)
    # torch AdamW's DEFAULT weight_decay (the reference passes none for the
    # head group, contrastive.py:343-347) is 0.01; optax's is 1e-4.
    head_opt = optax.adamw(weights_lr, weight_decay=0.01)
    return optax.multi_transform(
        {"encoder": encoder_opt, "head": head_opt}, param_labels
    )
