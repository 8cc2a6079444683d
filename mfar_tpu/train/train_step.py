"""The pjit-compiled training step.

One jitted function replaces the reference's Lightning manual-optimization
loop (reference: mfar/modeling/contrastive.py:448-463): forward (1 + 2*Fd
encoder passes), hybrid loss over the global batch, backward, two-group
optimizer update, batchnorm state update.  Sharding: batch arrays
P('data'), parameters by the rules in :mod:`mfar_tpu.parallel.sharding`
(replicated over 'data', tensor-sharded over 'model') -- GSPMD inserts the
gradient psums and in-batch all-gathers the reference hand-wrote with NCCL.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from mfar_tpu.train.model import MFARModel
from mfar_tpu.train.optim import make_optimizer


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array  # i32 scalar
    rng: jax.Array


def init_state(
    model: MFARModel,
    optimizer: optax.GradientTransformation,
    seed: int = 0,
    seq_len: int = 8,
) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    init_rng, state_rng = jax.random.split(rng)
    dummy = jnp.ones((1, seq_len), jnp.int32)
    variables = model.init({"params": init_rng}, dummy, dummy)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=state_rng,
    )


def make_train_step(model: MFARModel, optimizer: optax.GradientTransformation):
    """Returns train_step(state, batch) -> (state, metrics); jit/pjit-able.

    ``batch`` layout (all arrays, static shapes via bucketed padding):
      query:  {input_ids, attention_mask}            [B, Sq]
      pos:    {field_key: {input_ids, attention_mask}}  each [B, Sf]
      neg:    {field_key: {input_ids, attention_mask}}  each [B*Nn, Sf]
      sparse_pos: [B, B, Fs] or None
      sparse_neg: [B, B*Nn, Fs] or None
    """

    def train_step(state: TrainState, batch: Dict[str, Any]) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            variables = {"params": params}
            kwargs = {}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                kwargs["mutable"] = ["batch_stats"]
            out = model.apply(
                variables,
                batch["query"],
                batch["pos"],
                batch["neg"],
                batch.get("sparse_pos"),
                batch.get("sparse_neg"),
                train=True,
                method=model.compute_loss,
                rngs={"dropout": dropout_rng},
                **kwargs,
            )
            if kwargs:
                loss, new_vars = out
                return loss, new_vars.get("batch_stats", state.batch_stats)
            return out, state.batch_stats

        (loss, new_batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
            rng=rng,
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def make_eval_loss_step(model: MFARModel):
    """Proxy-validation loss (reference: mfar/modeling/contrastive.py:647-667):
    same loss, deterministic, no state mutation."""

    def eval_step(state: TrainState, batch: Dict[str, Any]) -> jax.Array:
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return model.apply(
            variables,
            batch["query"],
            batch["pos"],
            batch["neg"],
            batch.get("sparse_pos"),
            batch.get("sparse_neg"),
            train=False,
            method=model.compute_loss,
        )

    return eval_step
