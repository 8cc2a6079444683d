"""Checkpoint / resume via orbax.

Reference behavior replicated (mfar/commands/train.py:232-240,258-263 and
mfar/modeling/contrastive.py:634-645): checkpoints monitored by valid_loss,
keep top-k (default 100) + last, best path persisted to ``{out}/best.txt``,
field schemas serialized alongside weights, corpus/indices never
checkpointed (always rebuilt from the encoder).  Improvements over the
reference: full optimizer + batchnorm + RNG state saved, so mid-training
resume is exact (the reference had weights-only checkpoints and no mid-run
resume).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from mfar_tpu.data.types import Field
from mfar_tpu.train.train_step import TrainState


class CheckpointManager:
    @staticmethod
    def monitor_mode(monitor: str) -> str:
        """'min' for loss-like monitors, 'max' for quality metrics
        (ndcg/recall/map/...).  The reference hardcodes
        monitor='valid_loss', mode='min' (train.py:219-221); configurable
        monitors are an extension, so the direction is inferred."""
        return "min" if "loss" in monitor else "max"

    def __init__(
        self,
        out_dir: str,
        max_to_keep: int = 100,
        monitor: str = "valid_loss",
        mode: str = "min",
    ):
        self.out_dir = os.path.abspath(out_dir)
        os.makedirs(self.out_dir, exist_ok=True)
        self.monitor = monitor
        # Multi-host: checkpoint I/O belongs to process 0 alone; the trainer
        # gates save/restore calls and broadcasts restored state + step
        # choices.  Non-primary processes get a stub (orbax cannot even
        # construct a manager scoped to a process set it isn't in), and
        # process 0's manager is declared active_processes={0} so orbax
        # skips its global save barriers (which would otherwise expect every
        # process to participate and deadlock against process-0-only calls).
        self._manager = None
        if jax.process_index() != 0:
            return
        mp_kwargs = {"create": True}
        if jax.process_count() > 1:
            mp_kwargs = {
                # orbax refuses create=True with active_processes set.
                "create": False,
                "multiprocessing_options": ocp.options.MultiprocessingOptions(
                    primary_host=0, active_processes={0},
                ),
            }
            os.makedirs(os.path.join(self.out_dir, "checkpoints"), exist_ok=True)
        self._manager = ocp.CheckpointManager(
            os.path.join(self.out_dir, "checkpoints"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                # absent monitor must rank WORST in either direction
                best_fn=lambda metrics: metrics.get(
                    monitor, float("inf") if mode == "min" else float("-inf")
                ),
                best_mode=mode,
                **mp_kwargs,
            ),
        )

    # ------------------------------------------------------------------

    def save(
        self,
        step: int,
        state: TrainState,
        metrics: Dict[str, float],
        field_info: Optional[Dict[str, Field]] = None,
        config: Optional[Dict[str, Any]] = None,
    ) -> None:
        assert self._manager is not None, (
            "checkpoint save called on a non-primary process (multihost "
            "file I/O belongs to process 0; see Trainer)"
        )
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": state.rng,
        }
        self._manager.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
            ),
            metrics={k: float(v) for k, v in metrics.items()},
        )
        self._manager.wait_until_finished()
        sidecar = {
            "field_info": {k: f.serialize() for k, f in (field_info or {}).items()},
            "config": config or {},
            "metrics": {k: float(v) for k, v in metrics.items()},
            # rng keys persist as raw data; restoring under a different PRNG
            # impl (threefry uint32[2] vs rbg uint32[4]) would crash or
            # silently misread the stream -- resume validates against this.
            "prng_impl": str(jax.config.jax_default_prng_impl),
        }
        with open(os.path.join(self._step_dir(step), "meta.json"), "w") as f:
            json.dump(sidecar, f, indent=2)
        self.write_best_txt()

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.out_dir, "checkpoints", str(step))

    def best_step(self) -> Optional[int]:
        return None if self._manager is None else self._manager.best_step()

    def latest_step(self) -> Optional[int]:
        return None if self._manager is None else self._manager.latest_step()

    def write_best_txt(self) -> None:
        """Persist the best checkpoint path, the reference's handoff file to
        mask_fields (mfar/commands/train.py:262-263)."""
        best = self.best_step()
        if best is not None:
            with open(os.path.join(self.out_dir, "best.txt"), "w") as f:
                f.write(self._step_dir(best))

    # ------------------------------------------------------------------

    def restore(self, step: Optional[int], template_state: TrainState) -> TrainState:
        assert self._manager is not None, (
            "checkpoint restore called on a non-primary process (use "
            "Trainer.restore_broadcast under multihost)"
        )
        step = step if step is not None else self.latest_step()
        assert step is not None, "no checkpoint to restore"
        # rng keys persist as raw data whose shape depends on the PRNG impl
        # (threefry uint32[2] vs rbg uint32[4]); restore under the impl the
        # checkpoint records, not whatever this process defaults to.
        rng_template = template_state.rng
        try:
            saved_impl = self.restore_meta(step).get("prng_impl")
        except Exception:
            saved_impl = None
        if saved_impl:
            candidate = jax.random.PRNGKey(0, impl=saved_impl)
            if candidate.shape != rng_template.shape:
                rng_template = candidate
        payload = {
            "params": template_state.params,
            "batch_stats": template_state.batch_stats,
            "opt_state": template_state.opt_state,
            "step": template_state.step,
            "rng": rng_template,
        }
        restored = self._manager.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(payload)),
        )["state"]
        return TrainState(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            rng=restored["rng"],
        )

    def restore_meta(self, step: Optional[int] = None) -> Dict[str, Any]:
        if step is None:
            best = self.best_step()  # step 0 is a valid best -- no `or`
            step = best if best is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.out_dir}")
        with open(os.path.join(self._step_dir(step), "meta.json")) as f:
            return json.load(f)

    def close(self) -> None:
        if self._manager is not None:
            self._manager.close()


def check_field_compatibility(step_dir: str, field_info: Dict[str, Field]) -> None:
    """Fail fast with a readable message when the CLI's field selection does
    not match what the checkpoint was trained with (the mixer's field axis
    is positional)."""
    meta_path = os.path.join(step_dir, "meta.json")
    if not os.path.exists(meta_path):
        return
    with open(meta_path) as f:
        meta = json.load(f)
    trained = list(meta.get("field_info", {}).keys())
    requested = list(field_info.keys())
    if trained and trained != requested:
        raise ValueError(
            f"field selection mismatch: checkpoint {step_dir} was trained with "
            f"fields {trained}, but --field-names resolved to {requested}"
        )


def read_best_dir(out_dir: str) -> str:
    """Resolve the best checkpoint directory from best.txt (the reference's
    reload path, mfar/commands/mask_fields.py:106-108)."""
    with open(os.path.join(out_dir, "best.txt")) as f:
        return f.read().strip()


def fields_from_meta(meta: Dict[str, Any]) -> Dict[str, Field]:
    return {k: Field.deserialize(d) for k, d in meta.get("field_info", {}).items()}
