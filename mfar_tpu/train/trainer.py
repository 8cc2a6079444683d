"""The training driver: epochs, validation, trec eval, early stop, resume.

Single-controller replacement for the reference's Lightning Trainer +
callbacks stack (reference: mfar/commands/train.py:223-263, and the
RetrievalTrainingModule hooks, mfar/modeling/contrastive.py:465-631):

- per-epoch train loop over the jitted step (global batch; the jit shards);
- proxy validation (val contrastive loss) every epoch, full trec retrieval
  eval every ``trec_val_freq`` epochs -- rebuilding the dense corpus index
  from the *current* encoder exactly like the reference's on_eval_start;
- EarlyStopping(monitor=valid_loss, patience) + checkpoint top-k + best.txt;
- ``dev_by_iter`` (amazon) runs validation several times per epoch
  (reference: mfar/commands/train.py:88,251);
- ``run_one_iteration`` smoke mode limits train/val to one batch.

Distribution: pass a ``mesh`` and the trainer shards parameters/optimizer
state by the path rules in :mod:`mfar_tpu.parallel.sharding` (replicated
over the batch axes, tensor-parallel over 'model'), shards every train
batch over the batch axes, and hands the same mesh to the retrieval engine
so eval scans the corpus sharded -- replacing the reference's default
multi-GPU posture (``DDPStrategy(devices=-1)``, reference:
mfar/commands/train.py:246-250) with GSPMD.  The train step donates the
state (params + optimizer moments update in place, no double-buffer).

No per-rank qres files, no dedup-merge, no filesystem barriers: one process
drives the mesh, so eval writes one qres file directly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Mapping, Optional

import numpy as np

import jax

from mfar_tpu.data import trec
from mfar_tpu.data.schema import sparse_keys
from mfar_tpu.parallel import multihost
from mfar_tpu.data.types import Corpus, Field
from mfar_tpu.eval.index_build import build_dense_corpus_matrix
from mfar_tpu.eval.retrieval import RetrievalEngine
from mfar_tpu.train.checkpoint import CheckpointManager
from mfar_tpu.train.data_pipeline import (
    ContrastiveDataset,
    prefetch,
    strip_meta,
    token_stats,
)
from mfar_tpu.train.train_step import TrainState, make_eval_loss_step, make_train_step
from mfar_tpu.utils.logging import MetricsLogger
from mfar_tpu.utils.timing import Timer

PROG_METRICS = (
    "map", "recip_rank", "recall_5", "recall_10", "recall_20", "recall_100",
    "ndcg", "ndcg_cut_10", "Rprec", "success_1",
)
RESULT_KEYS = (
    "success_1", "success_5", "recall_5", "recall_10", "recall_15",
    "recall_20", "ndcg", "ndcg_cut_10", "recip_rank", "map",
)


@dataclasses.dataclass
class TrainerConfig:
    out_dir: str
    max_epochs: int = 50
    patience: int = 10
    trec_val_freq: int = 0
    train_batch_size: int = 16
    dev_batch_size: int = 64
    index_batch_size: int = 256
    seed: int = 0xDEADBEEF
    run_one_iteration: bool = False
    dev_by_iter: bool = False  # validate 5x per epoch (amazon)
    recall_k: int = 100
    top_k: int = 100
    query_max_length: int = 512
    monitor: str = "valid_loss"
    prefix: bool = False
    retrieval_mode: str = "auto"  # auto|exact|rerank (engine serving mode)
    corpus_on_host: bool = False  # eval engine keeps the dense corpus in
    #   host RAM and streams chunks per scan (capacity beyond HBM; both
    #   modes, hybrid-capable, composes with the mesh)
    prefetch_depth: int = 2  # host batches prepared ahead of the device


class Trainer:
    def __init__(
        self,
        model,
        optimizer,
        tokenizer,
        field_info: Dict[str, Field],
        corpus: Corpus,
        train_dataset: ContrastiveDataset,
        val_dataset: ContrastiveDataset,
        dev_queries: Mapping[str, str],
        dev_qrels_path: str,
        config: TrainerConfig,
        sparse_indices: Optional[Dict[str, Any]] = None,
        additional_queries: Optional[Mapping[str, str]] = None,
        additional_qrels_path: Optional[str] = None,
        logger: Optional[MetricsLogger] = None,
        mesh=None,  # jax.sharding.Mesh: shard state, batches, and the corpus
    ):
        self.model = model
        self.optimizer = optimizer
        self.tokenizer = tokenizer
        self.field_info = field_info
        self.corpus = corpus
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.dev_queries = dict(dev_queries)
        self.dev_qrels_path = dev_qrels_path
        self.additional_queries = dict(additional_queries or {})
        self.additional_qrels_path = additional_qrels_path
        self.cfg = config
        self.sparse_indices = sparse_indices or {}
        self.logger = logger or MetricsLogger(config.out_dir)
        self.timer = Timer()

        os.makedirs(config.out_dir, exist_ok=True)
        self.ckpt = CheckpointManager(
            config.out_dir, monitor=config.monitor,
            mode=CheckpointManager.monitor_mode(config.monitor),
        )
        # Donating the state halves its HBM footprint across the update
        # (params + AdamW moments rewrite in place; >1.3 GB saved at
        # contriever scale) -- the old state is invalid after each step,
        # which fit() respects by threading the new one.
        self.train_step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0,))
        self.eval_step = jax.jit(make_eval_loss_step(model))
        self.best_score = 0.0
        self._last_epoch_padding_pct = 0.0
        self.mask: Optional[np.ndarray] = None
        self.masked_fields_string = ""
        self._jit_encode = None

        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mfar_tpu.parallel.mesh import batch_axes, n_batch_shards

            self._n_dp = n_batch_shards(mesh)
            self._batch_sharding = NamedSharding(mesh, P(batch_axes(mesh)))

    # ------------------------------------------------------------------

    def place_state(self, state: TrainState) -> TrainState:
        """Shard params + optimizer state over the mesh by the path rules
        (moments mirror the param tree, so the same rules apply); replicate
        the small leaves.  No-op without a mesh."""
        if self.mesh is None:
            return state
        from mfar_tpu.parallel.sharding import shard_params

        step, rng = state.step, state.rng
        if multihost.is_multiprocess():
            # step/rng are committed local scalars; the jitted step needs
            # every argument on the global mesh.
            rep = multihost.replicated_sharding(self.mesh)
            step = jax.device_put(np.asarray(step), rep)
            rng = jax.device_put(np.asarray(rng), rep)
        return TrainState(
            params=shard_params(self.mesh, state.params),
            batch_stats=shard_params(self.mesh, state.batch_stats),
            opt_state=shard_params(self.mesh, state.opt_state),
            step=step,
            rng=rng,
        )

    def _place_batch(self, batch):
        """Shard every batch leaf over the batch axes (leading dim is B or
        B*Nn, both multiples of the shard count)."""
        if self._batch_sharding is None:
            return batch
        rep = (
            multihost.replicated_sharding(self.mesh)
            if multihost.is_multiprocess() else None
        )

        def place(x):
            if not (hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1):
                return x
            if x.shape[0] % self._n_dp == 0:
                return jax.device_put(x, self._batch_sharding)
            # Ragged leaves fall through replicated.  Multi-host: they must
            # still land on the GLOBAL mesh (a host array arg would commit
            # locally and clash with the global state in the jitted step).
            return x if rep is None else jax.device_put(x, rep)

        return jax.tree.map(place, batch)

    # ------------------------------------------------------------------

    def _encode_fn(self, state: TrainState):
        # Sibling of eval.index_build.make_encode_fn -- kept separate
        # because this one (a) routes through model.encode, (b) caches the
        # jit on self (called once per eval with fresh params), and (c)
        # places params by the tensor-parallel sharding RULES rather than
        # replicated.  The shared invariants (batch sharder, multi-host
        # replicated out_sharding) live in index_build; fix both when
        # touching either.
        # Params ride as an ARGUMENT of one cached jitted function: closing
        # over them would (a) recompile on every eval (new closure, new jit)
        # and (b) embed the full weights in the compile payload, which
        # overflows remote-compile transports at contriever scale.
        if self._jit_encode is None:
            # Multi-host: replicate the embedding output so every process
            # can fetch it (index build / query encode consume on host).
            out_shardings = (
                multihost.replicated_sharding(self.mesh)
                if multihost.is_multiprocess() else None
            )
            self._jit_encode = jax.jit(
                lambda p, ids, mask: self.model.apply(
                    {"params": p}, ids, mask, method=self.model.encode
                ),
                out_shardings=out_shardings,
            )
        params = state.params

        if self._batch_sharding is None:
            return lambda ids, mask: self._jit_encode(params, ids, mask)

        # Eval entry points (mask_fields, retrieve-from-checkpoint) restore
        # state on the default device; place it on the mesh before mixing
        # with mesh-sharded batches.
        from mfar_tpu.eval.index_build import make_batch_sharder
        from mfar_tpu.parallel.sharding import shard_params

        params = shard_params(self.mesh, params)
        shard = make_batch_sharder(self.mesh)

        # Mesh: shard encode batches over the batch axes so corpus
        # (re)indexing uses every chip (the reference shards this by rank,
        # mfar/modeling/contrastive.py:465-496).
        def encode(ids, mask):
            return self._jit_encode(params, *shard(ids, mask))

        return encode

    def build_engine(self, state: TrainState) -> RetrievalEngine:
        """(Re)index the corpus with the current encoder and assemble the
        retrieval engine (reference on_eval_start,
        mfar/modeling/contrastive.py:465-496)."""
        encode = self._encode_fn(state)
        dense_fields = {k: f for k, f in self.field_info.items() if f.is_dense}
        with self.timer.phase("index_build"):
            matrix = build_dense_corpus_matrix(
                encode,
                self.tokenizer,
                self.corpus,
                dense_fields,
                batch_size=self.cfg.index_batch_size,
                prefix=self.cfg.prefix,
            )
        return RetrievalEngine(
            field_info=self.field_info,
            doc_keys=list(self.corpus.keys()),
            encode_fn=encode,
            tokenizer=self.tokenizer,
            mixer_params=state.params["mixer"],
            dense_matrix=matrix if matrix.size else None,
            # missing indices pass through so the engine raises its
            # descriptive field_info-vs-indices ValueError, not a KeyError
            sparse_indices={
                k: self.sparse_indices[k]
                for k in sparse_keys(self.field_info)
                if k in (self.sparse_indices or {})
            },
            query_max_length=self.cfg.query_max_length,
            recall_k=self.cfg.recall_k,
            mask=self.mask,
            mesh=self.mesh,
            mode=self.cfg.retrieval_mode,
            corpus_on_host=self.cfg.corpus_on_host,
        )

    # ------------------------------------------------------------------

    def train_epoch(self, state: TrainState, epoch: int) -> tuple:
        """One epoch over a background-prefetched batch stream: host batch
        assembly (tokenize, BM25 negatives, sparse tensors) overlaps device
        compute, and per-step losses stay device-resident until the epoch
        ends (a per-step host fetch would serialize on the device
        round-trip)."""
        losses = []
        val_losses = []
        tokens_real = tokens_total = 0
        n = self.train_dataset.num_batches(self.cfg.train_batch_size)
        if self.cfg.run_one_iteration:
            n = min(n, 1)
        val_every = max(1, n // 5) if self.cfg.dev_by_iter else n + 1
        it = self.train_dataset.epoch_batches(
            self.cfg.train_batch_size, seed=self.cfg.seed + epoch
        )
        for i, batch in enumerate(prefetch(it, depth=self.cfg.prefetch_depth)):
            if i >= n:
                break
            batch = strip_meta(batch)
            # Padding accounting rides the host arrays BEFORE placement
            # (mask sums; the device never sees this).
            ts = token_stats(batch)
            tokens_real += ts["tokens_real"]
            tokens_total += ts["tokens_total"]
            batch = self._place_batch(batch)
            with self.timer.phase("train_step"):
                state, metrics = self.train_step(state, batch)
            losses.append(metrics["loss"])  # device scalar; fetched at epoch end
            if (i + 1) % val_every == 0 and i + 1 < n:
                val_losses.append(self.validate_proxy(state))
        # Steps dispatch asynchronously, so the per-step phase above times
        # dispatch only; the device drains here (one blocking fetch).
        with self.timer.phase("train_drain"):
            losses = [float(x) for x in losses]
        self._last_epoch_padding_pct = (
            100.0 * (1.0 - tokens_real / tokens_total) if tokens_total else 0.0
        )
        return state, float(np.mean(losses)) if losses else 0.0, val_losses

    def validate_proxy(self, state: TrainState) -> float:
        """Cheap validation signal: val-set contrastive loss (reference:
        mfar/modeling/contrastive.py:647-667).

        Mirrors train_epoch's dispatch discipline: batches prefetch on a
        background thread, per-batch losses stay device-resident, and ONE
        drain fetches them all -- a per-batch ``float()`` would serialize
        every step on the device round-trip (~35 ms each through the TPU
        relay)."""
        losses = []
        it = self.val_dataset.epoch_batches(
            self.cfg.train_batch_size, seed=0, drop_remainder=False
        )
        for batch in prefetch(it, depth=self.cfg.prefetch_depth):
            # _place_batch shards full batches over the mesh; ragged last
            # batches fall through replicated (leaf-level divisibility guard)
            batch = self._place_batch(strip_meta(batch))
            with self.timer.phase("val_step"):
                losses.append(self.eval_step(state, batch))
            if self.cfg.run_one_iteration:
                break
        with self.timer.phase("val_drain"):
            vals = [float(x) for x in losses]
        return float(np.mean(vals)) if vals else float("inf")

    def trec_eval(
        self,
        state: TrainState,
        queries: Mapping[str, str],
        qrels_path: str,
        tag: str,
        engine: Optional[RetrievalEngine] = None,
    ) -> Dict[str, float]:
        """Full retrieval eval: retrieve -> qres file -> trec metrics."""
        engine = engine or self.build_engine(state)
        qids = list(queries.keys())
        with self.timer.phase("retrieve"):
            results = engine.retrieve_many(
                [queries[q] for q in qids],
                top_k=self.cfg.top_k,
                batch_size=self.cfg.dev_batch_size,
            )
        qres = engine.to_qres(qids, results)
        qres_path = os.path.join(self.cfg.out_dir, f"{tag}.qres")
        if multihost.is_primary():
            trec.write_qres(qres_path, qres)
        if multihost.is_multiprocess():
            # Every process scores the (identical, in-memory) run with the
            # internal metrics engine so early-stop / best-checkpoint
            # decisions cannot diverge across hosts; process 0 wrote the
            # qres artifact above.  (The trec_eval binary path reads files
            # that only exist on host 0.)
            from mfar_tpu.eval import metrics as _metrics

            with self.timer.phase("trec_eval"):
                return _metrics.evaluate(trec.QRels.from_file(qrels_path), qres)
        with self.timer.phase("trec_eval"):
            return trec.call_trec_eval_and_get_metrics(qrels_path, qres_path)

    # ------------------------------------------------------------------

    def fit(self, state: TrainState, start_epoch: int = 0) -> TrainState:
        cfg = self.cfg
        if self.mesh is not None:
            # checked here, not in __init__: eval-only flows (mask_fields,
            # retrieve-from-checkpoint) build a Trainer over an arbitrary
            # mesh and never train
            assert cfg.train_batch_size % self._n_dp == 0, (
                f"train_batch_size {cfg.train_batch_size} must divide over "
                f"the {self._n_dp} batch shards of mesh {dict(self.mesh.shape)}"
            )
        if multihost.is_multiprocess():
            assert self.mesh is not None, "multihost training requires a mesh"
        state = self.place_state(state)
        # Direction-aware early stopping: loss-like monitors minimize,
        # quality metrics maximize (comparison runs on sign*value so one
        # 'smaller is better' code path serves both).
        sign = 1.0 if CheckpointManager.monitor_mode(cfg.monitor) == "min" else -1.0
        best_monitor = float("inf")
        epochs_without_improvement = 0

        for epoch in range(start_epoch, cfg.max_epochs):
            state, train_loss, mid_val = self.train_epoch(state, epoch)
            valid_loss = self.validate_proxy(state)
            metrics: Dict[str, float] = {
                "train_loss": train_loss,
                "valid_loss": valid_loss,
                # Padded fraction of this epoch's token arrays (the
                # static-shape tax the bucketed collation could not avoid)
                "padding_pct": round(self._last_epoch_padding_pct, 2),
            }
            if mid_val:
                # dev_by_iter mid-epoch proxy validations (logged; early
                # stop and checkpoint selection stay epoch-end)
                metrics["mid_valid_loss"] = float(np.mean(mid_val))

            if cfg.trec_val_freq > 0 and (epoch + 1) % cfg.trec_val_freq == 0:
                dev = self.trec_eval(state, self.dev_queries, self.dev_qrels_path, f"epoch{epoch}-dev")
                metrics.update({f"dev_{k}": v for k, v in dev.items() if k in PROG_METRICS})
                score = dev.get("ndcg_cut_10", 0.0)
                if score > self.best_score:
                    self.best_score = score
                metrics["best_ndcg_cut_10"] = self.best_score

            # _host_state runs a COLLECTIVE allgather for tensor-parallel
            # leaves, so every process must call it; only process 0 writes.
            host_state = self._host_state(state)
            if multihost.is_primary():
                self.logger.log(metrics, step=int(state.step))
                print(
                    f"[epoch {epoch}] train_loss={train_loss:.4f} valid_loss={valid_loss:.4f}"
                    + (f" dev_ndcg@10={metrics.get('dev_ndcg_cut_10', float('nan')):.4f}"
                       if "dev_ndcg_cut_10" in metrics else "")
                )
                self.ckpt.save(
                    epoch, host_state, metrics,
                    field_info=self.field_info,
                    config=dataclasses.asdict(cfg),
                )
            del host_state
            multihost.sync("epoch-io")

            if cfg.monitor in metrics:
                monitored = sign * metrics[cfg.monitor]
                if monitored < best_monitor - 1e-12:
                    best_monitor = monitored
                    epochs_without_improvement = 0
                else:
                    epochs_without_improvement += 1
                    if epochs_without_improvement >= cfg.patience:
                        print(f"[early stop] no {cfg.monitor} improvement "
                              f"for {cfg.patience} epochs")
                        break
            # monitor absent this epoch (e.g. a trec metric between
            # --trec-val-freq epochs): skip, like Lightning's
            # EarlyStopping(strict=False) -- never fall back to a
            # different metric with a different scale/direction
            if cfg.run_one_iteration:
                break
        return state

    # ------------------------------------------------------------------

    def _host_state(self, state: TrainState):
        """State with host-array leaves for process-0 checkpoint I/O.

        Single-process: the state passes through (orbax handles device
        arrays).  Multi-host: every leaf must become a full host value --
        replicated leaves convert directly, and tensor-parallel
        (model-axis-sharded) leaves allgather their shards first
        (process_allgather), so n_model > 1 checkpoints identically to
        n_model == 1.  NB every process runs the allgather (collective);
        only process 0 then writes."""
        if not multihost.is_multiprocess():
            return state
        from jax.experimental import multihost_utils

        def to_host(x):
            if hasattr(x, "is_fully_replicated") and not x.is_fully_replicated:
                return np.asarray(multihost_utils.process_allgather(x, tiled=True))
            return np.asarray(x)

        return jax.tree.map(to_host, state)

    def ckpt_step_broadcast(self, which: str = "best") -> Optional[int]:
        """best/latest checkpoint step, known to process 0's filesystem and
        broadcast so every process agrees (multihost: only process 0 writes
        checkpoints)."""
        if not multihost.is_multiprocess():
            return self.ckpt.best_step() if which == "best" else self.ckpt.latest_step()
        from jax.experimental import multihost_utils

        step = None
        if multihost.is_primary():
            step = self.ckpt.best_step() if which == "best" else self.ckpt.latest_step()
        step = int(multihost_utils.broadcast_one_to_all(
            np.int64(-1 if step is None else step)
        ))
        return None if step < 0 else step

    def restore_broadcast(self, step: int, state: TrainState) -> TrainState:
        """Restore a checkpoint for every process: process 0 reads from disk
        and broadcasts host values; all processes re-place onto the mesh.
        Plain restore single-process."""
        if not multihost.is_multiprocess():
            return self.ckpt.restore(step, state)
        from jax.experimental import multihost_utils

        host = self._host_state(state)  # collective: all processes call
        if multihost.is_primary():
            host = jax.tree.map(np.asarray, self.ckpt.restore(step, host))
        host = multihost_utils.broadcast_one_to_all(host)
        return self.place_state(
            TrainState(
                params=host.params,
                batch_stats=host.batch_stats,
                opt_state=host.opt_state,
                step=host.step,
                rng=host.rng,
            )
        )

    # ------------------------------------------------------------------

    def mask_field(self, field_idx_list: List[int]) -> None:
        """Zero the scores of the given field indices at eval (reference:
        mfar/modeling/contrastive.py:706-714)."""
        names = list(self.field_info.keys())
        self.masked_fields_string = ",".join(names[i] for i in field_idx_list)
        mask = np.ones(len(self.field_info), np.float32)
        mask[np.asarray(field_idx_list, dtype=int)] = 0.0
        self.mask = mask

    def clear_mask(self) -> None:
        self.mask = None
        self.masked_fields_string = ""

    def test(self, state: TrainState, verbose: bool = True) -> Dict[str, Dict[str, float]]:
        """Final eval on dev (+ additional) partitions; appends one line per
        configuration to results_dicts.jsonl (reference:
        mfar/modeling/contrastive.py:566-613)."""
        engine = self.build_engine(state)
        out: Dict[str, Dict[str, float]] = {}
        partitions = [("dev", self.dev_queries, self.dev_qrels_path)]
        if self.additional_queries and self.additional_qrels_path:
            partitions.append(("additional", self.additional_queries, self.additional_qrels_path))
        for tag, queries, qrels_path in partitions:
            metrics = self.trec_eval(state, queries, qrels_path, f"final-{tag}", engine=engine)
            out[tag] = metrics
            record = {k: f"{metrics.get(k, 0.0):.3f}" for k in RESULT_KEYS}
            record["masked_fields"] = self.masked_fields_string
            record["additional"] = "test" if tag == "additional" else "val"
            if verbose and multihost.is_primary():
                print("\t".join(RESULT_KEYS))
                print("\t".join(record[k] for k in RESULT_KEYS))
                print(json.dumps(record))
            if multihost.is_primary():
                with open(os.path.join(self.cfg.out_dir, "results_dicts.jsonl"), "a") as f:
                    f.write(json.dumps(record) + "\n")
            self.logger.log(
                {f"{'additional' if tag == 'additional' else 'best'}_{k}": v
                 for k, v in metrics.items() if k in PROG_METRICS},
                step=int(state.step),
            )
        return out
