"""Train a multi-field retriever (the reference's main entry point).

CLI parity with ``python -m mfar.commands.train`` (reference:
mfar/commands/train.py:25-65): same flag vocabulary, same defaults where
they exist.  Differences by design: no --num-gpus / DDP plumbing (the jit
shards over whatever mesh is available), no --temp-dir memmaps (accepted,
ignored with a note), and an offline ``--model-name synthetic`` path.

Example (smoke):
    python -m mfar_tpu.commands.train --dataset-name amazon \
        --data /path/ds --out /tmp/run --lexical-index /path/idx \
        --field-names all_dense,all_sparse --weights-lr 0.1 \
        --model-name synthetic --run-one-iteration
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp

from mfar_tpu.commands.common import (  # noqa: F401
    normalize_argv,
    add_data_args,
    corpus_texts_for_vocab,
    load_corpus,
    load_negative_sampler_index,
    load_or_build_sparse_indices,
    resolve_data_dirs,
)
from mfar_tpu.data import trec
from mfar_tpu.data.negative_sampler import IndexNegativeSampler
from mfar_tpu.data.schema import resolve_fields
from mfar_tpu.models.registry import is_t5_family, prepare_model
from mfar_tpu.train.data_pipeline import ContrastiveDataset
from mfar_tpu.train.model import MFARModel
from mfar_tpu.train.optim import make_optimizer
from mfar_tpu.train.sparse_cache import read_sparse_scores
from mfar_tpu.train.train_step import init_state
from mfar_tpu.train.trainer import Trainer, TrainerConfig
from mfar_tpu.utils.logging import MetricsLogger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_data_args(p)
    p.add_argument("--lexical-index", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--temp-dir", default=None, help="accepted for reference CLI parity; unused "
                   "(corpus vectors are HBM-resident, not memmapped)")
    p.add_argument("--partition", default="val")
    p.add_argument("--additional-partition", default=None)
    p.add_argument("--sparse-scores-path", default=None)
    p.add_argument("--model-name", default="facebook/contriever-msmarco")
    p.add_argument("--model-path", default=None)
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--temperature", type=float, default=0.05)
    p.add_argument("--negative-sampling-params", default="100,50,1",
                   help="n_retrieve,n_bottom,n_sample")
    p.add_argument("--encoder-lr", type=float, default=1e-4)
    p.add_argument("--weights-lr", type=float, required=True)
    p.add_argument("--regularizer", type=float, default=0.0, help="weight decay")
    p.add_argument("--train-batch-size", type=int, default=16)
    p.add_argument("--dev-batch-size", type=int, default=64)
    p.add_argument("--train-max-length", type=int, default=512)
    p.add_argument("--dev-max-length", type=int, default=512)
    p.add_argument("--max-epochs", type=int, default=50)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--seed", type=int, default=0xDEADBEEF)
    p.add_argument("--precision", default="16-mixed",
                   choices=["16-mixed", "bf16", "32", "f32"],
                   help="compute precision (reference default 16-mixed = bf16 "
                        "activations here; 32/f32 forces full-precision "
                        "encoder compute)")
    p.add_argument("--num-gpus", type=int, default=None,
                   help="accepted for reference CLI parity; device use is "
                        "mesh-driven (--mesh / --n-model / --n-replica)")
    p.add_argument("--dev-by-iter", dest="dev_by_iter", action="store_true",
                   default=None,
                   help="validate 5x per epoch (default on for amazon, like "
                        "the reference)")
    p.add_argument("--no-dev-by-iter", dest="dev_by_iter",
                   action="store_false",
                   help="disable per-iteration validation (overrides the "
                        "amazon default)")
    p.add_argument("--logger", default=None, choices=[None, "wandb", "mlflow", "mlflow_local"])
    p.add_argument("--wandb-name", default=None, help="wandb run display name")
    p.add_argument("--wandb-dir", default=None, help="wandb local artifact dir")
    p.add_argument("--freeze-encoder", action="store_true")
    p.add_argument("--experiment-name", default=None)
    p.add_argument("--trec-val-freq", type=int, default=0)
    p.add_argument("--query-cond", dest="query_cond", action="store_true", default=True)
    p.add_argument("--no-query-cond", dest="query_cond", action="store_false")
    p.add_argument("--prefix", action="store_true")
    p.add_argument("--run-one-iteration", action="store_true")
    p.add_argument("--use-batchnorm", action="store_true")
    p.add_argument("--in-batch-negative", dest="in_batch", action="store_true", default=True)
    p.add_argument("--no-in-batch-negative", dest="in_batch", action="store_false",
                   help="own-negatives-only simple loss (reference "
                        "in_batch_negative=False branch)")
    p.add_argument("--prng", default="rbg", choices=["rbg", "threefry"],
                   help="PRNG impl for dropout etc.; rbg uses the TPU hardware "
                        "generator (measured ~11%% faster steps with dropout on)")
    p.add_argument("--hidden-dropout", type=float, default=None,
                   help="override encoder hidden dropout (default: model config)")
    p.add_argument("--attention-dropout", type=float, default=None,
                   help="override attention dropout; 0 avoids the [B,H,S,S] "
                        "dropout-mask traffic (measured 1282->933 ms/step on mag)")
    p.add_argument("--softmax-dtype", default="f32", choices=["f32", "bf16"],
                   help="attention softmax dtype; bf16 halves the [B,H,S,S] "
                        "HBM traffic (measured 826->726 ms/step on mag; "
                        "embeddings shift ~1e-3 relative)")
    p.add_argument("--remat", default="auto", choices=["auto", "on", "off"],
                   help="rematerialize encoder layers (auto: on for >=8-layer "
                        "encoders; the 1+2F encoder passes per step OOM at "
                        "contriever scale without it)")
    p.add_argument("--recall-k", type=int, default=100)
    p.add_argument("--retrieval-mode", default="auto", choices=["auto", "exact", "rerank"],
                   help="eval serving mode: exact (the default) fuses full-corpus "
                        "scoring, hybrid-capable; rerank is the reference-"
                        "compat recall+rerank approximation")
    p.add_argument("--mesh", default="auto", choices=["auto", "off"],
                   help="auto: build a device mesh over all visible chips and "
                        "shard the train batch, optimizer state, and eval corpus "
                        "(the reference's DDP default, devices=-1); off: single chip")
    p.add_argument("--n-model", type=int, default=1,
                   help="tensor-parallel mesh axis size (shards encoder params)")
    p.add_argument("--n-replica", type=int, default=1,
                   help="cross-slice (DCN) data-parallel axis size")
    p.add_argument("--multihost", default="auto",
                   choices=["auto", "off", "force", "pod"],
                   help="multi-process runtime (jax.distributed): auto engages "
                        "on the coordinator env triple (MFAR_COORDINATOR + "
                        "MFAR_NUM_PROCESSES + MFAR_PROCESS_ID); off never; "
                        "force requires that env; pod self-configures on "
                        "cloud-TPU pod slices")
    p.add_argument("--prefetch-depth", type=int, default=2,
                   help="train batches prepared ahead on the host thread "
                        "(epoch RAM is O(depth); values < 1 are clamped to 1)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest checkpoint in --out (exact resume: "
                   "params + optimizer + batchnorm + rng)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a JAX profiler trace of training into this dir")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(normalize_argv(argv))
    from mfar_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()

    # Before anything queries devices: a multi-process run must wire the
    # global mesh first (the reference's Lightning-DDP-spawns-processes
    # posture, reference mfar/commands/train.py:246-250).
    from mfar_tpu.parallel import multihost

    if multihost.maybe_initialize(args.multihost):
        print(f"[train] multihost: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    try:  # before any PRNG key exists; no-op if something already made one
        jax.config.update("jax_default_prng_impl", args.prng)
    except Exception as e:
        print(f"[train] could not set prng impl {args.prng}: {e}")
    resolve_data_dirs(args)
    os.makedirs(args.out, exist_ok=True)

    field_info = resolve_fields(args.field_names, args.dataset_name)
    model_name = args.model_path or args.model_name
    neg_params = tuple(int(x) for x in args.negative_sampling_params.split(","))
    # amazon validates several times per epoch (reference:
    # mfar/commands/train.py:88,251); explicit --dev-by-iter overrides
    dev_by_iter = args.dev_by_iter if args.dev_by_iter is not None \
        else args.dataset_name == "amazon"
    if args.num_gpus is not None:
        print("[train] --num-gpus accepted for CLI parity; device use is "
              "mesh-driven (--mesh / --n-model / --n-replica)")

    print(
        json.dumps(
            {
                "model": model_name,
                "dataset": args.dataset_name,
                "fields": {k: f.serialize() for k, f in field_info.items()},
                "encoder_lr": args.encoder_lr,
                "weights_lr": args.weights_lr,
                "trec_val_freq": args.trec_val_freq,
                "seed": args.seed,
                "start_time": time.strftime("%Y-%m-%d %H:%M:%S"),
            },
            indent=2,
        )
    )

    corpus = load_corpus(args.corpus, args.dataset_name)
    train_queries = trec.read_queries(os.path.join(args.queries, "train.queries"))
    val_queries = trec.read_queries(os.path.join(args.queries, "val.queries"))
    dev_queries = trec.read_queries(os.path.join(args.queries, f"{args.partition}.queries"))

    config, params, tokenizer = prepare_model(
        model_name,
        normalize=args.normalize,
        # only the synthetic path consumes corpus_texts; formatting every
        # field of every document costs minutes + GBs at real corpus scale
        corpus_texts=corpus_texts_for_vocab(corpus, field_info)
        if model_name.startswith("synthetic") else None,
    )
    # Rematerialize encoder layers for full-size models: the train step runs
    # 1 + 2*|dense fields| encoder passes, whose un-remat activations blow
    # HBM at contriever scale (measured: 88 GB demanded on a 16 GB chip for
    # mag all_dense at B=24).  The reference can't do this at all
    # (gradient checkpointing explicitly unsupported, README.md:151).
    remat = {"auto": config.num_layers >= 8, "on": True, "off": False}[args.remat]
    overrides = {} if remat == config.remat else {"remat": remat}
    if args.precision in ("32", "f32") and hasattr(config, "dtype"):
        overrides["dtype"] = jnp.float32  # bf16 ("16-mixed") is the default
    if args.hidden_dropout is not None:
        overrides["hidden_dropout" if hasattr(config, "hidden_dropout") else "dropout"] = args.hidden_dropout
    if args.attention_dropout is not None and hasattr(config, "attention_dropout"):
        overrides["attention_dropout"] = args.attention_dropout
    if args.softmax_dtype == "bf16" and hasattr(config, "softmax_dtype"):
        overrides["softmax_dtype"] = jnp.bfloat16
    if overrides:
        config = dataclasses.replace(config, **overrides)

    sparse_indices = load_or_build_sparse_indices(corpus, field_info, args.lexical_index)
    neg_index = load_negative_sampler_index(corpus, args.lexical_index, args.dataset_name)
    sampler = IndexNegativeSampler(neg_index, *neg_params)

    sparse_scores = None
    if args.sparse_scores_path and sparse_indices:
        t0 = time.time()
        sparse_scores = read_sparse_scores(args.sparse_scores_path, field_info)
        print(f"Read sparse scores in {time.time() - t0:.1f}s")

    model = MFARModel(
        encoder_config=config,
        num_fields=len(field_info),
        query_cond=args.query_cond,
        use_batchnorm=args.use_batchnorm,
        temperature=args.temperature,
        in_batch=args.in_batch,
    )
    optimizer = make_optimizer(
        encoder_lr=args.encoder_lr,
        weights_lr=args.weights_lr,
        weight_decay=args.regularizer,
        freeze_encoder=args.freeze_encoder,
        # keyed on the registry's ACTUAL T5 routing, not a substring of
        # the path (a local T5 dir need not contain 't5'; an unrelated
        # path might)
        use_adafactor=is_t5_family(model_name),
    )
    state = init_state(model, optimizer, seed=args.seed % (2**31))
    # Graft pretrained encoder weights over the random init; drop the
    # stale optimizer moments BEFORE re-initializing them (both moment
    # trees alive at once is an avoidable ~2x transient at encoder scale).
    grafted = {**state.params, "encoder": jax.tree.map(jnp.asarray, params)}
    state = state._replace(params=grafted, opt_state=None)
    state = state._replace(opt_state=optimizer.init(grafted))

    mk_ds = lambda queries, qrels, max_len: ContrastiveDataset(
        queries, corpus, qrels, sampler, field_info, tokenizer,
        query_max_length=max_len, prefix=args.prefix,
        sparse_score_cache=sparse_scores, sparse_indices=sparse_indices,
    )
    train_ds = mk_ds(
        train_queries,
        trec.QRels.from_file(os.path.join(args.queries, "train.qrels")),
        args.train_max_length,
    )
    val_ds = mk_ds(
        val_queries,
        trec.QRels.from_file(os.path.join(args.queries, "val.qrels")),
        args.dev_max_length,
    )

    # Multi-chip by default, like the reference's DDPStrategy(devices=-1)
    # (reference: mfar/commands/train.py:246-250) -- one GSPMD mesh instead.
    mesh = None
    n_dev = len(jax.devices())
    if args.mesh == "auto" and (n_dev > 1 or args.n_model > 1 or args.n_replica > 1):
        from mfar_tpu.parallel.mesh import make_mesh

        if args.n_replica > 1 and n_dev % (args.n_model * args.n_replica):
            # uneven per-slice granules crash inside mesh_utils with a
            # cryptic assertion; fail like mesh_from_flag does
            raise SystemExit(
                f"--n-model {args.n_model} x --n-replica {args.n_replica} "
                f"must divide the {n_dev} visible devices for a multi-slice "
                f"mesh"
            )
        n_data = n_dev // (args.n_model * args.n_replica)
        if n_data < 1:
            raise SystemExit(
                f"--n-model {args.n_model} x --n-replica {args.n_replica} "
                f"needs at least that many devices (have {n_dev})"
            )
        # The batch must divide over the data shards; on a SINGLE-slice mesh
        # shrink the data axis (leaving spare chips idle) rather than die --
        # a batch of 4 simply cannot data-parallel 8 ways.  Multi-slice
        # meshes need equal per-slice device counts, so no shrinking there.
        if args.n_replica == 1:
            while n_data > 1 and args.train_batch_size % n_data:
                n_data -= 1
        if args.train_batch_size % (n_data * args.n_replica):
            raise SystemExit(
                f"--train-batch-size {args.train_batch_size} must be divisible "
                f"by n_replica x n_data = {args.n_replica} x {n_data} "
                f"(pick a batch size or mesh shape that divides)"
            )
        used = n_data * args.n_model * args.n_replica
        mesh = make_mesh(
            n_data=n_data, n_model=args.n_model, n_replica=args.n_replica,
            devices=jax.devices()[:used],
        )
        note = f" ({n_dev - used} devices idle: batch {args.train_batch_size})" if used < n_dev else ""
        print(f"[train] mesh: {dict(mesh.shape)} over {used}/{n_dev} devices{note}")

    cfg = TrainerConfig(
        out_dir=args.out,
        max_epochs=args.max_epochs,
        patience=args.patience,
        trec_val_freq=args.trec_val_freq,
        train_batch_size=args.train_batch_size,
        dev_batch_size=args.dev_batch_size,
        seed=args.seed % (2**31),
        run_one_iteration=args.run_one_iteration,
        dev_by_iter=dev_by_iter,
        recall_k=args.recall_k,
        query_max_length=args.dev_max_length,
        prefix=args.prefix,
        retrieval_mode=args.retrieval_mode,
        prefetch_depth=max(1, args.prefetch_depth),
    )
    logger = MetricsLogger(args.out, backend=args.logger, run_name=args.experiment_name,
                           wandb_name=args.wandb_name, wandb_dir=args.wandb_dir)
    logger.log_hyperparams(vars(args))

    additional_queries = None
    additional_qrels = None
    if args.additional_partition:
        additional_queries = trec.read_queries(
            os.path.join(args.queries, f"{args.additional_partition}.queries")
        )
        additional_qrels = os.path.join(args.queries, f"{args.additional_partition}.qrels")

    trainer = Trainer(
        model=model, optimizer=optimizer, tokenizer=tokenizer, field_info=field_info,
        corpus=corpus, train_dataset=train_ds, val_dataset=val_ds,
        dev_queries=dev_queries,
        dev_qrels_path=os.path.join(args.queries, f"{args.partition}.qrels"),
        config=cfg, sparse_indices=sparse_indices,
        additional_queries=additional_queries, additional_qrels_path=additional_qrels,
        logger=logger, mesh=mesh,
    )

    start_epoch = 0
    latest = trainer.ckpt_step_broadcast("latest") if args.resume else None
    if latest is not None:
        # meta.json lives on process 0's disk; the verdict must be agreed by
        # every process (a process-0-only SystemExit would deadlock the rest
        # inside the restore broadcast).
        bad_impl = ""
        if multihost.is_primary():
            saved_impl = trainer.ckpt.restore_meta(latest).get("prng_impl")
            if saved_impl and saved_impl != args.prng:
                bad_impl = saved_impl
        if multihost.is_multiprocess():
            from jax.experimental import multihost_utils
            import numpy as _np

            flags = multihost_utils.broadcast_one_to_all(
                _np.frombuffer(bad_impl.ljust(16)[:16].encode(), dtype=_np.uint8)
            )
            bad_impl = bytes(flags).decode().strip()
        if bad_impl:
            raise SystemExit(
                f"checkpoint {latest} was trained with --prng {bad_impl}; "
                f"resuming with --prng {args.prng} would misread the saved "
                f"rng key -- pass --prng {bad_impl}"
            )
        state = trainer.restore_broadcast(latest, state)
        start_epoch = latest + 1
        print(f"Resumed from checkpoint {latest} (epoch {start_epoch})")

    print(f"Starting training: {time.strftime('%Y-%m-%d %H:%M:%S')}")
    from mfar_tpu.utils.timing import jax_profile

    with jax_profile(args.profile_dir):
        state = trainer.fit(state, start_epoch=start_epoch)

    # Reload best checkpoint for the final test (reference:
    # mfar/commands/train.py:260 trainer.test(ckpt='best')).
    best = trainer.ckpt_step_broadcast("best")
    if best is not None:
        state = trainer.restore_broadcast(best, state)
    trainer.test(state)
    if multihost.is_primary():
        trainer.ckpt.write_best_txt()
    print(f"[timing] {trainer.timer.report()}")


if __name__ == "__main__":
    main()
