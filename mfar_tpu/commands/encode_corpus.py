"""Encode the corpus into per-field dense index matrices on disk.

The reference rebuilds corpus vectors inside every eval epoch and never
persists them (reference: mfar/modeling/contrastive.py:465-496, SURVEY.md
section 5.4).  This command materializes the ``[N, Fd, E]`` matrix once from
a checkpoint (or pretrained encoder) so serving can start without
re-encoding.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from mfar_tpu.commands.common import (  # noqa: F401
    normalize_argv,
    add_data_args,
    corpus_texts_for_vocab,
    load_corpus,
    resolve_data_dirs,
)
from mfar_tpu.data.schema import resolve_fields
from mfar_tpu.eval.index_build import build_dense_corpus_matrix, save_dense_matrix
from mfar_tpu.models import build_encoder
from mfar_tpu.models.registry import prepare_model


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_data_args(p)
    p.add_argument("--out", required=True,
                   help="output path: .npz (default, self-contained) or .npy "
                        "(raw + <out>.keys sidecar; the build streams into "
                        "the file and serving can memory-map it -- the "
                        "beyond-RAM pairing for --corpus-on-host)")
    p.add_argument("--model-name", default="facebook/contriever-msmarco")
    p.add_argument("--checkpoint-dir", default=None,
                   help="restore encoder weights from a training run (best.txt)")
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--prefix", action="store_true")
    p.add_argument("--mesh", default="auto", choices=["auto", "off"],
                   help="auto: shard encode batches over all visible chips")
    args = p.parse_args(normalize_argv(argv))
    from mfar_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()

    resolve_data_dirs(args)

    field_info = resolve_fields(args.field_names, args.dataset_name)
    dense_fields = {k: f for k, f in field_info.items() if f.is_dense}
    corpus = load_corpus(args.corpus, args.dataset_name)
    config, params, tokenizer = prepare_model(
        args.model_name, normalize=args.normalize,
        corpus_texts=corpus_texts_for_vocab(corpus, field_info)
        if args.model_name.startswith("synthetic") else None,
    )

    if args.checkpoint_dir:
        from mfar_tpu.train.checkpoint import (
            CheckpointManager,
            check_field_compatibility,
            read_best_dir,
        )
        from mfar_tpu.train.model import MFARModel
        from mfar_tpu.train.optim import make_optimizer
        from mfar_tpu.train.train_step import init_state

        model = MFARModel(encoder_config=config, num_fields=len(field_info))
        opt = make_optimizer(encoder_lr=1e-4, weights_lr=1e-1)
        state = init_state(model, opt, seed=0)
        state = state._replace(params={**state.params, "encoder": jax.tree.map(jnp.asarray, params)})
        best_dir = read_best_dir(args.checkpoint_dir)
        check_field_compatibility(best_dir, field_info)
        step = int(os.path.basename(best_dir.rstrip("/")))
        state = CheckpointManager(args.checkpoint_dir).restore(step, state)
        params = state.params["encoder"]

    encoder = build_encoder(config)

    from mfar_tpu.parallel.mesh import mesh_from_flag

    mesh = mesh_from_flag(args.mesh, "encode_corpus")

    from mfar_tpu.eval.index_build import make_encode_fn

    encode = make_encode_fn(encoder, params, mesh=mesh)

    out_target = None
    if args.out.endswith(".npy"):
        # Raw .npy: build STREAMS into the disk memmap (host RAM stays
        # O(batch window), so corpora beyond RAM can be encoded) and the
        # file can be memory-mapped at serving time (--corpus-on-host).
        # The embedding dim comes from an abstract trace (projection heads
        # make it differ from config.hidden_size for some models) -- no
        # compile; a real probe encode (one extra ~20-40 s remote compile
        # for a throwaway shape) only as fallback if the encode wrapper
        # does host work eval_shape cannot trace.
        sds = jax.ShapeDtypeStruct((1, 8), jnp.int32)
        try:
            e = int(jax.eval_shape(encode, sds, sds).shape[-1])
        except Exception:
            toks = tokenizer.encode_batch(["probe"], 8)
            e = int(np.asarray(
                encode(jnp.asarray(toks["input_ids"]),
                       jnp.asarray(toks["attention_mask"]))
            ).shape[-1])
        out_target = np.lib.format.open_memmap(
            args.out, mode="w+", dtype=np.float32,
            shape=(len(corpus), len(dense_fields), e),
        )
    matrix = build_dense_corpus_matrix(
        encode, tokenizer, corpus, dense_fields,
        batch_size=args.batch_size, prefix=args.prefix, out=out_target,
    )
    out_path = save_dense_matrix(args.out, matrix, list(corpus.keys()))
    print(f"Encoded {matrix.shape[0]} docs x {matrix.shape[1]} fields x {matrix.shape[2]} dims -> {out_path}")


if __name__ == "__main__":
    main()
