"""Run the online retrieval serving daemon.

Loads the same checkpoint/index surface as ``retrieve`` (shared flag
block), warms the compiled serving program, then answers HTTP traffic with
micro-batched device dispatches (:mod:`mfar_tpu.serve`).  The reference has
no online serving path at all.

Example:
    mfar-serve --dataset-name mag --data DATA --model-name ... \\
        --checkpoint-dir RUN --port 8080 --max-batch 256
"""

from __future__ import annotations

import argparse

from mfar_tpu.commands.common import (
    add_data_args,
    add_engine_args,
    build_engine,
    normalize_argv,
)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_data_args(p)
    add_engine_args(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--top-k", type=int, default=100,
                   help="served depth (one compiled program; per-request "
                        "top_k may be lower)")
    p.add_argument("--max-batch", type=int, default=64,
                   help="micro-batch size = the ONE compiled batch shape")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="batching window opened by the first waiting request")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip compiling the serving program before the port "
                        "opens (first request then pays the ~20-40 s compile)")
    args = p.parse_args(normalize_argv(argv))
    from mfar_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()

    from mfar_tpu.parallel import multihost

    if multihost.is_multiprocess():
        raise SystemExit(
            "the serving daemon is single-process (one controller owns all "
            "devices); use a mesh over locally-visible chips"
        )

    from mfar_tpu.serve import RetrievalServer

    engine = build_engine(args, label="serve")
    server = RetrievalServer(
        engine, host=args.host, port=args.port, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, top_k=args.top_k, mode=args.mode,
    )
    if not args.no_warmup:
        # Warm with real queries when the dataset ships any: their postings
        # widths hit the buckets real traffic will use.
        sample = None
        import glob
        import os

        from mfar_tpu.data import trec

        for path in sorted(glob.glob(os.path.join(args.queries, "*.queries"))):
            qs = list(trec.read_queries(path).values())
            if qs:
                sample = qs[: args.max_batch]
                break
        dt = server.warmup(sample)
        print(f"[serve] warmup: compiled serving program in {dt:.1f}s"
              + (" (incl. a real-query pass)" if sample else ""))
    server.bind()  # the port opens only now, after warmup
    print(f"[serve] listening on http://{server.host}:{server.port} "
          f"(max_batch={args.max_batch}, top_k={args.top_k}, "
          f"n_docs={engine.n_docs})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("[serve] shutting down")
        server.shutdown()


if __name__ == "__main__":
    main()
