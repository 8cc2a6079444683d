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
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="micro-batches in flight on device at once: batch "
                        "i+1's host prep + H2D overlap batch i's scan "
                        "(1 = sequential dispatch)")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip compiling the serving program before the port "
                        "opens (first request then pays the ~20-40 s compile)")
    p.add_argument("--multihost", default="auto", choices=["auto", "off", "force", "pod"],
                   help="multi-process serving: process 0 owns the HTTP port "
                        "and broadcasts each micro-batch; every other process "
                        "runs the identical engine program in lockstep over "
                        "the global mesh (see serve.py MultihostEngineProxy)")
    p.add_argument("--smoke-out", default=None, metavar="PATH",
                   help="self-test mode: after the port opens, POST the "
                        "dataset's test queries to the daemon over HTTP, "
                        "write the JSON results to PATH, then shut down "
                        "cleanly (exercises the full stack incl. multihost)")
    args = p.parse_args(normalize_argv(argv))
    from mfar_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()

    import jax

    from mfar_tpu.parallel import multihost

    if multihost.maybe_initialize(args.multihost):
        print(f"[serve] multihost: process {jax.process_index()}/"
              f"{jax.process_count()}")

    from mfar_tpu.serve import MultihostEngineProxy, RetrievalServer, follower_loop

    engine = build_engine(args, label="serve")
    proxy = None
    if multihost.is_multiprocess():
        if not multihost.is_primary():
            # Followers: run every broadcast batch (incl. process 0's
            # warmup, which compiles the same program here) until stop.
            follower_loop(engine)
            print(f"[serve] follower {jax.process_index()} done", flush=True)
            return
        engine = proxy = MultihostEngineProxy(engine, max_batch=args.max_batch)
    server = RetrievalServer(
        engine, host=args.host, port=args.port, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, top_k=args.top_k, mode=args.mode,
        pipeline_depth=args.pipeline_depth,
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
          f"n_docs={engine.n_docs})", flush=True)

    if args.smoke_out:
        import http.client
        import json
        import os

        from mfar_tpu.data import trec

        server.start_background()
        queries = trec.read_queries(os.path.join(args.queries, "test.queries"))
        conn = http.client.HTTPConnection(server.host, server.port, timeout=300)
        conn.request("POST", "/retrieve",
                     json.dumps({"queries": list(queries.values()),
                                 "top_k": args.top_k}),
                     {"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        with open(args.smoke_out, "w") as f:
            json.dump({"qids": list(queries), "results": resp["results"],
                       "stats": stats}, f)
        print(f"[serve] smoke: {len(queries)} queries -> {args.smoke_out}",
              flush=True)
        server.shutdown()
        if proxy is not None:
            proxy.stop()
        return

    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("[serve] shutting down")
        server.shutdown()
    finally:
        if proxy is not None:
            proxy.stop()


if __name__ == "__main__":
    main()
