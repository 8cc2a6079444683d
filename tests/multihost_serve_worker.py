"""Worker process for the 2-process multihost SERVING-daemon test.

Process 0 owns the HTTP port and broadcasts each micro-batch through
``MultihostEngineProxy``; process 1 sits in ``follower_loop`` running the
identical engine program over the shared 8-device mesh.  ``--smoke-out``
drives the whole stack (warmup -> bind -> HTTP POST of the test queries ->
stats -> clean shutdown incl. the stop broadcast) without external traffic.
Spawned by tests/test_multihost.py.
"""

import os
import sys

# Workers run as plain scripts (sys.path[0] = tests/), so the repo root
# must be inserted for `import mfar_tpu` regardless of install state.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, port, ds, idx, out = sys.argv[1:7]
    extra = sys.argv[7:]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["MFAR_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["MFAR_NUM_PROCESSES"] = nproc
    os.environ["MFAR_PROCESS_ID"] = pid
    os.environ["MFAR_DEBUG_SERVE_PATH"] = "1"

    import jax

    jax.config.update("jax_platforms", "cpu")  # the sitecustomize re-pins env

    from mfar_tpu.commands import serve

    serve.main([
        "--dataset-name", "amazon", "--data", ds, "--lexical-index", idx,
        "--field-names", "title_dense,title_sparse",
        "--model-name", "synthetic",
        "--top-k", "10", "--max-batch", "8", "--port", "0",
        "--multihost", "force", "--smoke-out", out,
        *extra,
    ])
    print(f"[worker {pid}] done", flush=True)


if __name__ == "__main__":
    main()
