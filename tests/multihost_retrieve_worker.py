"""Worker process for the 2-process multihost RETRIEVE parity tests.

Each worker owns 4 virtual CPU devices; the retrieve CLI's ``--multihost
force`` boots ``jax.distributed`` (MFAR_* env) and serves the test query
partition over one 8-device global mesh.  Extra argv tokens are forwarded
as retrieve flags, so one worker covers every serving topology the tests
parametrize (``--n-replica 2``, ``--corpus-per-slice``, ``--corpus-on-host``,
``--quantize int8``).  MFAR_DEBUG_SERVE_PATH is set so the engine prints
which serving program each dispatch chose -- the parent test asserts the
routing (e.g. int8 mesh hybrid rides the fused raw-postings program under
multiprocess, reference posture being replaced: the host-combined [B, N]
fallback).  Spawned by tests/test_multihost.py.
"""

import os
import sys

# Workers run as plain scripts (sys.path[0] = tests/), so the repo root
# must be inserted for `import mfar_tpu` regardless of install state.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, port, ds, idx, out = sys.argv[1:7]
    extra = sys.argv[7:]  # additional retrieve flags (the serving topology)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["MFAR_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["MFAR_NUM_PROCESSES"] = nproc
    os.environ["MFAR_PROCESS_ID"] = pid
    os.environ["MFAR_DEBUG_SERVE_PATH"] = "1"

    import jax

    jax.config.update("jax_platforms", "cpu")  # the sitecustomize re-pins env

    from mfar_tpu.commands import retrieve

    retrieve.main([
        "--dataset-name", "amazon", "--data", ds, "--out", out,
        "--lexical-index", idx,
        "--field-names", "title_dense,title_sparse",
        "--model-name", "synthetic",
        "--partition", "test", "--top-k", "10", "--batch-size", "8",
        "--multihost", "force",
        *extra,
    ])
    print(f"[worker {pid}] done", flush=True)


if __name__ == "__main__":
    main()
