"""Worker process for the 2-process multihost integration test.

Each worker owns 4 virtual CPU devices; ``jax.distributed.initialize`` (via
the train CLI's --multihost force + MFAR_* env) wires them into one 8-device
global mesh.  The full train CLI then runs end-to-end: sharded train step,
proxy validation, corpus (re)index, exact hybrid retrieval eval, process-0
checkpointing.  Spawned by tests/test_multihost.py.
"""

import os
import sys

# Workers run as plain scripts (sys.path[0] = tests/), so the repo root
# must be inserted for `import mfar_tpu` regardless of install state.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, port, ds, idx, scores, out = sys.argv[1:8]
    extra = sys.argv[8:]  # additional train flags (e.g. --n-model 2)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["MFAR_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["MFAR_NUM_PROCESSES"] = nproc
    os.environ["MFAR_PROCESS_ID"] = pid

    import jax

    jax.config.update("jax_platforms", "cpu")  # the sitecustomize re-pins env

    from mfar_tpu.commands import train as train_cmd

    train_cmd.main([
        "--dataset-name", "amazon", "--data", ds, "--out", out,
        "--lexical-index", idx, "--sparse-scores-path", scores,
        "--field-names", "title_dense,title_sparse",
        "--model-name", "synthetic", "--weights-lr", "0.1",
        "--train-batch-size", "8", "--max-epochs", "2",
        "--trec-val-freq", "1", "--recall-k", "10", "--dev-batch-size", "8",
        "--multihost", "force",
        *extra,
    ])
    print(f"[worker {pid}] done", flush=True)


if __name__ == "__main__":
    main()
