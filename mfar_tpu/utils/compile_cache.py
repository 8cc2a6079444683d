"""Persistent XLA compilation cache for the CLIs and benchmarks.

Every distinct jitted program costs a fresh XLA compile per process launch
-- on the TPU rig a REMOTE compile, ~20-40 s each -- and the serving /
training CLIs are short-lived processes that recompile the same programs
every run.  JAX's persistent compilation cache
(``jax_compilation_cache_dir``) keys serialized executables by HLO +
compile options + platform, so repeat launches deserialize instead of
recompiling (train relaunches, retrieve sweeps, mask_fields' ~2F+3 evals,
the bench re-runs).

Env control:
  MFAR_COMPILE_CACHE=off    disable
  MFAR_COMPILE_CACHE=on     force on (even under JAX_PLATFORMS=cpu)
  MFAR_COMPILE_CACHE=<dir>  force on at this location
  (default: on for TPU runs at ~/.cache/mfar_tpu/xla; off when
  JAX_PLATFORMS forces cpu -- XLA:CPU's AOT loader logs spurious
  machine-feature-mismatch errors on reload, and CPU compiles are fast
  enough not to need it)
"""

from __future__ import annotations

import os
from typing import Optional


def enable(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a stable directory.

    Returns the cache dir, or None when disabled (MFAR_COMPILE_CACHE=off,
    or a cpu-forced run without an explicit opt-in) or unavailable (config
    setting failed -- never fatal: the cache is an accelerator, not a
    dependency)."""
    env = os.environ.get("MFAR_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "false", "none", "no"):
        return None
    cpu_forced = os.environ.get("JAX_PLATFORMS", "").lower().startswith("cpu")
    if cpu_forced and not env and path is None:
        return None
    if env.lower() in ("on", "1", "true", "yes"):  # force-on synonyms, not
        env = ""  # literal directory names
    path = path or env or os.path.expanduser("~/.cache/mfar_tpu/xla")
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # noqa: BLE001 -- unsupported backend/config: skip
        return None
    return path
