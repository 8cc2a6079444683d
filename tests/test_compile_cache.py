"""Persistent XLA compilation cache wiring (utils/compile_cache)."""

import os

import jax

from mfar_tpu.utils.compile_cache import enable


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("MFAR_COMPILE_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    prev_t = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_s = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        d = str(tmp_path / "xla")
        got = enable(d)
        assert got == d and os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

        # Populated by a real compile (CPU supports executable
        # serialization on this jax).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        import numpy as np

        jax.jit(lambda x: (x @ x).sum() + 41)(np.ones((64, 64), np.float32))
        assert len(os.listdir(d)) >= 1
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_t)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_s)


def test_enable_respects_off_switch(monkeypatch):
    monkeypatch.setenv("MFAR_COMPILE_CACHE", "off")
    assert enable() is None


def test_enable_env_override(tmp_path, monkeypatch):
    d = str(tmp_path / "envdir")
    monkeypatch.setenv("MFAR_COMPILE_CACHE", d)
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert enable() == d and os.path.isdir(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_enable_defaults_off_when_cpu_forced(monkeypatch):
    """CPU-forced runs (JAX_PLATFORMS=cpu, e.g. the test suite) skip the
    cache unless explicitly opted in -- XLA:CPU's AOT loader logs spurious
    feature-mismatch errors on reload."""
    monkeypatch.delenv("MFAR_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert enable() is None
