"""Persistent-compilation-cache plumbing (utils/cache.py)."""

import os

import jax

from heat_tpu.utils.cache import enable_compilation_cache


def test_enable_sets_default_dir(tmp_path, monkeypatch):
    # A pre-set JAX_COMPILATION_CACHE_DIR makes enable_compilation_cache
    # return early with None — clear it so the test is hermetic.
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.setenv("HEAT_TPU_CACHE_DIR", str(tmp_path / "xla"))
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        out = enable_compilation_cache()
        assert out == str(tmp_path / "xla")
        assert os.path.isdir(out)
        assert jax.config.jax_compilation_cache_dir == out
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_enable_respects_existing_config(tmp_path, monkeypatch):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.delenv("HEAT_TPU_CACHE_DIR", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", str(tmp_path))
        assert enable_compilation_cache() == str(tmp_path)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_enable_disabled_by_env(monkeypatch):
    monkeypatch.setenv("HEAT_TPU_NO_COMPILATION_CACHE", "1")
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        assert enable_compilation_cache() is None
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
