"""Persistent XLA compilation cache.

On this class of deployment (remote-compile TPU frontends), a fresh
process pays ~60-120 s re-compiling the big epoch/eval programs it
compiled last run. JAX's persistent compilation cache keys executables
by HLO + compile options + backend version, so enabling it is safe
across code changes — and measured on the axon v5e tunnel it cuts a
second process's compile of the same program from 13.6 s to 1.9 s
(2048x2048 probe; the epoch-scan programs save minutes).

``enable_compilation_cache`` is called by the CLI (heat_tpu.main), the
benchmarks, and the dryrun entry; library users opt in explicitly. It
never overrides a cache dir the user already configured (via
``jax.config`` or the ``JAX_COMPILATION_CACHE_DIR`` env var), and
``HEAT_TPU_NO_COMPILATION_CACHE=1`` disables it.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "heat_tpu", "xla"
)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``
    (default ``~/.cache/heat_tpu/xla``, overridable via
    ``HEAT_TPU_CACHE_DIR``). Returns the directory in effect, or None
    when disabled or already configured elsewhere."""
    import jax

    if os.environ.get("HEAT_TPU_NO_COMPILATION_CACHE") == "1":
        return None
    current = jax.config.jax_compilation_cache_dir
    if current or os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return current  # user already chose one — keep it
    cache_dir = (
        cache_dir
        or os.environ.get("HEAT_TPU_CACHE_DIR")
        or _DEFAULT_DIR
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache anything that took >=1 s to compile (the tunnel's fixed
        # per-compile latency already exceeds this for real programs).
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except (OSError, AttributeError):  # pragma: no cover - best effort
        return None
    return cache_dir
