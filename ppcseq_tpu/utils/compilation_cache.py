"""Persistent XLA compilation cache for cold-start latency.

In-process executables are already reused (samplers cache per log-density fn
with data as an operand), but a fresh process pays full trace+compile
(~30-60s on TPU for the two-pass pipeline). XLA's persistent cache removes
that across processes. Opt-in: the CLI and bench enable it; library imports
never mutate global JAX config. Set PPCSEQ_COMPILATION_CACHE=0 to disable,
or to a path to relocate it.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache; returns the dir (or None)."""
    env = os.environ.get("PPCSEQ_COMPILATION_CACHE")
    if env == "0":
        return None
    import jax

    # Experimental/plugin backends (e.g. tunneled devices) can hang on
    # executable serialization — only standard platforms get the cache.
    # default_backend() can masquerade as "tpu" for tunneled plugins, so
    # inspect the requested platform list too.
    requested = (jax.config.jax_platforms or "") + os.environ.get("JAX_PLATFORMS", "")
    if "axon" in requested:
        return None
    if jax.default_backend() not in ("cpu", "tpu", "gpu", "cuda"):
        return None
    if cache_dir is None:
        cache_dir = env or os.path.join(
            os.path.expanduser("~"), ".cache", "ppcseq_tpu", "xla"
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
