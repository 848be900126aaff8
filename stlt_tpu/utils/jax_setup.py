"""JAX runtime setup helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (works through this
    environment's remote-compile relay too: measured 107s → 17s for a repeat
    process). Override the location with STLT_JAX_CACHE; set it to '0' to
    disable."""
    import jax

    env = os.environ.get("STLT_JAX_CACHE")
    if env == "0":
        return
    cache_dir = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "stlt_tpu_jax"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
