"""Streaming host<->device runtime: pipeline, tracing, journal."""

import os


def enable_compile_cache(path: str = None) -> None:
    """Turn on JAX's persistent compilation cache (first compile of the
    production geometry takes ~30 s; cached restarts take milliseconds)."""
    import jax

    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return  # already configured (e.g. by the test harness)
    cache_dir = path or os.environ.get(
        "DESTRIPE_COMPILE_CACHE", os.path.expanduser("~/.cache/destripe_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
