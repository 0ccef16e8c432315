"""Common JAX runtime setup: persistent compilation cache (the remote-compile
tunnel costs minutes per module; the cache makes reruns instant)."""

import os


def setup_jax(platform=None, cache_dir=None):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    cache = cache_dir or os.environ.get("C2M_JAX_CACHE",
                                        os.path.expanduser("~/.cache/c2m_jax"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
