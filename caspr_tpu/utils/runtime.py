"""Runtime knobs shared by CLIs/tools: persistent XLA compile cache.

Compiles of the full pipeline take many minutes on a single host core;
caching them across processes makes reruns near-instant."""

import os


def enable_compile_cache(path: str = "/tmp/caspr_tpu_jax_cache"):
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
