"""envidr_tpu: TPU-native neural inverse renderer (ENVIDR capabilities)."""

import os

__version__ = "0.1.0"


def enable_compilation_cache(path: str = "~/.cache/envidr_jax"):
    """Persistent XLA compilation cache — first-compile of the train step can
    take minutes through a remote compile service; cache across processes."""
    import jax

    p = os.path.expanduser(path)
    os.makedirs(p, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", p)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
