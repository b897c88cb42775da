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


def apply_device_env():
    """Honor ENVIDR_DEVICE=cpu — needed because the environment's
    sitecustomize pre-pins jax to the (single-tenant) TPU tunnel, so apps that
    should not contend with a running training job can opt onto CPU."""
    if os.environ.get("ENVIDR_DEVICE") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
