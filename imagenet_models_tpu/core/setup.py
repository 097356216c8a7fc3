"""Process-level JAX setup shared by the CLIs."""

from __future__ import annotations

import os


def setup_jax(cache_dir: str = "", platform: str = ""):
    """Enable the persistent compilation cache (first-compile costs on this
    class of host are large; the cache amortizes them across runs).

    Platform selection: some TPU plugins pin jax_platforms via config at
    import, overriding the JAX_PLATFORMS env var — so an explicit request
    (IMTPU_PLATFORM env or `platform` arg) is applied through jax.config.
    """
    import jax

    platform = platform or os.environ.get("IMTPU_PLATFORM", "")
    if platform:
        jax.config.update("jax_platforms", platform)
    cache_dir = cache_dir or os.environ.get(
        "IMTPU_JAX_CACHE", os.path.expanduser("~/.cache/imtpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax
        pass


def jit_init(model, rng, x, **kwargs):
    """Initialise model variables under jit: one fused XLA compilation instead
    of per-op eager compiles (load-bearing on slow-compile hosts)."""
    import jax

    static = {k: v for k, v in kwargs.items()}

    def init_fn(rng, x):
        return model.init(rng, x, **static)

    return jax.jit(init_fn)(rng, x)
