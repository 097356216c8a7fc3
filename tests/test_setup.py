"""core/setup.py process-level helpers: stale-compile-cache recovery.

A persistent-cache entry serialized under an older libtpu build fails at
first dispatch with FAILED_PRECONDITION (observed live: MULTICHIP_r01), but
the tunneled backend also throws the same status as a transient. So recovery
is two-stage (ADVICE r2): first retry WITHOUT wiping (heals transients,
preserves ~10min/entry of cache); a second FAILED_PRECONDITION wipes the
*configured* cache dir and retries cold. Nothing else is swallowed. jit_init
is the first device work in train.py/validate.py and routes through the same
recovery.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from imagenet_models_tpu.core.setup import (
    _is_stale_cache_error,
    jit_init,
    run_with_cache_recovery,
)


def _stale_error():
    return RuntimeError(
        "FAILED_PRECONDITION: libtpu version mismatch: terminal has X,"
        " client AOT libtpu has Y")


def test_recovery_transient_retries_without_wiping(tmp_path, monkeypatch):
    """One FAILED_PRECONDITION then success = a transient: the cache must
    survive untouched."""
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "entry").write_text("10 minutes of compile time")
    monkeypatch.setenv("IMTPU_JAX_CACHE", str(cache))
    calls = []

    def fn():
        calls.append(1)
        if len(calls) == 1:
            raise _stale_error()
        return 42

    assert run_with_cache_recovery(fn) == 42
    assert len(calls) == 2
    assert (cache / "entry").read_text() == "10 minutes of compile time"


def test_recovery_wipes_on_second_failure(tmp_path, monkeypatch):
    """Two consecutive FAILED_PRECONDITIONs = a deterministically stale
    entry: wipe the cache, retry cold, and leave an (empty) dir behind (jax
    drops persist-writes into a vanished dir)."""
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "stale_entry").write_text("x")
    monkeypatch.setenv("IMTPU_JAX_CACHE", str(cache))
    original = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(cache))
    calls = []

    def fn():
        calls.append(1)
        if len(calls) <= 2:
            raise _stale_error()
        return 42

    try:
        assert run_with_cache_recovery(fn) == 42
        assert len(calls) == 3
        assert cache.is_dir()
        assert not list(cache.iterdir())
    finally:
        jax.config.update("jax_compilation_cache_dir", original)


def test_recovery_wipes_the_configured_cache_dir(tmp_path, monkeypatch):
    """The wipe must target jax.config.jax_compilation_cache_dir (what
    setup_jax(cache_dir=...) actually configured), not the env/default path
    (ADVICE r2 finding #1)."""
    env_cache = tmp_path / "env_cache"
    env_cache.mkdir()
    (env_cache / "keep").write_text("x")
    configured = tmp_path / "configured"
    configured.mkdir()
    (configured / "stale").write_text("x")
    monkeypatch.setenv("IMTPU_JAX_CACHE", str(env_cache))
    original = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(configured))
    calls = []

    def fn():
        calls.append(1)
        if len(calls) <= 2:
            raise _stale_error()
        return 42

    try:
        assert run_with_cache_recovery(fn) == 42
        assert (env_cache / "keep").exists()        # untouched
        assert configured.is_dir()
        assert not list(configured.iterdir())       # wiped + recreated
    finally:
        jax.config.update("jax_compilation_cache_dir", original)


def test_recovery_does_not_swallow_other_errors():
    calls = []

    def fn():
        calls.append(1)
        raise ValueError("unrelated failure")

    with pytest.raises(ValueError, match="unrelated"):
        run_with_cache_recovery(fn)
    assert len(calls) == 1  # no retry


def test_is_stale_cache_error_classifier():
    assert _is_stale_cache_error(RuntimeError("... FAILED_PRECONDITION ..."))
    assert _is_stale_cache_error(
        RuntimeError("TPU backend error (FailedPrecondition)"))
    assert not _is_stale_cache_error(RuntimeError("RESOURCE_EXHAUSTED: OOM"))


def test_jit_init_runs_under_recovery():
    class M(nn.Module):
        @nn.compact
        def __call__(self, x, training=False):
            return nn.Dense(4)(x)

    m = M()
    v = jit_init(m, jax.random.PRNGKey(0), jnp.zeros((2, 3)), training=False)
    assert v["params"]["Dense_0"]["kernel"].shape == (3, 4)
