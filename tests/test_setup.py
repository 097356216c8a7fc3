"""core/setup.py process-level helpers: stale-compile-cache recovery.

A persistent-cache entry serialized under an older libtpu build fails at
first dispatch with FAILED_PRECONDITION (observed live: MULTICHIP_r01).
run_with_cache_recovery must wipe the cache and retry exactly once for that
error class and must NOT swallow anything else. jit_init is the first device
work in train.py/validate.py and routes through the same recovery.
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


def test_recovery_retries_once_on_stale_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("IMTPU_JAX_CACHE", str(tmp_path / "cache"))
    calls = []

    def fn():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError(
                "FAILED_PRECONDITION: libtpu version mismatch: terminal has X,"
                " client AOT libtpu has Y")
        return 42

    assert run_with_cache_recovery(fn) == 42
    assert len(calls) == 2
    # the wipe must leave an (empty) cache dir behind: jax does not recreate
    # a vanished dir when persisting entries, it drops them with a warning
    assert (tmp_path / "cache").is_dir()
    assert not list((tmp_path / "cache").iterdir())


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
