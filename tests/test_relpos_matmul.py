"""IMTPU_RELPOS_MATMUL=1: the one-hot-matmul rel-pos bias resolution must be
bit-equivalent (values and gradients) to the gather formulation it replaces
(ops/window_attention.RelPosBiasTf)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagenet_models_tpu.ops import window_attention as wa


@pytest.fixture(autouse=True)
def _reset_env(monkeypatch):
    yield


def _bias_and_grad(monkeypatch, on: bool):
    monkeypatch.setenv("IMTPU_RELPOS_MATMUL", "1" if on else "")
    mod = wa.RelPosBiasTf(window_size=(7, 7), num_heads=4)
    rng = np.random.default_rng(0)
    table = rng.standard_normal((4, 13, 13)).astype(np.float32)
    variables = {"params": {"relative_position_bias_table": jnp.asarray(table)}}

    def f(v):
        return (mod.apply(v) * jnp.arange(49.0 * 49).reshape(49, 49)).sum()

    bias = mod.apply(variables)
    grad = jax.grad(f)(variables)
    return np.asarray(bias), np.asarray(
        grad["params"]["relative_position_bias_table"])


def test_matmul_relpos_matches_gather(monkeypatch):
    b0, g0 = _bias_and_grad(monkeypatch, on=False)
    b1, g1 = _bias_and_grad(monkeypatch, on=True)
    np.testing.assert_allclose(b1, b0, rtol=0, atol=1e-6)
    np.testing.assert_allclose(g1, g0, rtol=1e-6, atol=1e-4)
