"""Parity tests for the fused window-attention Pallas kernel vs the plain
XLA composition (ops/flash_attention.py). CPU-pinned interpret mode — see
tests/test_convnext_kernel.py for why."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagenet_models_tpu.ops.flash_attention import (
    fused_window_attention,
    plain_window_attention,
    window_attention,
)

_CPU = jax.devices("cpu")[0]


@pytest.fixture(autouse=True)
def _on_cpu():
    with jax.default_device(_CPU):
        yield


# (BW, N, D): CSWin stripes (56, 98), stage-5 full window (49), ragged pad
_SHAPES = [(16, 56, 32), (8, 98, 32), (16, 49, 32), (4, 50, 24)]


@pytest.mark.parametrize("bw,n,d", _SHAPES)
@pytest.mark.parametrize("with_bias", [False, True])
def test_fused_matches_plain(bw, n, d, with_bias):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((bw, n, d)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((bw, n, d)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((bw, n, d)) * 0.3, jnp.float32)
    b = (jnp.asarray(rng.standard_normal((bw, n, n)) * 0.3, jnp.float32)
         if with_bias else None)
    with jax.default_matmul_precision("highest"):
        ref = plain_window_attention(q, k, v, b)
        got = fused_window_attention(q, k, v, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_dispatch_differentiable():
    """grad through window_attention (plain path on CPU) == grad of plain."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((4, 56, 32)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((4, 56, 32)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((4, 56, 32)) * 0.3, jnp.float32)

    def loss_d(q, k, v):
        return jnp.sum(window_attention(q, k, v) ** 2)

    def loss_p(q, k, v):
        return jnp.sum(plain_window_attention(q, k, v) ** 2)

    with jax.default_matmul_precision("highest"):
        g_d = jax.grad(loss_d, argnums=(0, 1, 2))(q, k, v)
        g_p = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_d, g_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("bw,h,n,d", [(8, 2, 49, 32), (4, 3, 50, 24)])
def test_fused_heads_matches_plain(bw, h, n, d):
    from imagenet_models_tpu.ops.flash_attention import (
        fused_window_attention_heads,
        plain_window_attention_heads,
    )
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((bw, h, n, d)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((bw, h, n, d)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((bw, h, n, d)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((h, n, n)) * 0.3, jnp.float32)
    with jax.default_matmul_precision("highest"):
        ref = plain_window_attention_heads(q, k, v, b)
        got = fused_window_attention_heads(q, k, v, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
