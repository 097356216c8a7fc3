"""Parity tests for the fused Pallas BatchNorm statistics (ops/batch_norm.py)
against the plain-ops formulation, in TPU-interpret mode on a CPU device (the
same convention as tests/test_convnext_kernel.py). The plain path itself is
pinned against torch BatchNorm2d in tests/test_layers.py / test_split_bn.py;
these tests pin kernel == plain (forward, statistics, and the custom-VJP
backward including the gmean/gvar cotangent terms).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from imagenet_models_tpu.ops import batch_norm as bn

_CPU = jax.devices("cpu")[0]


@pytest.fixture(autouse=True)
def _on_cpu():
    with jax.default_device(_CPU):
        yield


def _x(shape, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape) * 2.0 + 0.5, dtype)


@pytest.mark.parametrize("shape", [(4, 8, 8, 64), (2, 16, 16, 96), (8, 8, 8, 128)])
def test_channel_moments_match_plain(shape):
    x = _x(shape)
    with pltpu.force_tpu_interpret_mode():
        s1, s2 = bn.channel_moments(x)
    xf = np.asarray(x, np.float64).reshape(-1, shape[-1])
    np.testing.assert_allclose(np.asarray(s1), xf.sum(0), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), (xf * xf).sum(0), rtol=1e-5, atol=1e-4)


def test_channel_dot_sums_match_plain():
    a, b = _x((4, 8, 8, 64), 1), _x((4, 8, 8, 64), 2)
    with pltpu.force_tpu_interpret_mode():
        s1, s2 = bn.channel_dot_sums(a, b)
    af = np.asarray(a, np.float64).reshape(-1, 64)
    bf = np.asarray(b, np.float64).reshape(-1, 64)
    np.testing.assert_allclose(np.asarray(s1), af.sum(0), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), (af * bf).sum(0), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_forward_matches_plain(dtype):
    x = _x((4, 8, 8, 64), dtype=dtype)
    scale = _x((64,), 3) * 0.5 + 1.0
    bias = _x((64,), 4) * 0.1
    ref_y, ref_mean, ref_var = bn.plain_bn_train(x, scale, bias, 1e-5)
    with pltpu.force_tpu_interpret_mode():
        y, mean, var = bn.fused_bn_train(x, scale, bias, 1e-5)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(var), np.asarray(ref_var),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32),
                               rtol=tol, atol=5 * tol)


def test_fused_backward_matches_autodiff():
    """Custom VJP == autodiff through the plain formulation, with non-zero
    cotangents on y AND the returned statistics (gmean/gvar terms)."""
    x = _x((2, 8, 8, 64))
    scale = _x((64,), 3) * 0.5 + 1.0
    bias = _x((64,), 4) * 0.1
    wy, wm, wv = _x((2, 8, 8, 64), 5), _x((64,), 6), _x((64,), 7)

    def loss(fn, x, scale, bias):
        y, mean, var = fn(x, scale, bias, 1e-5)
        return (jnp.sum(y.astype(jnp.float32) * wy)
                + jnp.sum(mean * wm) + jnp.sum(var * wv))

    ref = jax.grad(lambda *a: loss(bn.plain_bn_train, *a), argnums=(0, 1, 2))(
        x, scale, bias)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(lambda *a: loss(bn.fused_bn_train, *a), argnums=(0, 1, 2))(
            x, scale, bias)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_module_routes_and_matches(monkeypatch):
    """nn.layers.BatchNorm training output + running-stat updates are
    identical whether the fused path is gated on or off (on CPU both resolve
    to the same plain math via platform_dependent, pinning the wiring:
    normalize, unbiased running var, momentum)."""
    from imagenet_models_tpu.nn.layers import BatchNorm

    monkeypatch.setattr(bn, "_PALLAS_BN_MODE", "1")  # default is off (loser)
    x = _x((8, 32, 32, 64))  # big enough for use_fused_bn's size gate
    assert bn.use_fused_bn(x)
    mod = BatchNorm()
    v = mod.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y1, m1 = mod.apply(v, x, use_running_average=False, mutable=["batch_stats"])

    import imagenet_models_tpu.nn.layers as L

    orig = L._use_fused_bn
    L._use_fused_bn = lambda _: False
    try:
        y2, m2 = mod.apply(v, x, use_running_average=False,
                           mutable=["batch_stats"])
    finally:
        L._use_fused_bn = orig
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6, atol=1e-6)
    for (k1, s1), (k2, s2) in zip(
            jax.tree_util.tree_leaves_with_path(m1["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(m2["batch_stats"])):
        assert k1 == k2
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-6, atol=1e-6)


def test_use_fused_bn_gate(monkeypatch):
    assert not bn.use_fused_bn(_x((8, 32, 32, 64)))   # default: off (loser)
    monkeypatch.setattr(bn, "_PALLAS_BN_MODE", "1")
    assert not bn.use_fused_bn(_x((4, 64)))           # rank 2
    assert not bn.use_fused_bn(_x((2, 4, 4, 8)))      # too small
    assert bn.use_fused_bn(_x((8, 32, 32, 64)))
    assert not bn.use_fused_bn(jnp.zeros((8, 32, 32, 64), jnp.int32))
