"""Parity tests for the Pallas depthwise-7x7 weight-grad kernel
(ops/dw_conv.py) against XLA autodiff of the plain conv, in TPU-interpret
mode on CPU (same pattern as tests/test_convnext_kernel.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from imagenet_models_tpu.ops import dw_conv as dc
from imagenet_models_tpu.ops.convnext_block import dw_conv7

_CPU = jax.devices("cpu")[0]


@pytest.fixture(autouse=True)
def _on_cpu():
    with jax.default_device(_CPU):
        yield


def _case(b, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    dw_w = jnp.asarray(rng.standard_normal((7, 7, 1, c)) * 0.1, jnp.float32)
    dw_b = jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    return x, dw_w, dw_b, g


@pytest.mark.parametrize("b,h,w,c", [(2, 14, 14, 96), (3, 8, 10, 128)])
def test_wgrad_kernel_matches_xla(b, h, w, c):
    x, dw_w, dw_b, g = _case(b, h, w, c)
    with jax.default_matmul_precision("highest"):
        _, vjp = jax.vjp(dw_conv7, x, dw_w, dw_b)
        ref_dx, ref_dw, ref_db = vjp(g)
        with pltpu.force_tpu_interpret_mode():
            got_dw = dc.dw7_wgrad(x, g)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=2e-4, atol=2e-4)


def test_custom_vjp_full_parity():
    """grad through dw_conv7_opt (fwd XLA, dx XLA, dw Pallas) == plain conv
    autodiff for every input."""
    x, dw_w, dw_b, g = _case(2, 12, 12, 96, seed=3)

    def loss_opt(x, w, b):
        return jnp.sum(dc.dw_conv7_opt(x, w, b) * g)

    def loss_plain(x, w, b):
        return jnp.sum(dw_conv7(x, w, b) * g)

    with jax.default_matmul_precision("highest"):
        ref = jax.grad(loss_plain, argnums=(0, 1, 2))(x, dw_w, dw_b)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_opt, argnums=(0, 1, 2))(x, dw_w, dw_b)
    for nm, r, o in zip(("dx", "dw", "db"), ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=nm)


def test_shiftadd_matches_conv():
    """The 49-tap stencil formulation (IMTPU_DW_SHIFTADD probe) must equal
    the lax.conv lowering, values and grads."""
    from imagenet_models_tpu.ops.convnext_block import _dw_conv7_shiftadd

    x, dw_w, dw_b, g = _case(2, 12, 12, 96, seed=7)

    def loss(fn, x, w, b):
        return jnp.sum(fn(x, w, b) * g)

    with jax.default_matmul_precision("highest"):
        ref_y = dw_conv7(x, dw_w, dw_b)
        got_y = _dw_conv7_shiftadd(x, dw_w, dw_b)
        ref = jax.grad(lambda *a: loss(dw_conv7, *a), argnums=(0, 1, 2))(x, dw_w, dw_b)
        got = jax.grad(lambda *a: loss(_dw_conv7_shiftadd, *a), argnums=(0, 1, 2))(x, dw_w, dw_b)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y), rtol=2e-5, atol=2e-5)
    for nm, r, o in zip(("dx", "dw", "db"), ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=nm)


def test_hybrid_matches_conv():
    """Hybrid probe (IMTPU_DW_HYBRID: stencil forward, XLA-conv dx/wgrad via
    custom VJP) must equal the lax.conv lowering, values and grads — in
    particular the batch_group_count wgrad formulation."""
    from imagenet_models_tpu.ops.convnext_block import _dw_conv7_hybrid

    x, dw_w, dw_b, g = _case(3, 12, 12, 96, seed=11)

    def loss(fn, x, w, b):
        return jnp.sum(fn(x, w, b) * g)

    with jax.default_matmul_precision("highest"):
        ref_y = dw_conv7(x, dw_w, dw_b)
        got_y = _dw_conv7_hybrid(x, dw_w, dw_b)
        ref = jax.grad(lambda *a: loss(dw_conv7, *a), argnums=(0, 1, 2))(x, dw_w, dw_b)
        got = jax.grad(lambda *a: loss(_dw_conv7_hybrid, *a), argnums=(0, 1, 2))(x, dw_w, dw_b)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y), rtol=2e-5, atol=2e-5)
    for nm, r, o in zip(("dx", "dw", "db"), ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=nm)


def test_forward_unchanged():
    x, dw_w, dw_b, _ = _case(2, 10, 10, 64, seed=5)
    ref = dw_conv7(x, dw_w, dw_b)
    got = dc.dw_conv7_opt(x, dw_w, dw_b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)
