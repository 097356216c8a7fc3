"""Parity tests for the fully-fused ConvNeXt branch kernel (dw7 + LN + MLP,
ops/convnext_branch.py) vs the plain composition, forward and backward,
including multi-step grid accumulation. CPU-pinned interpret mode — see
tests/test_convnext_kernel.py for why."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagenet_models_tpu.ops import convnext_branch as cbr
from imagenet_models_tpu.ops.convnext_block import plain_convnext_block

_CPU = jax.devices("cpu")[0]


@pytest.fixture(autouse=True)
def _on_cpu():
    with jax.default_device(_CPU):
        yield


def _args(b, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    hid = 4 * c
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    mk = lambda s, sc: jnp.asarray(rng.standard_normal(s) * sc, jnp.float32)
    return (x, mk((7, 7, 1, c), 0.1), mk((c,), 0.3), mk((c,), 0.3),
            mk((c,), 0.3), mk((c, hid), 0.05), mk((hid,), 0.3),
            mk((hid, c), 0.05), mk((c,), 0.3), mk((c,), 0.3))


@pytest.mark.parametrize("b,h,w,c,grp", [(4, 12, 12, 96, 0), (6, 8, 8, 128, 2)])
def test_branch_forward_matches_plain(b, h, w, c, grp, monkeypatch):
    if grp:
        monkeypatch.setattr(cbr, "_group", lambda *a, **k: grp)
    args = _args(b, h, w, c)
    with jax.default_matmul_precision("highest"):
        ref = plain_convnext_block(*args)
        got = cbr._branch_fwd_pallas(args[0], args[1].reshape(49, c), *args[2:],
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("b,h,w,c,grp", [(4, 12, 12, 96, 0), (6, 8, 8, 128, 2)])
def test_branch_backward_matches_plain_vjp(b, h, w, c, grp, monkeypatch):
    if grp:
        monkeypatch.setattr(cbr, "_group", lambda *a, **k: grp)
    args = _args(b, h, w, c, seed=1)
    g = jnp.asarray(np.random.default_rng(2).standard_normal(args[0].shape),
                    jnp.float32)
    with jax.default_matmul_precision("highest"):
        _, vjp = jax.vjp(lambda *a: plain_convnext_block(*a, eps=1e-6), *args)
        ref = vjp(g)
        got = cbr._branch_bwd_pallas(args[0], args[1].reshape(49, c), *args[2:],
                                     g, interpret=True)
    names = ["dx", "ddw_w", "ddw_b", "dln_s", "dln_b", "dw1", "db1", "dw2",
             "db2", "dgamma"]
    for nm, r, o in zip(names, ref, got):
        r = np.asarray(r)
        o = np.asarray(o).reshape(r.shape)
        np.testing.assert_allclose(o, r, rtol=5e-5, atol=5e-5, err_msg=nm)
