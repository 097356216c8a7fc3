"""Parity tests for the partition-free fused stripe attention + LePE kernel
(ops/stripe_attention.py) against its plain-XLA twin and against the
partitioned LePEAttention composition — Pallas paths run in interpreter mode
so this works off-TPU.

Geometry matrix mirrors ga_cswin_tiny's idx=0 stages at 224 (scaled down):
split 1 on wide grids (stage-1 shape, packing 2), split 2 (stage-2), split 7
(stage-3, the 21-block hot stage, pack 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagenet_models_tpu.ops.stripe_attention import (
    _stripe_pack,
    _vs_bwd_pallas,
    _vs_fwd_pallas,
    plain_stripe_attention,
)

CASES = [
    # (b, h, w, cb, nh, ws)
    (2, 14, 14, 32, 1, 1),    # stage-1 shape: width-1 stripes, pack 2
    (2, 14, 14, 64, 2, 2),    # stage-2 shape
    (1, 14, 14, 128, 4, 7),   # stage-3 shape: 98-token stripes, j=2
    (2, 8, 12, 64, 2, 2),     # non-square, 6 stripes
    (3, 8, 9, 96, 3, 3),      # odd batch, odd stripe count -> pack 1
]


def _mk(b, h, w, cb, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (b, h, w, cb), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, w, cb), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, w, cb), jnp.float32)
    w9 = 0.2 * jax.random.normal(ks[3], (9, cb), jnp.float32)
    wb = 0.1 * jax.random.normal(ks[4], (1, cb), jnp.float32)
    return q, k, v, w9, wb


@pytest.mark.parametrize("b,h,w,cb,nh,ws", CASES)
def test_fwd_parity(b, h, w, cb, nh, ws):
    q, k, v, w9, wb = _mk(b, h, w, cb)
    scale = (cb // nh) ** -0.5
    pack = _stripe_pack(h * ws, w // ws)
    ref = plain_stripe_attention(q, k, v, w9, wb, ws=ws, nh=nh, scale=scale)
    out = _vs_fwd_pallas(q, k, v, w9, wb, ws=ws, nh=nh, scale=scale,
                         pack=pack, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,h,w,cb,nh,ws", CASES[:3])
def test_bwd_parity(b, h, w, cb, nh, ws):
    q, k, v, w9, wb = _mk(b, h, w, cb, seed=3)
    scale = (cb // nh) ** -0.5
    pack = _stripe_pack(h * ws, w // ws)
    g = jax.random.normal(jax.random.PRNGKey(9), (b, h, w, cb), jnp.float32)
    _, vjp = jax.vjp(
        lambda *a: plain_stripe_attention(*a, ws=ws, nh=nh, scale=scale),
        q, k, v, w9, wb)
    refs = vjp(g)
    outs = _vs_bwd_pallas(q, k, v, w9, wb, g, ws=ws, nh=nh, scale=scale,
                          pack=pack, interpret=True)
    for name, o, r in zip(("dq", "dk", "dv", "dw9", "dwb"), outs, refs):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=3e-5, atol=3e-5, err_msg=name)


def test_pack_unpacked_equivalence():
    """Packing stripes under the block-diagonal mask must not change the
    kernel result vs pack=1 (width-1 stripes are where packing engages)."""
    q, k, v, w9, wb = _mk(2, 14, 14, 32, seed=5)
    r1 = _vs_fwd_pallas(q, k, v, w9, wb, ws=1, nh=1, scale=1.0, pack=1,
                        interpret=True)
    r2 = _vs_fwd_pallas(q, k, v, w9, wb, ws=1, nh=1, scale=1.0, pack=2,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=1e-5, atol=1e-5)


def test_plain_matches_lepe_attention_composition():
    """The twin (and hence the kernel) reproduces the partitioned
    LePEAttention idx=0 path (ga_cswin.py:59-136 semantics): img2windows on
    q/k/v, per-window depthwise-3x3 LePE on v, softmax attention, reverse.
    Driven through the real flax module on CPU with the fused path disabled
    vs the stripe_attention public entry with the module's own weights."""
    from imagenet_models_tpu.ops.cswin_attention import LePEAttention
    from imagenet_models_tpu.ops.stripe_attention import stripe_attention

    b, h, w, cb, nh, ws = 2, 14, 14, 64, 2, 2
    q, k, v, _, _ = _mk(b, h, w, cb, seed=7)
    m = LePEAttention(cb, nh, idx=0, split_size=ws)
    variables = m.init(jax.random.PRNGKey(0), q, k, v)
    import os

    os.environ["IMTPU_STRIPE_ATTN"] = "xla"
    try:
        ref = m.apply(variables, q, k, v)
    finally:
        del os.environ["IMTPU_STRIPE_ATTN"]
    kern = variables["params"]["get_v"]["kernel"]
    bias = variables["params"]["get_v"]["bias"]
    out = stripe_attention(q, k, v, kern.reshape(9, cb),
                           bias.reshape(1, cb), ws=ws, num_heads=nh,
                           scale=(cb // nh) ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_module_dispatch_grads():
    """LePEAttention's fused dispatch is differentiable end-to-end and
    matches the xla path's gradients (CPU: platform_dependent routes the
    fused op to the plain twin, so this pins the dispatch plumbing + the
    get_v param refactor)."""
    import os

    from imagenet_models_tpu.ops.cswin_attention import LePEAttention

    b, h, w, cb, nh, ws = 2, 8, 8, 32, 1, 2
    q, k, v, _, _ = _mk(b, h, w, cb, seed=11)
    m = LePEAttention(cb, nh, idx=0, split_size=ws)
    variables = m.init(jax.random.PRNGKey(1), q, k, v)

    def loss(vs, flag):
        if flag:
            os.environ["IMTPU_STRIPE_ATTN"] = "xla"
        try:
            return jnp.sum(m.apply(vs, q, k, v) ** 2)
        finally:
            os.environ.pop("IMTPU_STRIPE_ATTN", None)

    g_fused = jax.grad(lambda vs: loss(vs, False))(variables)
    g_xla = jax.grad(lambda vs: loss(vs, True))(variables)
    for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(g_fused),
            jax.tree_util.tree_leaves_with_path(g_xla)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=str(pa))
