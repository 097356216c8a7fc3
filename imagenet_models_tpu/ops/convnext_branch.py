"""EXPERIMENT (not wired into models — measured slower; see below): fully
fused ConvNeXt branch kernel for TPU: depthwise-7x7 -> LayerNorm -> Dense(4C)
-> exact GELU -> Dense(C) -> layer-scale in ONE Pallas call (and one for the
backward).

Motivation: with the dw conv left to XLA (ops/convnext_block.py), the
train-step trace shows ~26ms/step of depthwise convolution fusions plus
~12ms/step of layout copies — XLA lays out conv activations batch-minor and
relayouts them at every custom-call boundary. Fusing the whole branch removes
every XLA conv from the stage body.

Measured A/B on v5e (map_convnext_tiny 224, bench.py): this kernel
2006 eval / 556 train img/s vs 3812 / 1198 for the dw-conv-in-XLA block
kernel. The 49-tap VPU loop with dynamic row offsets and unaligned column
slices relayouts the slab per tap and blocks pipeline overlap; XLA's native
depthwise conv is already near VPU peak. Kept as a correct, tested reference
point (tests/test_convnext_branch.py) for future kernel work — wire via
convnext_branch_apply to re-evaluate.

Geometry: grid over groups of G images; each step loads a zero-padded
(G, H+6, W+6, C) slab, computes the 49-tap depthwise conv in fp32, LayerNorm
over C, then the MLP as (H*W*G, C) MXU matmuls. The backward recomputes the
forward (nothing saved to HBM), pulls back through the MLP/LN (see
ops/convnext_block.py), then through the conv: dx = correlation of the
h-gradient with the flipped taps, and the tap gradient is a 49-way
slab-product reduction, accumulated across grid steps in the revolving output
block.

Reference semantics: /root/reference/MAP/models/map_convnext.py:14-40,
/root/reference/GA/ga_convnext.py:70-112 (residual add + drop-path stay in
the caller).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagenet_models_tpu.ops.convnext_block import _erf_poly, _gelu_grad, plain_convnext_block


def _dw_taps_ref(x_ref, i, dww_ref, dwb, hh, ww, c):
    """49-tap depthwise conv reading a padded (H+6, W+6, C) slab from the
    block ref. Row offsets are dynamic (fori_loop over dy — outer dim, no
    alignment constraint); column offsets are static 7-way unrolls (Mosaic
    requires provably-aligned dynamic offsets on the sublane dim, and full
    49-way unrolling blows up the compiler at stage-1 shapes). dww_ref is
    packed (7, 8, C): [dy, dx] taps with dim-1 padded to a full sublane."""
    acc0 = jnp.zeros((hh, ww, c), jnp.float32) + dwb.astype(jnp.float32)

    def body(dy, acc):
        w_row = dww_ref[pl.ds(dy, 1)].astype(jnp.float32)  # (1, 8, c)
        for dx in range(7):
            tap = x_ref[i, pl.ds(dy, hh), dx:dx + ww, :].astype(jnp.float32)
            acc = acc + tap * w_row[0, dx].reshape(1, 1, c)
        return acc

    return jax.lax.fori_loop(0, 7, body, acc0)


def _ln_fwd(h, ln_s, ln_b, eps):
    mu = h.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (h - mu) * rstd
    return xhat * ln_s + ln_b, xhat, rstd


def _fwd_kernel(x_ref, dww_ref, dwb_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, gamma_ref, out_ref, *, eps: float, g: int,
                hh: int, ww: int):
    c = out_ref.shape[-1]
    lns = lns_ref[:].astype(jnp.float32)
    lnb = lnb_ref[:].astype(jnp.float32)
    toks = []
    for i in range(g):
        h = _dw_taps_ref(x_ref, i, dww_ref, dwb_ref[:], hh, ww, c)
        ln, _, _ = _ln_fwd(h.reshape(hh * ww, c), lns, lnb, eps)
        toks.append(ln)
    tokens = jnp.concatenate(toks, axis=0).astype(out_ref.dtype)  # (g*hh*ww, c)
    pre1 = jnp.dot(tokens, w1_ref[:], preferred_element_type=jnp.float32)
    pre1 = pre1 + b1_ref[:].astype(jnp.float32)
    hmid = (0.5 * pre1 * (1.0 + _erf_poly(pre1 * (2 ** -0.5)))).astype(out_ref.dtype)
    out = jnp.dot(hmid, w2_ref[:], preferred_element_type=jnp.float32)
    out = out + b2_ref[:].astype(jnp.float32)
    out = out * gamma_ref[:].astype(jnp.float32)
    out_ref[:] = out.reshape(g, hh, ww, c).astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dww_ref, dwb_ref, lns_ref, lnb_ref, w1_ref,
                b1_ref, w2_ref, b2_ref, gamma_ref,
                dx_ref, ddww_ref, ddwb_ref, dlns_ref, dlnb_ref, dw1_ref,
                db1_ref, dw2_ref, db2_ref, dgamma_ref, dhp_ref, *, eps: float,
                g: int, hh: int, ww: int):
    step = pl.program_id(0)
    c = dx_ref.shape[-1]
    cdt = g_ref.dtype
    lns = lns_ref[:].astype(jnp.float32)
    lnb = lnb_ref[:].astype(jnp.float32)

    # ---- recompute forward ----
    toks, xhats, rstds = [], [], []
    for i in range(g):
        h = _dw_taps_ref(x_ref, i, dww_ref, dwb_ref[:], hh, ww, c)
        ln, xhat, rstd = _ln_fwd(h.reshape(hh * ww, c), lns, lnb, eps)
        toks.append(ln)
        xhats.append(xhat)
        rstds.append(rstd)
    tokens = jnp.concatenate(toks, axis=0).astype(cdt)
    xhat = jnp.concatenate(xhats, axis=0)
    rstd = jnp.concatenate(rstds, axis=0)
    pre1 = jnp.dot(tokens, w1_ref[:], preferred_element_type=jnp.float32)
    pre1 = pre1 + b1_ref[:].astype(jnp.float32)
    hmid = (0.5 * pre1 * (1.0 + _erf_poly(pre1 * (2 ** -0.5))))
    hmid_c = hmid.astype(cdt)
    pre2 = jnp.dot(hmid_c, w2_ref[:], preferred_element_type=jnp.float32)
    pre2 = pre2 + b2_ref[:].astype(jnp.float32)

    gg = g_ref[:].astype(jnp.float32).reshape(g * hh * ww, c)
    gam = gamma_ref[:].astype(jnp.float32)

    # ---- MLP/scale backward ----
    dgamma_p = jnp.sum(gg * pre2, axis=0, keepdims=True)
    dpre2 = gg * gam
    db2_p = jnp.sum(dpre2, axis=0, keepdims=True)
    dw2_p = jnp.dot(hmid_c.T, dpre2.astype(cdt), preferred_element_type=jnp.float32)
    dhmid = jnp.dot(dpre2.astype(cdt), w2_ref[:].T, preferred_element_type=jnp.float32)
    dpre1 = dhmid * _gelu_grad(pre1)
    db1_p = jnp.sum(dpre1, axis=0, keepdims=True)
    dw1_p = jnp.dot(tokens.T, dpre1.astype(cdt), preferred_element_type=jnp.float32)
    dln = jnp.dot(dpre1.astype(cdt), w1_ref[:].T, preferred_element_type=jnp.float32)

    # ---- LN backward ----
    dlns_p = jnp.sum(dln * xhat, axis=0, keepdims=True)
    dlnb_p = jnp.sum(dln, axis=0, keepdims=True)
    dxhat = dln * lns
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dh = (rstd * (dxhat - m1 - xhat * m2)).reshape(g, hh, ww, c)

    # zero-init the accumulated outputs before any accumulation below
    @pl.when(step == 0)
    def _():
        ddww_ref[:] = jnp.zeros_like(ddww_ref)
        ddwb_ref[:] = jnp.zeros_like(ddwb_ref)
        dlns_ref[:] = jnp.zeros_like(dlns_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)

    ddwb_ref[:] += jnp.sum(dh, axis=(0, 1, 2)).reshape(1, c)
    dlns_ref[:] += dlns_p
    dlnb_ref[:] += dlnb_p
    dw1_ref[:] += dw1_p
    db1_ref[:] += db1_p
    dw2_ref[:] += dw2_p
    db2_ref[:] += db2_p
    dgamma_ref[:] += dgamma_p

    # ---- conv backward: dx = corr(dh_padded, flipped taps); tap grads ----
    # fori_loop over rows (dynamic outer-dim offsets) with static 7-way
    # column unrolls — see _dw_taps_ref; dh is staged zero-padded into VMEM
    # scratch so the flipped-tap reads are pure slices
    for i in range(g):
        dhp_ref[:] = jnp.zeros_like(dhp_ref)
        dhp_ref[3:3 + hh, 3:3 + ww, :] = dh[i]
        dh_i = dh[i]

        def body(dy, dx):
            w_row = dww_ref[pl.ds(dy, 1)].astype(jnp.float32)  # (1, 8, c)
            tapg = []
            for dx_ in range(7):
                shifted = dhp_ref[pl.ds(6 - dy, hh), 6 - dx_:6 - dx_ + ww, :]
                dx = dx + shifted * w_row[0, dx_].reshape(1, 1, c)
                tap = x_ref[i, pl.ds(dy, hh), dx_:dx_ + ww, :].astype(jnp.float32)
                tapg.append(jnp.sum(tap * dh_i, axis=(0, 1)).reshape(1, 1, c))
            tapg.append(jnp.zeros((1, 1, c), jnp.float32))
            ddww_ref[pl.ds(dy, 1)] += jnp.concatenate(tapg, axis=1)
            return dx

        dx = jax.lax.fori_loop(0, 7, body,
                               jnp.zeros((hh, ww, c), jnp.float32))
        dx_ref[i] = dx.astype(dx_ref.dtype)


def _group(b: int, hh: int, ww: int, c: int, hidden: int, bwd: bool) -> int:
    """Images per grid step, sized against scoped VMEM."""
    budget = (80 if not bwd else 72) << 20
    fixed = 2 * (2 * c * hidden * 2)
    if bwd:
        fixed += 2 * (2 * c * hidden * 4)
    slab = (hh + 6) * (ww + 6) * c
    per_img = slab * (2 * 2 + 4) + hh * ww * c * (4 * 6 + 2 * 4) \
        + hh * ww * hidden * (4 * (3 if bwd else 1) + 2 * 2)
    g = max(1, min(b, (budget - fixed) // max(per_img, 1)))
    while b % g:
        g -= 1
    return g


def _pad_slab(x):
    return jnp.pad(x, [(0, 0), (3, 3), (3, 3), (0, 0)])


def _branch_fwd_pallas(x, dww, dwb, ln_s, ln_b, w1, b1, w2, b2, gamma,
                       eps: float = 1e-6, interpret: bool = False):
    b, hh, ww, c = x.shape
    hidden = w1.shape[-1]
    g = _group(b, hh, ww, c, hidden, bwd=False)
    xp = _pad_slab(x)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    dww2 = jnp.pad(dww.reshape(7, 7, c), [(0, 0), (0, 1), (0, 0)])  # (7, 8, C) tap grid
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, g=g, hh=hh, ww=ww),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, hh + 6, ww + 6, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((7, 8, c)), full((c,)), full((c,)), full((c,)),
            full((c, hidden)), full((hidden,)), full((hidden, c)), full((c,)),
            full((c,)),
        ],
        out_specs=pl.BlockSpec((g, hh, ww, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(xp, dww2, dwb, ln_s, ln_b, w1.astype(x.dtype), b1, w2.astype(x.dtype),
      b2, gamma)
    return out


def _branch_bwd_pallas(x, dww, dwb, ln_s, ln_b, w1, b1, w2, b2, gamma, gout,
                       eps: float = 1e-6, interpret: bool = False):
    b, hh, ww, c = x.shape
    hidden = w1.shape[-1]
    g = _group(b, hh, ww, c, hidden, bwd=True)
    xp = _pad_slab(x)
    dww2 = jnp.pad(dww.reshape(7, 7, c), [(0, 0), (0, 1), (0, 0)])  # (7, 8, C) tap grid
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, g=g, hh=hh, ww=ww),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, hh + 6, ww + 6, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, hh, ww, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((7, 8, c)), full((c,)), full((c,)), full((c,)),
            full((c, hidden)), full((hidden,)), full((hidden, c)), full((c,)),
            full((c,)),
        ],
        out_specs=[
            pl.BlockSpec((g, hh, ww, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((7, 8, c)), full((1, c)), full((1, c)), full((1, c)),
            full((c, hidden)), full((1, hidden)), full((hidden, c)),
            full((1, c)), full((1, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hh, ww, c), x.dtype),
            jax.ShapeDtypeStruct((7, 8, c), f32), jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32), jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, hidden), f32), jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((hidden, c), f32), jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ],
        scratch_shapes=[pltpu.VMEM((hh + 6, ww + 6, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(xp, gout, dww2, dwb, ln_s, ln_b, w1.astype(x.dtype), b1,
      w2.astype(x.dtype), b2, gamma)
    dx, ddww, ddwb, dlns, dlnb, dw1, db1, dw2, db2, dgamma = outs
    shape_of = lambda ref, v: v.reshape(ref.shape).astype(ref.dtype)
    return (dx,
            shape_of(dww, ddww[:, :7, :].reshape(49, c)),
            shape_of(dwb, ddwb), shape_of(ln_s, dlns), shape_of(ln_b, dlnb),
            shape_of(w1, dw1), shape_of(b1, db1), shape_of(w2, dw2),
            shape_of(b2, db2), shape_of(gamma, dgamma))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_convnext_branch(x, dww, dwb, ln_s, ln_b, w1, b1, w2, b2, gamma,
                          eps: float = 1e-6):
    """The full pre-residual ConvNeXt branch, fused fwd + fused bwd."""
    return _branch_fwd_pallas(x, dww, dwb, ln_s, ln_b, w1, b1, w2, b2, gamma, eps)


def _branch_fwd(x, dww, dwb, ln_s, ln_b, w1, b1, w2, b2, gamma, eps):
    out = _branch_fwd_pallas(x, dww, dwb, ln_s, ln_b, w1, b1, w2, b2, gamma, eps)
    return out, (x, dww, dwb, ln_s, ln_b, w1, b1, w2, b2, gamma)


def _branch_bwd(eps, res, gout):
    return _branch_bwd_pallas(*res, gout, eps=eps)


fused_convnext_branch.defvjp(_branch_fwd, _branch_bwd)


def convnext_branch_apply(x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2,
                          gamma: Optional[jnp.ndarray], eps: float = 1e-6,
                          use_pallas: Optional[bool] = None):
    """Dispatch wrapper: fully-fused branch on TPU, plain ops elsewhere.

    dw_w: (7, 7, 1, C) depthwise taps (torch-parity layout)."""
    c = x.shape[-1]
    if gamma is None:
        gamma = jnp.ones((c,), jnp.float32)
    dww = dw_w.reshape(49, c)
    if use_pallas is False:
        return plain_convnext_block(x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2,
                                    gamma, eps)
    if use_pallas is True:
        return fused_convnext_branch(x, dww, dw_b, ln_s, ln_b, w1, b1, w2, b2,
                                     gamma, eps)

    def _cpu(x, dww, dwb, ln_s, ln_b, w1, b1, w2, b2, gamma):
        return plain_convnext_block(x, dww.reshape(7, 7, 1, c), dwb, ln_s,
                                    ln_b, w1, b1, w2, b2, gamma, eps)

    return jax.lax.platform_dependent(
        x, dww, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma,
        cpu=_cpu,
        default=functools.partial(fused_convnext_branch, eps=eps),
    )
