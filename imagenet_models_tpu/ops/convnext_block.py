"""Fused ConvNeXt-block compute for TPU.

Measured split (trace on v5e): XLA's depthwise-7x7 conv is fast (<1% of step
time) but the LayerNorm + pointwise-MLP chain is memory-bound and dominates.
So the fusion boundary is: dw conv stays in XLA; a Pallas kernel fuses
LayerNorm -> Dense(4C) -> exact-GELU -> Dense(C) -> layer-scale over tiles of
tokens, keeping the (tokens, 4C) hidden activation in VMEM instead of HBM.

Gradients: custom VJP rematerializes the plain-ops composition (XLA autodiff)
— same math, no residual tensors saved.

Reference block semantics: /root/reference/MAP/models/map_convnext.py:14-40
(and ga_convnext.py:70-112). The residual add + drop-path happen in the
caller.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagenet_models_tpu.nn.layers import gelu


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| < 1.5e-7) — Mosaic has
    no erf/erfc primitive."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _horner(t, coefs):
    r = jnp.float32(coefs[-1])
    for c in coefs[-2::-1]:
        r = r * t + jnp.float32(c)
    return r


# Exp/divide-free erf: 2-segment minimax polynomial (odd z*P(z^2) near 0,
# centered direct fit on the tail, clamp beyond 3.7 where erf = 1 - 1.7e-7).
# Composite fp32 max error 1.4e-6 over the whole real line — below the bf16
# cast applied to every GELU output and the kernel parity tolerances (2e-5).
# Hypothesis was that exp/divide are multi-pass VPU transcendentals while
# this is pure FMAs. MEASURED SLOWER on the full train step (v5e, B=128,
# 2026-08-18): poly 1093 img/s train / 3587 eval vs exact 1209 / 3700 — the
# 2-3 segment selects + 7-10-term Horner chains cost more VPU cycles than
# Mosaic's exp. Kept as an opt-in probe (IMTPU_GELU=poly); default "exact".
_ERF_P1 = (1.1283791512572074, -0.3761253105026157, 0.11282597657971125,
           -0.02681657417136783, 0.005125165193585216,
           -0.0007516784278039509, 6.4051461635546e-05)  # in z^2, z<=1.25
_ERF_P2 = (0.9995352871436075, 0.002468079162414658, -0.006114579781157951,
           0.009232915153350015, -0.009353278783536754, 0.006616314794094046,
           -0.0030314574419528094, 0.0003727606298336841,
           0.00047253587831603335, -0.00019980823867811354)  # in z-2.475


def _erf_poly_noexp(z):
    a = jnp.minimum(jnp.abs(z), 3.7)
    t = a * a
    r1 = a * _horner(t, _ERF_P1)
    r2 = _horner(a - 2.475, _ERF_P2)
    r = jnp.minimum(jnp.where(a <= 1.25, r1, r2), 1.0)
    return jnp.sign(z) * r


# d/dx GELU minus 0.5 is odd: 3-segment fit, fp32 max error 1.2e-6.
_GG_Q1 = (0.7978845599877954, -0.2659614605754057, 0.05984067639752572,
          -0.009495873268150058, 0.001148933921839538,
          -0.00010782679500034086, 6.460223976377059e-06)  # in x^2, x<=1.25
_GG_Q2 = (0.5718637646166909, -0.10495713513197283, 0.022858549135169298,
          0.05024747710010098, -0.04169145564639595, 0.007331018318111614,
          0.005343320881894571, -0.0024025254872636704,
          -5.946164454156466e-05)  # in x-2.125, 1.25<x<=3.0
_GG_Q3 = (0.5001737949671426, -0.0007001981890235917, 0.0013097856812924228,
          -0.0014831526777259597, 0.0011486024229091613,
          -0.0006438145972161522, 0.00019760163200512377,
          2.9664524830316e-05, -3.066304331977153e-05)  # in x-4.275, x<=5.55


def _gelu_grad_noexp(x):
    a = jnp.minimum(jnp.abs(x), 5.55)
    t = a * a
    r1 = a * _horner(t, _GG_Q1)
    r2 = _horner(a - 2.125, _GG_Q2)
    r3 = _horner(a - 4.275, _GG_Q3)
    r = jnp.where(a <= 1.25, r1, jnp.where(a <= 3.0, r2, r3))
    return 0.5 + jnp.sign(x) * r


# "fast": SINGLE-segment odd minimax fits, no exp/divide/selects — the
# cheap-GELU shape the 2-segment "poly" probe above missed (selects evaluate
# BOTH branches on the VPU, so poly paid ~2x its nominal op count). The
# IMTPU_GELU=relu timing probe bounds the whole GELU cost at ~12% of the
# train step (1366 vs 1215 img/s, 2026-08-19); this recovers most of it:
#   erf(z) ~ z*P8((z/2.75)^2) on |z|<=2.75, clamp beyond (erf there is 1
#   within 1.01e-4): max err 3.1e-5 fit + 1.0e-4 clamp tail;
#   gelu'(x)-0.5 ~ x*Q10((x/5)^2) on |x|<=5, clamp: max err 1.9e-4.
# Both errors sit ~20x below bf16 output quantization (eps/2 = 3.9e-3
# relative), so training numerics are unchanged at the production dtype;
# fwd/bwd stay mutually consistent (both use the same fast impl).
_ERF_F8 = (1.128179019700242, -2.833873458377666, 6.288517611119356,
           -10.440794928636649, 12.424005344159935, -9.860067339137903,
           4.602827094685715, -0.9452048310751889)  # in (z/2.75)^2
_GG_F10 = (0.7970334043621504, -6.5780944269226085, 35.6419098348847,
           -127.98971343596055, 315.66741178811344, -535.3888724157551,
           610.367501707186, -444.740199037125, 186.4500761464462,
           -34.12709029923767)  # in (x/5)^2


def _erf_fast(z):
    a = jnp.minimum(jnp.abs(z), 2.75)
    u = jnp.square(a * (1.0 / 2.75))
    return jnp.sign(z) * (a * _horner(u, _ERF_F8))


def _gelu_grad_fast(x):
    a = jnp.minimum(jnp.abs(x), 5.0)
    u = jnp.square(a * (1.0 / 5.0))
    return 0.5 + jnp.sign(x) * (a * _horner(u, _GG_F10))


# In-kernel GELU implementation, selected per call site (static under jit):
# "exact" = A&S erf (1 exp + 1 divide per element) — the EVAL default, so the
#   checkpoint-interchange/golden-top-1 contract keeps reference numerics;
# "fast" = single-segment minimax above (no transcendentals, ~1e-4 accurate,
#   ~20x below bf16 resolution) — the TRAINING default (A/B 2026-08-19, v5e
#   B=128 full train step: fast 1266 vs exact 1215 img/s; the relu timing
#   probe bounds any GELU work at 1366);
# "poly" = 2-segment minimax (measured slower than exact, kept on record);
# "relu" = timing probe ONLY (wrong numerics — never in production paths).
# The IMTPU_GELU env var, when set, forces one impl for BOTH modes.
_GELU_ENV = os.environ.get("IMTPU_GELU", "")


def resolve_gelu_impl(training: bool) -> str:
    return _GELU_ENV or ("fast" if training else "exact")


def _kernel_gelu(pre, impl: str):
    if impl == "relu":
        return jnp.maximum(pre, 0.0)
    if impl == "exact":
        return 0.5 * pre * (1.0 + _erf_poly(pre * (2 ** -0.5)))
    if impl == "fast":
        return 0.5 * pre * (1.0 + _erf_fast(pre * (2 ** -0.5)))
    return 0.5 * pre * (1.0 + _erf_poly_noexp(pre * (2 ** -0.5)))


def _kernel_gelu_grad(pre, impl: str):
    if impl == "relu":
        return (pre > 0.0).astype(jnp.float32)
    if impl == "exact":
        return _gelu_grad(pre)
    if impl == "fast":
        return _gelu_grad_fast(pre)
    return _gelu_grad_noexp(pre)


# Experiment knob: express the depthwise 7x7 as 49 shifted multiply-adds in
# plain row-major NHWC ops instead of lax.conv. Rationale: the step profile
# charges ~9ms/step to layout copies between XLA's batch-minor conv layouts
# and the row-major Pallas LN+MLP operands; with no conv op in the graph XLA
# has no reason to leave row-major, so those copies should vanish — IF the
# stencil fuses well enough that the 49 halo reads stay in VMEM.
# MEASURED SLOWER (2026-08-18, v5e B=128 full train step via
# scripts/bench_train.py): 688 vs 1215 img/s. Autodiff of the stencil turns
# the weight-grad into 49 full-tensor reductions and the dx into 49 shifted
# adds that XLA does not re-fuse into one halo-reusing loop — the saved
# layout copies are dwarfed. Fourth dw-conv formulation measured and lost
# to XLA's conv lowering (see ops/dw_conv.py for the other three).
_DW_SHIFTADD = os.environ.get("IMTPU_DW_SHIFTADD", "0") != "0"


def _dw_conv7_shiftadd(x, dw_w, dw_b):
    """dw7x7 as an unrolled 49-tap stencil (pad + shifted slices), fp32 acc."""
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    wk = dw_w.astype(x.dtype)  # (7, 7, 1, C) HWIO, groups=C
    acc = jnp.zeros(x.shape, jnp.float32)
    for ky in range(7):
        for kx in range(7):
            acc += (xp[:, ky:ky + h, kx:kx + w, :] * wk[ky, kx, 0]).astype(jnp.float32)
    return acc.astype(x.dtype) + dw_b.astype(x.dtype)


# Experiment knob #2 (hybrid): the full-stencil loss above was driven by the
# AUTODIFF backward (49 full-tensor wgrad reductions + 49 unfused dx adds),
# not necessarily the forward. This probe keeps the stencil ONLY for the
# forward (so the forward graph has no conv op and XLA keeps the row-major
# layout the Pallas LN+MLP kernels want) and routes dx/wgrad through XLA's
# conv lowering via a custom VJP. MEASURED SLOWER (2026-08-19, v5e B=128
# full train step via scripts/bench_train.py): 1028 vs 1215 img/s — the
# forward stencil alone costs more than the ~9ms of layout copies it saves
# (XLA re-reads the padded buffer per tap; no halo reuse), isolating the
# earlier 688 split as ~190 img/s forward + ~340 backward. Fifth and final
# dw-conv formulation measured against XLA's conv lowering; all five lost.
_DW_HYBRID = os.environ.get("IMTPU_DW_HYBRID", "0") != "0"


@jax.custom_vjp
def _dw_conv7_hybrid(x, dw_w, dw_b):
    return _dw_conv7_shiftadd(x, dw_w, dw_b)


def _dw_hybrid_fwd(x, dw_w, dw_b):
    return _dw_conv7_shiftadd(x, dw_w, dw_b), (x, dw_w, dw_b)


def _dw_hybrid_bwd(res, g):
    x, dw_w, dw_b = res
    # dx: depthwise correlation with the flipped kernel (XLA conv lowering)
    dx = jax.lax.conv_general_dilated(
        g, jnp.flip(dw_w, (0, 1)).astype(g.dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g.shape[-1]).astype(x.dtype)
    # wgrad: per-channel correlation of x with g — XLA's standard depthwise
    # weight-grad (batch as the contraction dim, C as feature groups)
    dw = jax.lax.conv_general_dilated(
        jnp.transpose(x, (3, 1, 2, 0)), jnp.transpose(g, (1, 2, 0, 3)),
        (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        batch_group_count=x.shape[-1],
        preferred_element_type=jnp.float32)
    dw = jnp.transpose(dw, (1, 2, 0, 3)).astype(dw_w.dtype)  # -> (7,7,1,C)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(dw_b.dtype)
    return dx, dw, db


_dw_conv7_hybrid.defvjp(_dw_hybrid_fwd, _dw_hybrid_bwd)


def dw_conv7(x, dw_w, dw_b):
    """Depthwise 7x7 (XLA lowering, fast on TPU)."""
    if _DW_HYBRID:
        return _dw_conv7_hybrid(x, dw_w, dw_b)
    if _DW_SHIFTADD:
        return _dw_conv7_shiftadd(x, dw_w, dw_b)
    return jax.lax.conv_general_dilated(
        x, dw_w.astype(x.dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1]) + dw_b.astype(x.dtype)


def plain_ln_mlp(h, ln_s, ln_b, w1, b1, w2, b2, gamma, eps: float = 1e-6,
                 gelu_impl: str = "exact"):
    """LN -> MLP -> layer-scale in plain XLA ops (also the VJP path)."""
    hf = h.astype(jnp.float32)
    mu = hf.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(hf - mu), axis=-1, keepdims=True)
    hf = (hf - mu) * jax.lax.rsqrt(var + eps) * ln_s + ln_b
    y = hf.astype(h.dtype)
    y = y @ w1.astype(h.dtype) + b1.astype(h.dtype)
    if gelu_impl == "exact":
        y = gelu(y)
    else:
        y = _kernel_gelu(y.astype(jnp.float32), gelu_impl).astype(y.dtype)
    y = y @ w2.astype(h.dtype) + b2.astype(h.dtype)
    return y * gamma.astype(h.dtype)


# Probe knob (IMTPU_LN_STATS=mxu): compute the in-kernel LN mean/E[x^2] as
# fp32 matvecs against a constant 1/C column instead of cross-lane VPU
# reductions — hypothesis was that at C=96 the reduction underfills the
# 128-lane VPU while the MXU sits idle between the two MLP matmuls.
# MEASURED FLAT (2026-08-19, v5e B=128 full train step): 1265.9 vs 1266.6
# img/s — Mosaic's cross-lane reductions are not a cost at these shapes;
# the stage-0 kernel's gap to roofline is elsewhere (scheduling/pipeline).
_LN_STATS = os.environ.get("IMTPU_LN_STATS", "vpu")


def _ln_stats(h, c: int):
    """(mu, var) over the trailing dim of fp32 (T, C) h."""
    if _LN_STATS == "mxu":
        ones = jnp.full((c, 8), 1.0 / c, jnp.float32)
        mu = jax.lax.dot_general(h, ones, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)[:, :1]
        m2 = jax.lax.dot_general(h * h, ones, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)[:, :1]
        return mu, jnp.maximum(m2 - mu * mu, 0.0)
    mu = h.mean(axis=-1, keepdims=True)
    return mu, jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)


def _kernel(h_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            gamma_ref, out_ref, *, eps: float, gelu_impl: str = "exact"):
    h = h_ref[:].astype(jnp.float32)  # (T, C)
    mu, var = _ln_stats(h, h_ref.shape[-1])
    ln = (h - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)

    tokens = ln.astype(out_ref.dtype)
    hmid = jnp.dot(tokens, w1_ref[:], preferred_element_type=jnp.float32)
    hmid = hmid + b1_ref[:].astype(jnp.float32)
    hmid = _kernel_gelu(hmid, gelu_impl).astype(out_ref.dtype)
    out = jnp.dot(hmid, w2_ref[:], preferred_element_type=jnp.float32)
    out = out + b2_ref[:].astype(jnp.float32)
    out_ref[:] = (out * gamma_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _fit_tile(t: int, n: int) -> int:
    """Clamp a token tile to n on the 8-sublane grid; if it does not divide n,
    fall back to the largest multiple of 8 that does (whole n as last resort)."""
    t = min(t, n)
    if t % 8 and t > 8:
        t -= t % 8
    if n % t:
        largest = 8
        for d in range(t, 7, -8):
            if n % d == 0:
                largest = d
                break
        t = largest if n % largest == 0 else n
    return t


def _fwd_tile(n: int, c: int, hidden: int, itemsize: int = 2) -> int:
    """Forward token tile sized against scoped VMEM: bigger tiles amortize
    per-grid-step overhead for small C (stage 1 is 4x the tokens of stage 3
    at 1/16th the per-token VMEM). itemsize = activation dtype bytes (2 for
    the bf16 production path; 4 when the fp32 trajectory/parity tests drive
    the kernel)."""
    budget = 72 << 20
    fixed = 2 * (2 * c * hidden * itemsize)  # w1/w2 in h.dtype, double-buffered
    per_tok = hidden * (4 + itemsize) + c * (4 * 3 + itemsize * 4)
    cap = (budget - fixed) // max(per_tok, 1)
    # an explicit env value is honored (down to the 8-sublane floor)
    t = max(8, min(int(os.environ.get("IMTPU_LNMLP_TILE", "8192")), max(256, cap)))
    return _fit_tile(t, n)


def _fused_ln_mlp_pallas(h, ln_s, ln_b, w1, b1, w2, b2, gamma, eps: float = 1e-6,
                         gelu_impl: str = "exact"):
    b, hh, ww, c = h.shape
    n = b * hh * ww
    hidden = w1.shape[-1]
    tile = _fwd_tile(n, c, hidden, jnp.dtype(h.dtype).itemsize)
    tokens = h.reshape(n, c)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, gelu_impl=gelu_impl),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((c,)), full((c,)), full((c, hidden)), full((hidden,)),
            full((hidden, c)), full((c,)), full((c,)),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), h.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 << 20),
    )(tokens, ln_s, ln_b, w1.astype(h.dtype), b1, w2.astype(h.dtype), b2, gamma)
    return out.reshape(b, hh, ww, c)


def _gelu_grad(x):
    """d/dx exact-erf GELU, with the A&S erf polynomial (fp32)."""
    inv_sqrt2 = 2.0 ** -0.5
    inv_sqrt2pi = 0.3989422804014327
    return 0.5 * (1.0 + _erf_poly(x * inv_sqrt2)) + x * inv_sqrt2pi * jnp.exp(-0.5 * x * x)


def _bwd_kernel(h_ref, g_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, gamma_ref, dx_ref, dlns_ref, dlnb_ref, dw1_ref,
                db1_ref, dw2_ref, db2_ref, dgamma_ref, *, eps: float,
                gelu_impl: str = "exact"):
    """One token tile of the LN->MLP->scale backward.

    Recomputes the forward from the tile of `h` (nothing saved to HBM), then
    pulls the cotangent back through scale, MLP and LN. Weight/vector grads
    accumulate across grid steps into a single shared block (grid steps are
    sequential on TPU, so read-modify-write on the revolving output block is
    safe); dx is written per-tile.
    """
    i = pl.program_id(0)
    cdt = h_ref.dtype  # compute dtype of the matmuls (matches forward)

    # ---- recompute forward (fp32 statistics, matmuls fp32-accumulated) ----
    hf = h_ref[:].astype(jnp.float32)  # (T, C)
    mu = hf.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(hf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (hf - mu) * rstd
    ln = xhat * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    tokens = ln.astype(cdt)
    pre1 = jnp.dot(tokens, w1_ref[:], preferred_element_type=jnp.float32)
    pre1 = pre1 + b1_ref[:].astype(jnp.float32)
    hmid = _kernel_gelu(pre1, gelu_impl)
    hmid_c = hmid.astype(cdt)
    pre2 = jnp.dot(hmid_c, w2_ref[:], preferred_element_type=jnp.float32)
    pre2 = pre2 + b2_ref[:].astype(jnp.float32)

    g = g_ref[:].astype(jnp.float32)  # (T, C)
    gam = gamma_ref[:].astype(jnp.float32)

    # out = pre2 * gamma
    dgamma_p = jnp.sum(g * pre2, axis=0, keepdims=True)
    # contracted-dim dot_generals: never materialize a transposed operand
    # (an in-kernel .T of a (T, 4C) matrix costs a full VMEM relayout)
    dpre2 = g * gam  # (T, C) fp32
    db2_p = jnp.sum(dpre2, axis=0, keepdims=True)
    dpre2_c = dpre2.astype(cdt)
    dw2_p = jax.lax.dot_general(  # (4C, T) x (T, C) -> contract T
        hmid_c, dpre2_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dhmid = jax.lax.dot_general(  # (T, C) x (4C, C) -> contract C
        dpre2_c, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dpre1 = dhmid * _kernel_gelu_grad(pre1, gelu_impl)
    db1_p = jnp.sum(dpre1, axis=0, keepdims=True)
    dpre1_c = dpre1.astype(cdt)
    dw1_p = jax.lax.dot_general(
        tokens, dpre1_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dln = jax.lax.dot_general(
        dpre1_c, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dlns_p = jnp.sum(dln * xhat, axis=0, keepdims=True)
    dlnb_p = jnp.sum(dln, axis=0, keepdims=True)
    dxhat = dln * lns_ref[:].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dlns_ref[:] = jnp.zeros_like(dlns_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)

    dlns_ref[:] += dlns_p
    dlnb_ref[:] += dlnb_p
    dw1_ref[:] += dw1_p
    db1_ref[:] += db1_p
    dw2_ref[:] += dw2_p
    db2_ref[:] += db2_p
    dgamma_ref[:] += dgamma_p


def _bwd_tile(n: int, c: int, hidden: int, itemsize: int = 2) -> int:
    """Token tile for the backward kernel, sized against scoped VMEM.

    Fixed residents (double-buffered by the pipeline): w1/w2 in h.dtype and
    dw1/dw2 in fp32. Per-token: three fp32 (T, hidden) intermediates
    (pre1, gelu'd, dhmid) + h.dtype copies, several fp32 (T, C) temporaries
    and the double-buffered h/g/dx tiles. Estimated against the 100MB scoped
    limit with ~12% headroom (v5e VMEM is 128MB/core). itemsize must follow
    the activation dtype — the fp32 trajectory tests blew the limit by 14.6M
    when this assumed bf16 (round 4)."""
    budget = 88 << 20
    fixed = 2 * (2 * c * hidden * itemsize) + 2 * (2 * c * hidden * 4)
    per_tok = hidden * (4 * 3 + itemsize * 2) + c * (4 * 8 + itemsize * 6)
    cap = (budget - fixed) // max(per_tok, 1)
    t = max(64, min(int(os.environ.get("IMTPU_LNMLP_BWD_TILE", "1024")), cap))
    return _fit_tile(t, n)


def _fused_ln_mlp_bwd_pallas(h, ln_s, ln_b, w1, b1, w2, b2, gamma, g,
                             eps: float = 1e-6, gelu_impl: str = "exact"):
    b, hh, ww, cc = h.shape
    n = b * hh * ww
    hidden = w1.shape[-1]
    tile = _bwd_tile(n, cc, hidden, jnp.dtype(h.dtype).itemsize)
    tokens = h.reshape(n, cc)
    gflat = g.reshape(n, cc)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    accum = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, gelu_impl=gelu_impl),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, cc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((cc,)), full((cc,)), full((cc, hidden)), full((hidden,)),
            full((hidden, cc)), full((cc,)), full((cc,)),
        ],
        out_specs=[
            pl.BlockSpec((tile, cc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            accum((1, cc)), accum((1, cc)), accum((cc, hidden)), accum((1, hidden)),
            accum((hidden, cc)), accum((1, cc)), accum((1, cc)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, cc), h.dtype),
            jax.ShapeDtypeStruct((1, cc), f32), jax.ShapeDtypeStruct((1, cc), f32),
            jax.ShapeDtypeStruct((cc, hidden), f32), jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((hidden, cc), f32), jax.ShapeDtypeStruct((1, cc), f32),
            jax.ShapeDtypeStruct((1, cc), f32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(tokens, gflat, ln_s, ln_b, w1.astype(h.dtype), b1, w2.astype(h.dtype), b2, gamma)
    dx, dlns, dlnb, dw1, db1, dw2, db2, dgamma = outs
    shape_of = lambda ref, v: v.reshape(ref.shape).astype(ref.dtype)
    return (dx.reshape(h.shape),
            shape_of(ln_s, dlns), shape_of(ln_b, dlnb),
            shape_of(w1, dw1), shape_of(b1, db1),
            shape_of(w2, dw2), shape_of(b2, db2),
            shape_of(gamma, dgamma))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_ln_mlp(h, ln_s, ln_b, w1, b1, w2, b2, gamma, eps: float = 1e-6,
                 gelu_impl: str = "exact"):
    return _fused_ln_mlp_pallas(h, ln_s, ln_b, w1, b1, w2, b2, gamma, eps,
                                gelu_impl)


def _fwd(h, ln_s, ln_b, w1, b1, w2, b2, gamma, eps, gelu_impl):
    out = _fused_ln_mlp_pallas(h, ln_s, ln_b, w1, b1, w2, b2, gamma, eps,
                               gelu_impl)
    return out, (h, ln_s, ln_b, w1, b1, w2, b2, gamma)


# fused Pallas backward (keeps the (T, 4C) activations in VMEM); plain-ops
# VJP fallback with IMTPU_FUSED_BWD=0
_FUSED_BWD = os.environ.get("IMTPU_FUSED_BWD", "1") != "0"


def _bwd(eps, gelu_impl, residuals, g):
    if _FUSED_BWD:
        return _fused_ln_mlp_bwd_pallas(*residuals, g, eps=eps,
                                        gelu_impl=gelu_impl)
    _, vjp = jax.vjp(lambda *a: plain_ln_mlp(*a, eps=eps, gelu_impl=gelu_impl),
                     *residuals)
    return vjp(g)


fused_ln_mlp.defvjp(_fwd, _bwd)


def plain_convnext_block(x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma,
                         eps: float = 1e-6, gelu_impl: str = "exact"):
    """Full pre-residual branch in plain ops (parity/reference path)."""
    h = dw_conv7(x, dw_w, dw_b)
    return plain_ln_mlp(h, ln_s, ln_b, w1, b1, w2, b2, gamma, eps=eps,
                        gelu_impl=gelu_impl)


def fused_convnext_block(x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma,
                         eps: float = 1e-6, gelu_impl: str = "exact"):
    # dw conv (fwd AND both grads) stays in XLA: a Pallas weight-grad kernel
    # (ops/dw_conv.py, opt-in IMTPU_DW_WGRAD=1) measured SLOWER at every
    # stage shape — see its docstring for the A/B
    if os.environ.get("IMTPU_DW_WGRAD", "0") == "1":
        from imagenet_models_tpu.ops.dw_conv import dw_conv7_opt

        h = dw_conv7_opt(x, dw_w, dw_b)
    else:
        h = dw_conv7(x, dw_w, dw_b)
    if os.environ.get("IMTPU_LNMLP_HWBC", "1") == "1":
        # Layout-matched operands — THE DEFAULT (the round-2 VERDICT's one
        # unexplored flagship lever): XLA lays conv activations out
        # batch-minor ({3,0,2,1}: physical order H,W,B,C) and the step
        # profile charged ~9ms/step to the copies converting them to the
        # kernel's row-major (B,H,W,C) tokens. The LN+MLP is per-token
        # order-invariant, so the kernel consumes tokens in (h,w,b) order:
        # transpose(1,2,0,3) of a {3,0,2,1}-laid-out tensor is physically a
        # bitcast, and XLA's layout assignment elides the copies. A/B on
        # the full map_convnext_tiny train step (v5e B=128, 2026-08-20):
        # 1370.8 vs 1282.7 img/s (+6.9%) — past the long-standing ~1266
        # plateau, after five dw-conv formulations failed to reclaim these
        # copies from the conv side. IMTPU_LNMLP_HWBC=0 restores row-major.
        ht = jnp.transpose(h, (1, 2, 0, 3))
        out = fused_ln_mlp(ht, ln_s, ln_b, w1, b1, w2, b2, gamma, eps,
                           gelu_impl)
        return jnp.transpose(out, (2, 0, 1, 3))
    return fused_ln_mlp(h, ln_s, ln_b, w1, b1, w2, b2, gamma, eps, gelu_impl)


# memory knob, NOT a speed knob: A/B on v5e measured 858 vs 1060 img/s with
# remat on (the step is compute-bound; XLA already overlaps the HBM traffic)
_REMAT = os.environ.get("IMTPU_BLOCK_REMAT", "0") != "0"
# Per-stage experiment knob: route blocks with C < IMTPU_PALLAS_MIN_C to the
# plain-XLA path even on TPU. Rationale: the step profile shows the kernel's
# MXU utilization is capped by the small-channel stages (stage-0 C=96 on a
# 56x56 grid is memory-bound) while ~9ms/step goes to layout copies between
# XLA's conv layouts and the kernel's row-major operands — XLA may fuse the
# small stages better than the kernel runs them. 0 (default) = kernel
# everywhere. MEASURED (2026-08-18, v5e B=128 full train step,
# scripts/bench_train.py): kernel everywhere 1215 img/s, MIN_C=192 (stage-0
# to XLA) 1158, MIN_C=384 (stages 0+1 to XLA) 1184 — the fused kernel beats
# XLA's unfused LN+MLP even at the memory-bound small-channel stages; the
# default stays 0.
_PALLAS_MIN_C = int(os.environ.get("IMTPU_PALLAS_MIN_C", "0"))


def convnext_block_apply(x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2,
                         gamma: Optional[jnp.ndarray], eps: float = 1e-6,
                         use_pallas: Optional[bool] = None,
                         remat: Optional[bool] = None,
                         training: bool = False):
    """Dispatch: Pallas fusion on TPU, plain ops elsewhere. The branch is
    picked per lowering platform (works under jit/shard_map on any device
    placement). Returns the pre-residual branch output.

    `training` selects the GELU implementation (see resolve_gelu_impl):
    eval keeps the exact-erf reference numerics for the checkpoint
    interchange contract; training uses the fast minimax fit (~1e-4, far
    below bf16 resolution) for the measured +4% step throughput."""
    gelu_impl = resolve_gelu_impl(training)
    if gamma is None:
        gamma = jnp.ones((x.shape[-1],), jnp.float32)
    if use_pallas is None and x.shape[-1] < _PALLAS_MIN_C:
        use_pallas = False
    if use_pallas is True:
        return fused_convnext_block(x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2,
                                    gamma, eps, gelu_impl)
    if use_pallas is False:
        fn = plain_convnext_block
        if remat if remat is not None else _REMAT:
            # don't store the 4C hidden activations; recompute in backward
            # (HBM bandwidth, not FLOPs, bounds the train step)
            fn = jax.checkpoint(fn, policy=jax.checkpoint_policies.nothing_saveable,
                                static_argnums=(10, 11))
        return fn(x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma, eps, gelu_impl)
    return jax.lax.platform_dependent(
        x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma,
        cpu=functools.partial(plain_convnext_block, eps=eps, gelu_impl=gelu_impl),
        default=functools.partial(fused_convnext_block, eps=eps, gelu_impl=gelu_impl),
    )


def use_transformer_lnmlp(drop: float, deterministic: bool) -> bool:
    """Gate for routing a transformer block's norm2+Mlp pair through the
    fused LN+MLP Pallas kernel (no dw conv, unit layer-scale). Kept OPT-IN
    (IMTPU_TLNMLP=1): full-step A/Bs (v5e B=128, 2026-08-21) measured
    flat-to-losing on every transformer family — maxvit 546.9 vs 552.5,
    ga_cswin 744.6 vs 745.3-750.3, pit 2070.2 vs 2162; unlike the
    ConvNeXt case there are no conv-layout copies for the kernel to
    reclaim, and XLA's own Dense+GELU+Dense fusion is already tight
    here. Dropout inside the MLP would need in-kernel RNG -> module
    path."""
    if os.environ.get("IMTPU_TLNMLP", "0") != "1":
        return False
    return drop == 0.0 or deterministic


def ln_mlp_apply(x, ln_s, ln_b, w1, b1, w2, b2, eps: float,
                 training: bool = False):
    """LN -> Dense(hidden) -> GELU -> Dense(C) as one fused Pallas kernel
    (transformer norm2+Mlp pair; the (tokens, hidden) intermediate never
    touches HBM). Accepts any leading shape (PiT's (B, N, C) token blocks
    or the 4-D channels-last maps). Same numerics contract as
    convnext_block_apply: fp32 LN statistics, compute-dtype matmuls with
    fp32 accumulation, exact-erf GELU at eval / fast minimax in training
    (resolve_gelu_impl)."""
    gelu_impl = resolve_gelu_impl(training)
    gamma = jnp.ones((x.shape[-1],), jnp.float32)
    shape = x.shape
    if x.ndim != 4:
        x = x.reshape(shape[0], -1, 1, shape[-1])
    out = jax.lax.platform_dependent(
        x, ln_s, ln_b, w1, b1, w2, b2, gamma,
        cpu=functools.partial(plain_ln_mlp, eps=eps, gelu_impl=gelu_impl),
        default=functools.partial(fused_ln_mlp, eps=eps, gelu_impl=gelu_impl),
    )
    return out.reshape(shape)
