"""Fused per-channel BatchNorm statistics for training (Pallas, TPU) —
MEASURED LOSER, kept opt-in as the receipt for the VERDICT-r3 MaxViT levers
(b) one-pass/bf16 BN statistics and (c) a fused stat-reduction kernel.

Hypothesis (round-4 profile, v5e B=128): XLA charges the BN-family train
steps heavily for `convert_reduce` stat fusions (map_maxvit_tiny_tf_224
45.8 ms/step, the 112^2 x 256 MBConv expansion stats at ~110 GB/s apparent;
map_resnet50 19.1 ms + 8.5 ms `multiply_reduce` in the BN backward), so a
one-pass Pallas kernel per reduction should reclaim most of it:

- forward:  sums(x), sums(x^2)      -> mean/var        (`_moments_kernel`)
- backward: sums(dy), sums(dy * x)  -> dbias/dscale/dx (`_dot_sums_kernel`)

with tokens consumed in (h,w,b) order (transpose(1,2,0,3) = a bitcast of
XLA's batch-minor conv layouts, the IMTPU_LNMLP_HWBC trick; channel sums are
token-order-invariant).

A/B on the full train step (scripts/bench_train.py, v5e B=128, 2026-08-20)
REFUTED it, in both granularities:

  | IMTPU_PALLAS_BN             | map_resnet50 | map_maxvit_tiny_tf_224 |
  |-----------------------------|--------------|------------------------|
  | 0   (XLA, default)          | 1209.9       | 452.5                  |
  | bwd (Pallas bwd reduces)    |  899.3 -26%  | 402.0 -11%             |
  | 1   (Pallas fwd+bwd)        |  848.7 -30%  | 390.7 -14%             |

Root cause: the apparent slowness of the XLA fusions was double duty, not
waste — the conv epilogues already compute the forward stats inline (the
resnet profile's `fusion.175 = (f32[64], f32[64], bf16[...]) fusion(conv)`
ops), and the standalone convert_reduce fusions carry full-tensor RELAYOUT
outputs the graph needs anyway. A separate pallas_call adds a full
activation read per reduction, breaks the epilogue fusion, and pins operand
layouts at the custom-VJP boundary. The profile numbers were attributing
layout-copy traffic to the statistics.

Status: `use_fused_bn` returns False unless IMTPU_PALLAS_BN is set to
"1"/"full"/"bwd"; kernels stay parity-tested (tests/test_batch_norm_kernel)
as the engineering record. SyncBN (axis_name) and --split-bn always keep the
plain-ops path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fit_tile(t: int, n: int) -> int:
    """Largest multiple of 8 <= t dividing n (whole n as last resort)."""
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


def _moments_kernel(x_ref, s1_ref, s2_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    x = x_ref[:].astype(jnp.float32)
    s1_ref[:] += jnp.sum(x, axis=0, keepdims=True)
    s2_ref[:] += jnp.sum(x * x, axis=0, keepdims=True)


def _dot_sums_kernel(a_ref, b_ref, s1_ref, s2_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    a = a_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    s1_ref[:] += jnp.sum(a, axis=0, keepdims=True)
    s2_ref[:] += jnp.sum(a * b, axis=0, keepdims=True)


def _tile_for(n: int, c: int) -> int:
    # block = tile x C in bf16, double-buffered, plus the fp32 upcast (and
    # x*x / a*b product) temporaries at 2x that — keep the whole working set
    # inside the raised scoped-VMEM limit (_VMEM_LIMIT)
    budget = 2 << 20
    t = max(8, min(int(os.environ.get("IMTPU_BN_TILE", "4096")), budget // max(c * 2, 1)))
    return _fit_tile(t, n)


_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 << 20)


def _tokens(x):
    """(B,H,W,C) -> (N,C) tokens in (h,w,b) order (bitcast for batch-minor
    conv layouts); other ranks flatten as-is."""
    if x.ndim == 4:
        x = jnp.transpose(x, (1, 2, 0, 3))
    return x.reshape(-1, x.shape[-1])


def channel_moments(x):
    """fp32 (sum(x), sum(x^2)) over all but the channel axis, one pass."""
    t = _tokens(x)
    n, c = t.shape
    tile = _tile_for(n, c)
    s1, s2 = pl.pallas_call(
        _moments_kernel,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, c), jnp.float32)] * 2,
        compiler_params=_VMEM_LIMIT,
    )(t)
    return s1[0], s2[0]


def channel_dot_sums(a, b):
    """fp32 (sum(a), sum(a*b)) over all but the channel axis, one pass."""
    ta, tb = _tokens(a), _tokens(b)
    n, c = ta.shape
    tile = _tile_for(n, c)
    s1, s2 = pl.pallas_call(
        _dot_sums_kernel,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, c), jnp.float32)] * 2,
        compiler_params=_VMEM_LIMIT,
    )(ta, tb)
    return s1[0], s2[0]


def _n_rows(x) -> int:
    n = 1
    for d in x.shape[:-1]:
        n *= d
    return n


def plain_bn_train(x, scale, bias, eps, out_dtype=None):
    """Reference formulation (identical math to the pre-round-4
    nn/layers.BatchNorm training branch): fp32 one-pass E[x^2]-E[x]^2 stats,
    fp32 normalize, ONE cast to out_dtype (default x.dtype). Returns
    (y, mean, var[biased])."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    mean2 = jnp.mean(jnp.square(xf), axis=axes)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps) * scale
    y = ((xf - mean) * inv + bias).astype(out_dtype or x.dtype)
    return y, mean, var


# IMTPU_PALLAS_BN mode: "1"/"full" = Pallas fwd stats AND bwd reduces;
# "bwd" = XLA fwd stats (they fuse into the producing conv's epilogue),
# Pallas bwd reduces only; "0" = plain XLA everywhere — THE DEFAULT (both
# Pallas modes measured slower on the full train step; table in the module
# docstring).
_PALLAS_BN_MODE = os.environ.get("IMTPU_PALLAS_BN", "0")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_bn_train(x, scale, bias, eps, out_dtype=None):
    y, mean, var, _ = _fused_fwd_impl(x, scale, bias, eps, out_dtype)
    return y, mean, var


def _fused_fwd_impl(x, scale, bias, eps, out_dtype=None):
    n = _n_rows(x)
    if _PALLAS_BN_MODE in ("1", "full"):
        s1, s2 = channel_moments(x)
        mean = s1 / n
        var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    else:  # "bwd": XLA computes the stats (fused into the conv epilogue)
        xf32 = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf32, axis=axes)
        var = jnp.maximum(jnp.mean(jnp.square(xf32), axis=axes)
                          - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = ((x.astype(jnp.float32) - mean) * (inv * scale) + bias).astype(
        out_dtype or x.dtype)
    return y, mean, var, inv


def _fused_fwd(x, scale, bias, eps, out_dtype):
    y, mean, var, inv = _fused_fwd_impl(x, scale, bias, eps, out_dtype)
    return (y, mean, var), (x, scale, mean, inv)


def _fused_bwd(eps, out_dtype, res, cts):
    """Batch-statistics BN backward with the two per-channel reductions
    (sum dy, sum dy*x) fused into one Pallas pass:

      dx = inv*scale * (dy - sum(dy)/n - xhat * sum(dy*xhat)/n)
           + gmean/n + gvar * 2(x-mean)/n
      dscale = sum(dy * xhat),  dbias = sum(dy)

    where sum(dy*xhat) = inv * (sum(dy*x) - mean*sum(dy)). The gmean/gvar
    cotangent terms are the (normally zero — batch_stats are aux) gradients
    through the returned statistics."""
    x, scale, mean, inv = res
    gy, gmean, gvar = cts
    n = _n_rows(x)
    s1, s2 = channel_dot_sums(gy, x)
    sum_gy_xhat = inv * (s2 - mean * s1)
    xf = x.astype(jnp.float32)
    xhat = (xf - mean) * inv
    dx = (inv * scale) * (gy.astype(jnp.float32) - s1 / n - xhat * sum_gy_xhat / n)
    dx = dx + gmean / n + gvar * (2.0 / n) * (xf - mean)
    return (dx.astype(x.dtype),
            sum_gy_xhat.astype(scale.dtype),
            s1.astype(scale.dtype))


fused_bn_train.defvjp(_fused_fwd, _fused_bwd)


def use_fused_bn(x) -> bool:
    """Gate: 4-D activations big enough for the reduction to matter, with a
    tileable row count. SyncBN/split-BN callers must not route here (the
    stats kernel has no axis_name hook)."""
    if _PALLAS_BN_MODE not in ("0", "1", "full", "bwd"):
        raise ValueError(
            f"IMTPU_PALLAS_BN={_PALLAS_BN_MODE!r}: expected 0 (off, default)"
            ", 1/full (Pallas fwd stats + bwd reduces) or bwd (bwd only)")
    if _PALLAS_BN_MODE == "0" or x.ndim != 4 \
            or x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    n = _n_rows(x)
    if n * x.shape[-1] < (1 << 18):  # tiny tensors: dispatch floor dominates
        return False
    tile = _fit_tile(_tile_for(n, x.shape[-1]), n)
    if tile < 64:
        return False
    # _fit_tile falls back to t=n for awkward row counts (large prime
    # factors) — that stages the whole (n, C) tensor as ONE block; reject
    # any resolved tile whose double-buffered block + fp32 temporaries
    # would blow the scoped-VMEM limit instead of failing to compile.
    itemsize = jnp.dtype(x.dtype).itemsize
    if tile * x.shape[-1] * (2 * itemsize + 3 * 4) > (48 << 20):
        return False
    return True


def bn_train_apply(x, scale, bias, eps, out_dtype=None):
    """(y, mean, var[biased]) with training batch statistics, y cast ONCE to
    out_dtype (default x.dtype); Pallas fused reductions on TPU, plain ops
    elsewhere (identical math both ways)."""
    return jax.lax.platform_dependent(
        x, scale, bias,
        cpu=functools.partial(plain_bn_train, eps=eps, out_dtype=out_dtype),
        default=functools.partial(fused_bn_train, eps=eps, out_dtype=out_dtype),
    )
