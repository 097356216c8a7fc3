"""Depthwise-7x7 convolution with a Pallas weight-gradient kernel.

MEASURED SLOWER THAN XLA — kept as a recorded experiment (opt-in via
IMTPU_DW_WGRAD=1), not wired by default. A/B on v5e, B=128 bf16, 20 iters
after warmup (includes a ~2.4ms per-dispatch floor through the tunneled
device, identical for both paths):

    (128,56,56, 96): xla 2.51 ms   pallas 6.48 ms
    (128,28,28,192): xla 2.42 ms   pallas 4.96 ms
    (128,14,14,384): xla 2.26 ms   pallas 3.45 ms
    (128, 7, 7,768): xla 2.46 ms   pallas 3.10 ms

The hypothesis was that XLA's depthwise weight-grad (the
`convolution_convert_fusion` ops, ~12ms of a ~100ms train step) was far off
speed-of-light; in fact the 49 shifted-window reads this kernel does cost
more in VMEM relayout (sublane shifts per tap) than XLA's conv lowering
costs in HBM, at every stage geometry. Third dw-conv kernel attempt, third
loss to XLA (see ops/convnext_branch.py docstring for the other two) —
XLA's depthwise conv lowering on TPU is simply good.

Forward and dx stay in XLA in all cases.

Reference op: torch dw conv in the ConvNeXt block,
/root/reference/MAP/models/map_convnext.py:21 (nn.Conv2d groups=dim) and
/root/reference/GA/ga_convnext.py:92.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 7  # kernel extent (dw 7x7)
PAD = K // 2


def _wgrad_kernel(xp_ref, dy_ref, dw_ref, *, h: int, w: int):
    """One batch chunk: accumulate the 49 tap sums into the revolving
    (56, C) output block (rows 0..48 used; grid steps are sequential on TPU
    so read-modify-write accumulation across steps is safe)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dy = dy_ref[:]  # (nb, h, w, C) bf16 — no fp32 copy: the products are
    # taken in bf16 (XLA's own wgrad contracts bf16 operands the same way)
    # and only the reduction accumulates in fp32.
    for ky in range(K):
        for kx in range(K):
            win = xp_ref[:, ky:ky + h, kx:kx + w, :]
            tap = jnp.sum(win * dy, axis=(0, 1, 2), dtype=jnp.float32)  # (C,)
            dw_ref[ky * K + kx, :] += tap


def _batch_chunk(h: int, w: int, c: int) -> int:
    """Batch items per grid step. Sized against an *empirical* scratch rate:
    Mosaic keeps several shifted-window product temporaries live across the
    unrolled 49-tap loop, so budget ~24 bytes/feature-map element per batch
    item (measured: 16 items of 56x56x96 wanted 300MB). Larger chunks
    amortize per-grid-step overhead for the small late-stage maps."""
    budget = 48 << 20
    per_item = 24 * h * w * c
    return max(1, min(32, budget // max(per_item, 1)))


def dw7_wgrad(x, dy):
    """dL/dw for a stride-1 SAME depthwise 7x7 conv.

    x: (B, H, W, C) conv input; dy: (B, H, W, C) output cotangent.
    Returns (7, 7, 1, C) fp32 (HWIO, I=1 depthwise layout).
    """
    b, h, w, c = x.shape
    nb = _batch_chunk(h, w, c)
    while b % nb:
        nb -= 1
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, h=h, w=w),
        grid=(b // nb,),
        in_specs=[
            pl.BlockSpec((nb, h + 2 * PAD, w + 2 * PAD, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # 56 rows: 49 taps padded up to the 8-sublane multiple
        out_specs=pl.BlockSpec((56, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((56, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(xp, dy)
    return out[:K * K].reshape(K, K, 1, c)


def _dw_conv7_fwd_xla(x, dw_w, dw_b):
    return jax.lax.conv_general_dilated(
        x, dw_w.astype(x.dtype), (1, 1), [(PAD, PAD), (PAD, PAD)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1]) + dw_b.astype(x.dtype)


@jax.custom_vjp
def dw_conv7_opt(x, dw_w, dw_b):
    """Depthwise 7x7 SAME conv: XLA forward/dx, Pallas weight-grad.

    TPU-only (the Pallas call); the CPU path keeps the plain composition —
    dispatch happens in convnext_block_apply's platform_dependent branch.
    """
    return _dw_conv7_fwd_xla(x, dw_w, dw_b)


def _dw_fwd(x, dw_w, dw_b):
    return _dw_conv7_fwd_xla(x, dw_w, dw_b), (x, dw_w)


def _dw_bwd(res, g):
    x, dw_w = res
    # dx: correlation of g with the spatially flipped kernel (depthwise, so
    # no in/out-channel transpose) — XLA's dw conv is fast
    dx = jax.lax.conv_general_dilated(
        g, jnp.flip(dw_w, (0, 1)).astype(g.dtype), (1, 1), [(PAD, PAD), (PAD, PAD)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g.shape[-1]).astype(x.dtype)
    dw = dw7_wgrad(x, g).astype(dw_w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw, db


dw_conv7_opt.defvjp(_dw_fwd, _dw_bwd)
