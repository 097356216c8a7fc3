"""Partition-free packed vertical-stripe attention + fused LePE for CSWin.

The reference's idx=0 LePEAttention branch (/root/reference/GA/ga_cswin.py:
59-136, im2cswin at :215-222) partitions (B, H, W, C) into full-height
vertical stripes of width `split` — in XLA that img2windows transpose (the
W-blocks dim moves past H) is an HBM relayout on each of q/k/v, plus the
reverse on the output and the LePE value windows; the r3 ga_cswin trace
charged ~52% of the train step to this relayout tail. The idx=1 orientation
is free (its partition only moves a size-1 dim) and stays in XLA.

This kernel removes every relayout for idx=0. The key fact: a vertical
stripe is a contiguous block of W columns, and W is the sublane-adjacent
dim of the NHWC layout — so a BlockSpec that blocks the W axis in units of
`pack*ws` columns hands the kernel whole stripes with zero copies (the
stripe index rides the Pallas grid), and the output is written back in the
identical layout. Inside the kernel:

1. Stripe tokens are flattened by `h` row slices + one VMEM concat — each
   slice keeps the tiled (sublane, lane) pair intact, the one layout Mosaic
   can move for free (tokens row-major in (x, stripe, y) order; CSWin has
   no rel-pos bias, so attention is permutation-equivariant and only the
   *mask* must match the row order).
2. `pack` stripes share one score matrix under a block-diagonal -1e30 mask
   (stage-1 56-token stripes: 2 per 128-row MXU tile), exactly the packing
   trick of ops/partition_attention.py.
3. LePE (per-window depthwise 3x3 on V, ga_cswin.py:95-108) is fused as a
   9-tap zero-padded stencil on the in-VMEM (H, ws, C) stripe — the stripe
   border IS the window border — so its partition/reverse relayouts vanish
   too. Backward accumulates dkernel/dbias across grid steps like the
   packed-bias gradient in partition_attention.

Numerics mirror the XLA composition: bf16 MXU matmuls with fp32
accumulation, fp32 softmax, fp32 stencil accumulation (vs XLA conv's fp32
MXU accumulation), cotangents cast back to the activation dtype.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagenet_models_tpu.ops.partition_attention import _attend, _VMEM


def _stripe_pack(t: int, j: int) -> int:
    p = int(os.environ.get("IMTPU_PARTATTN_PACK", "0"))
    if p <= 0:
        p = 2 if 2 * t <= 128 else 1
    while p > 1 and j % p:
        p -= 1
    return max(p, 1)


def _sub_blocks(ws: int, pack: int, w: int):
    """Pallas requires the blocked second-minor (W) dim be a multiple of 8
    or the full axis; return the smallest S with S*pack*ws satisfying that
    and dividing W (S packs are looped in-kernel), or None -> XLA path."""
    pws = pack * ws
    for s in range(1, w // pws + 1):
        bw = s * pws
        if w % bw == 0 and (bw % 8 == 0 or bw == w):
            return s
    return None


def _stripe_mask(ws: int, h: int, pack: int) -> jnp.ndarray:
    """(pack*t, pack*t) additive mask: 0 within a stripe, -1e30 across.
    Row order is the kernel's row-major gather (a, w', y): token (x=a, y) of
    packed stripe w' sits at row a*(pack*ws) + w'*ws + y."""
    pws = pack * ws
    rows = np.arange(h * pws)
    win = (rows % pws) // ws
    return jnp.asarray(np.where(win[:, None] == win[None, :], 0.0, -1e30),
                       jnp.float32)


def _lepe_shift(v, dx: int, dy: int):
    """Zero-padded shift: out[x, y] = v[x+dx, y+dy] (window-local borders).
    Explicit slice+concat (no jnp.pad — Mosaic-friendly)."""
    h, ws, cb = v.shape
    z_row = jnp.zeros((1, ws, cb), v.dtype)
    if dx == 1:
        v = jnp.concatenate([v[1:], z_row], axis=0)
    elif dx == -1:
        v = jnp.concatenate([z_row, v[:-1]], axis=0)
    if dy:
        if ws == 1:
            return jnp.zeros((h, ws, cb), v.dtype)
        z_col = jnp.zeros((h, 1, cb), v.dtype)
        if dy == 1:
            v = jnp.concatenate([v[:, 1:], z_col], axis=1)
        else:
            v = jnp.concatenate([z_col, v[:, :-1]], axis=1)
    return v


def _taps(ws: int):
    """(t, dx, dy) stencil taps; width-1 stripes skip the all-zero dy!=0
    taps (their outputs AND weight grads are exactly zero)."""
    out = []
    t = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if not (ws == 1 and dy):
                out.append((t, dx, dy))
            t += 1
    return out


def _lepe_fwd(v, w9, wb):
    """9-tap depthwise stencil on one (h, ws, cb) stripe; fp32 accumulate.
    All broadcast operands stay >=2-D (Mosaic dislikes 1-D vectors)."""
    ws, cb = v.shape[1], v.shape[2]
    acc = jnp.zeros(v.shape, jnp.float32) + wb.reshape(1, 1, cb)
    for t, dx, dy in _taps(ws):
        acc = acc + (_lepe_shift(v, dx, dy).astype(jnp.float32)
                     * w9[t:t + 1, :].reshape(1, 1, cb))
    return acc


def _rows_of(ref, e: int, h: int, c0: int, c1: int):
    """(bb, h, S*pws, cb) block, columns [c0:c1) -> (h*(c1-c0), cb) token
    rows in (a, w', y) order via h sublane-legal row slices + one concat."""
    pieces = [ref[e, a, c0:c1, :] for a in range(h)]
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0)


def _vs_fwd_kernel(q_ref, k_ref, v_ref, m_ref, w9_ref, wb_ref, o_ref, *,
                   nh: int, ws: int, pack: int, subs: int, scale: float):
    bb, h, _bw, cb = q_ref.shape
    pws = pack * ws
    d = cb // nh
    for e in range(bb):
        for s in range(subs):
            c0, c1 = s * pws, (s + 1) * pws
            qr = _rows_of(q_ref, e, h, c0, c1)
            kr = _rows_of(k_ref, e, h, c0, c1)
            vr = _rows_of(v_ref, e, h, c0, c1)
            heads = []
            for hh in range(nh):
                sl = slice(hh * d, (hh + 1) * d)
                _, o = _attend(qr[:, sl] * scale, kr[:, sl], vr[:, sl],
                               m_ref[...])
                heads.append(o)
            rows = heads[0] if nh == 1 else jnp.concatenate(heads, axis=-1)
            lepes = [_lepe_fwd(v_ref[e, :, c0 + wp * ws:c0 + (wp + 1) * ws, :],
                               w9_ref, wb_ref[...]) for wp in range(pack)]
            lepe = lepes[0] if pack == 1 else jnp.concatenate(lepes, axis=1)
            for a in range(h):
                o_ref[e, a, c0:c1, :] = (rows[a * pws:(a + 1) * pws, :]
                                         + lepe[a]).astype(o_ref.dtype)


def _vs_bwd_kernel(q_ref, k_ref, v_ref, m_ref, w9_ref, wb_ref, g_ref,
                   dq_ref, dk_ref, dv_ref, dw9_ref, dwb_ref, *,
                   nh: int, ws: int, pack: int, subs: int, scale: float):
    bb, h, _bw, cb = q_ref.shape
    pws = pack * ws
    d = cb // nh

    @pl.when(pl.program_id(0) + pl.program_id(1) == 0)
    def _init():
        dw9_ref[...] = jnp.zeros_like(dw9_ref)
        dwb_ref[...] = jnp.zeros_like(dwb_ref)

    dw9_rows = [jnp.zeros((1, cb), jnp.float32) for _ in range(9)]
    dwb_acc = jnp.zeros((1, cb), jnp.float32)
    for e in range(bb):
        for s in range(subs):
            c0, c1 = s * pws, (s + 1) * pws
            qr = _rows_of(q_ref, e, h, c0, c1)
            kr = _rows_of(k_ref, e, h, c0, c1)
            vr = _rows_of(v_ref, e, h, c0, c1)
            gr = _rows_of(g_ref, e, h, c0, c1)
            dqs, dks, dvs = [], [], []
            for hh in range(nh):
                sl = slice(hh * d, (hh + 1) * d)
                q, k, v = qr[:, sl] * scale, kr[:, sl], vr[:, sl]
                gh = gr[:, sl]
                p_, _ = _attend(q, k, v, m_ref[...])
                dv = jax.lax.dot_general(p_, gh, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                dp = jax.lax.dot_general(gh, v, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                pf = p_.astype(jnp.float32)
                ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
                dsq = ds.astype(q.dtype)
                dq = jnp.dot(dsq, k,
                             preferred_element_type=jnp.float32) * scale
                dk = jax.lax.dot_general(dsq, q, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                dqs.append(dq.astype(dq_ref.dtype))
                dks.append(dk.astype(dk_ref.dtype))
                dvs.append(dv)
            dqr = dqs[0] if nh == 1 else jnp.concatenate(dqs, axis=-1)
            dkr = dks[0] if nh == 1 else jnp.concatenate(dks, axis=-1)
            dvr = dvs[0] if nh == 1 else jnp.concatenate(dvs, axis=-1)
            dv_lepes = []
            for wp in range(pack):
                w0 = c0 + wp * ws
                gs = g_ref[e, :, w0:w0 + ws, :]
                vs = v_ref[e, :, w0:w0 + ws, :]
                gf = gs.astype(jnp.float32)
                # dv += transposed-stencil(g); dw9[t] += sum(shift_t(v)*g)
                dv_lepe = jnp.zeros((h, ws, cb), jnp.float32)
                for t, dx, dy in _taps(ws):
                    dv_lepe = dv_lepe + (
                        _lepe_shift(gs, -dx, -dy).astype(jnp.float32)
                        * w9_ref[t:t + 1, :].reshape(1, 1, cb))
                    dw9_rows[t] = dw9_rows[t] + jnp.sum(
                        _lepe_shift(vs, dx, dy).astype(jnp.float32) * gf,
                        axis=(0, 1), keepdims=True).reshape(1, cb)
                dwb_acc = dwb_acc + jnp.sum(gf, axis=(0, 1),
                                            keepdims=True).reshape(1, cb)
                dv_lepes.append(dv_lepe)
            dv_lepe = (dv_lepes[0] if pack == 1
                       else jnp.concatenate(dv_lepes, axis=1))
            for a in range(h):
                dv_ref[e, a, c0:c1, :] = (dvr[a * pws:(a + 1) * pws, :]
                                          + dv_lepe[a]).astype(dv_ref.dtype)
                dq_ref[e, a, c0:c1, :] = dqr[a * pws:(a + 1) * pws, :]
                dk_ref[e, a, c0:c1, :] = dkr[a * pws:(a + 1) * pws, :]
    dw9_ref[...] += jnp.concatenate(dw9_rows, axis=0)
    dwb_ref[...] += dwb_acc


def _vs_block_batch(b: int, attends: int, block_bytes: int) -> int:
    bb = 1
    while (2 * bb <= b and b % (2 * bb) == 0 and 2 * bb * attends <= 32
           and 2 * bb * block_bytes <= (4 << 20)):
        bb *= 2
    return bb


def _vs_parts(q, ws: int, pack: int, subs: int, nh: int):
    """Blocks are (bb, h, S*pack*ws, cb): the W dim (sublane-adjacent) is
    the blocked axis, so every row slice the kernel takes keeps the tiled
    (sublane, lane) pair intact — Mosaic rejects layouts that move the
    token dim out of it ('unsupported shape cast', measured 2026-08-21) —
    and S packs share a block so the W block size hits the multiple-of-8
    lowering rule (the second error mode, same date)."""
    b, h, w, cb = q.shape
    bw = subs * pack * ws
    itemsize = jnp.dtype(q.dtype).itemsize
    bb = _vs_block_batch(b, subs * nh, 3 * h * bw * cb * itemsize)
    spec = pl.BlockSpec((bb, h, bw, cb), lambda n, i: (n, 0, i, 0),
                        memory_space=pltpu.VMEM)
    grid = (b // bb, w // bw)
    return grid, spec


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda n, i: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _vs_fwd_pallas(q, k, v, w9, wb, *, ws, nh, scale, pack,
                   interpret=False):
    b, h, w, cb = q.shape
    mask = _stripe_mask(ws, h, pack)
    subs = _sub_blocks(ws, pack, w)
    grid, spec = _vs_parts(q, ws, pack, subs, nh)
    out = pl.pallas_call(
        functools.partial(_vs_fwd_kernel, nh=nh, ws=ws, pack=pack,
                          subs=subs, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec, _const_spec(mask.shape),
                  _const_spec(w9.shape), _const_spec(wb.shape)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=_VMEM,
        interpret=interpret,
    )(q, k, v, mask, w9, wb)
    return out


def _vs_bwd_pallas(q, k, v, w9, wb, g, *, ws, nh, scale, pack,
                   interpret=False):
    b, h, w, cb = q.shape
    mask = _stripe_mask(ws, h, pack)
    subs = _sub_blocks(ws, pack, w)
    grid, spec = _vs_parts(q, ws, pack, subs, nh)
    dq, dk, dv, dw9, dwb = pl.pallas_call(
        functools.partial(_vs_bwd_kernel, nh=nh, ws=ws, pack=pack,
                          subs=subs, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec, _const_spec(mask.shape),
                  _const_spec(w9.shape), _const_spec(wb.shape), spec],
        out_specs=[spec, spec, spec, _const_spec(w9.shape),
                   _const_spec(wb.shape)],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3
        + [jax.ShapeDtypeStruct(w9.shape, jnp.float32),
           jax.ShapeDtypeStruct(wb.shape, jnp.float32)],
        compiler_params=_VMEM,
        interpret=interpret,
    )(q, k, v, mask, w9, wb, g)
    return dq, dk, dv, dw9, dwb


def plain_stripe_attention(q, k, v, w9, wb, *, ws, nh, scale):
    """XLA twin with the kernel's numerics: stripe partition -> fp32
    softmax((q*scale) k^T) @ v -> + depthwise-3x3 LePE -> reverse."""
    b, h, w, cb = q.shape
    d = cb // nh
    j = w // ws

    def windows(t):  # (B, H, W, C) -> (B*j, h*ws, nh, d), tokens row-major
        t = t.reshape(b, h, j, ws, cb).transpose(0, 2, 1, 3, 4)
        return t.reshape(b * j, h * ws, nh, d)

    qw, kw, vw = windows(q), windows(k), windows(v)
    s = jnp.einsum("bnhd,bmhd->bhnm", qw * scale, kw,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, vw,
                   preferred_element_type=jnp.float32)
    vs = v.reshape(b, h, j, ws, cb).transpose(0, 2, 1, 3, 4)
    vs = vs.reshape(b * j, h, ws, cb)
    kern = w9.reshape(3, 3, 1, cb)
    lepe = jax.lax.conv_general_dilated(
        vs.astype(jnp.float32), kern, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=cb) + wb[0]
    o = (o.reshape(b * j, h, ws, cb) + lepe).astype(q.dtype)
    o = o.reshape(b, j, h, ws, cb).transpose(0, 2, 1, 3, 4)
    return o.reshape(b, h, w, cb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused(q, k, v, w9, wb, ws, nh, scale, pack):
    return _vs_fwd_pallas(q, k, v, w9, wb, ws=ws, nh=nh, scale=scale,
                          pack=pack)


def _fused_fwd(q, k, v, w9, wb, ws, nh, scale, pack):
    return _fused(q, k, v, w9, wb, ws, nh, scale, pack), (q, k, v, w9, wb)


def _fused_bwd(ws, nh, scale, pack, res, g):
    q, k, v, w9, wb = res
    return _vs_bwd_pallas(q, k, v, w9, wb, g, ws=ws, nh=nh, scale=scale,
                          pack=pack)


_fused.defvjp(_fused_fwd, _fused_bwd)


def use_fused_stripe_attn(x_shape, ws: int, attn_drop: float,
                          deterministic: bool) -> bool:
    """Gate: on by default for idx=0 stripes (IMTPU_STRIPE_ATTN=xla restores
    the partitioned composition). Softmax dropout would need in-kernel RNG;
    h == ws is the single-window last stage (partition already free);
    oversized stripes would blow the VMEM block."""
    if os.environ.get("IMTPU_STRIPE_ATTN", "fused") == "xla":
        return False
    if attn_drop > 0 and not deterministic:
        return False
    h, w, cb = x_shape[1], x_shape[2], x_shape[3]
    if w % ws or (h == ws and w == ws):
        return False
    # The kernel gathers h row slices per stripe attend, so its constant
    # cost scales with h while the saved relayout scales with the stage's
    # share of depth: the all-stage A/B measured 702.8 vs 716-726 img/s
    # (ga_cswin_tiny B=128, 2026-08-21) while stage-3 (h=14, 21 of 26
    # blocks) is where the fusion pays. Engage only for h <= MAXH.
    if h > int(os.environ.get("IMTPU_STRIPE_MAXH", "16")):
        return False
    pack = _stripe_pack(h * ws, w // ws)
    subs = _sub_blocks(ws, pack, w)
    if subs is None:
        return False
    return 3 * h * subs * pack * ws * cb * 2 <= (4 << 20)


def stripe_attention(q, k, v, w9, wb, *, ws: int, num_heads: int,
                     scale: float):
    """Vertical-stripe (idx=0, H_sp=H) LePE attention over UNPARTITIONED
    (B, H, W, C) q/k/v; returns (B, H, W, C) = attention + depthwise-3x3
    LePE(v), stripe borders respected. w9: (9, C) fp32 depthwise taps
    (reshaped (3,3,1,C) HWIO kernel); wb: (1, C) fp32 bias. Pallas on TPU,
    plain XLA twin elsewhere. Differentiable in q/k/v/w9/wb."""
    b, h, w, cb = q.shape
    pack = _stripe_pack(h * ws, w // ws)

    def fused(q, k, v, w9, wb):
        return _fused(q, k, v, w9, wb, ws, num_heads, scale, pack)

    def plain(q, k, v, w9, wb):
        return plain_stripe_attention(q, k, v, w9, wb, ws=ws, nh=num_heads,
                                      scale=scale)

    return jax.lax.platform_dependent(q, k, v, w9, wb, cpu=plain,
                                      default=fused)
