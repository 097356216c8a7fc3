"""Partition-free packed window/grid attention for TPU (MaxViT geometry).

The reference's MaxViT attention (/root/reference/MAP/models/map_maxvit.py:
611-644 window/grid partition, :658-719 PartitionAttentionCl) reorders the
NHWC activation into a (B*nWin, 49, C) window batch before and after every
attention — in XLA those partition/reverse transposes are HBM round-trip
copies; the r4 full-step trace charged 45.6 ms/step (16%) to them, and the
49-token windows underfill the 128-row MXU tile besides.

This kernel removes both costs. Three moves:

1. **Free N-D views, legal blocks.** The (B, H, W, 3C) qkv tensor is viewed
   (pure row-major splits — no data movement) as
     block: (B, H/th, th, W, 3C)        — one window-row strip per step
     grid:  (B, th, H/th, tw, W/tw, 3C) — one dilated window-row per step
   so a BlockSpec whose last two dims are FULL array dims (always legal on
   TPU) hands the kernel every window of the strip with only leading-dim
   indexing. The partition never touches HBM. For the grid case one
   in-VMEM transpose (a,b,rr,c)->(a,rr,b,c) makes each dilated window's
   tokens contiguous.
2. **Interleaved packing.** P=2 adjacent windows are packed per score
   matrix (98 rows -> one 128-row MXU tile instead of two half-empty
   ones). The packed rows are gathered as sublane slices + one VMEM
   `jnp.concatenate` (vector shuffles, not HBM copies), which leaves
   tokens window-INTERLEAVED: rather than shuffling data into
   window-major order, the packed rel-pos bias is PERMUTED to match
   (attention is permutation-equivariant; -1e30 masked entries make
   cross-window probability exactly 0).
3. Backward is a Pallas kernel with the same geometry (dqkv assembled
   in-VMEM, permuted-bias gradient accumulated across grid steps and
   un-permuted by XLA autodiff of the bias construction).

The grid case writes its outputs in a (B, th, s0, s1, tw, C) layout whose
(s1, tw)->(tw, s1) un-permute is one XLA transpose — Mosaic has no strided
sublane stores (measured 2026-08-21), so the natural layout cannot be
written directly; this single copy replaces the grid_partition + qkv-split
+ grid_reverse relayout chain.

Numerics mirror XLA autodiff of the plain composition: bf16 MXU matmuls
with fp32 accumulation, fp32 softmax, cotangents cast to the activation
dtype at each matmul.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)


def _pack_factor(ps, h: int, w: int) -> int:
    t = ps[0] * ps[1]
    nu = w // ps[1]
    p = int(os.environ.get("IMTPU_PARTATTN_PACK", "0"))
    if p <= 0:
        p = 2 if 2 * t <= 128 else 1
    while p > 1 and nu % p:
        p -= 1
    return max(p, 1)


def _slot_maps(ps, pack: int):
    """Row -> (window-in-pack, token-in-window) for the kernel's gather
    order (a, w', b): u = a*(pack*tw) + w'*tw + b. Identical for block and
    grid (the grid's in-kernel transpose restores (a, rr, b) order)."""
    th, tw = ps
    a = np.arange(th)
    b = np.arange(tw)
    wp = np.arange(pack)
    win = np.broadcast_to(wp[None, :, None], (th, pack, tw)).reshape(-1)
    tok = np.broadcast_to((a[:, None, None] * tw + b[None, None, :]),
                          (th, pack, tw)).reshape(-1)
    return win, tok


def packed_bias(bias: jnp.ndarray, ps, pack: int,
                order: str = "kernel") -> jnp.ndarray:
    """(heads, T, T) rel-pos bias -> (heads, P*T, P*T) packed bias with
    -1e30 cross-window entries (softmax -> exactly 0). order="kernel" uses
    the kernel's interleaved gather order; "plain" packs windows as
    contiguous row blocks (the XLA twin's order)."""
    bias = bias.astype(jnp.float32)
    if pack == 1:
        return bias
    t = bias.shape[-1]
    if order == "plain":
        win = np.arange(pack * t) // t
        tok = np.arange(pack * t) % t
    else:
        win, tok = _slot_maps(ps, pack)
    same = win[:, None] == win[None, :]
    big = bias[:, tok[:, None], tok[None, :]]
    return jnp.where(same[None], big, jnp.float32(-1e30))


# ---------------------------------------------------------------------------
# Kernel bodies.


def _attend(q, k, v, bias):
    """fp32 softmax(q k^T + bias) @ v for one packed block and head."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
    return p, jnp.dot(p, v, preferred_element_type=jnp.float32)


def _heads_of(blk, c: int, nh: int, h: int):
    """Static per-head q/k/v lane slices of a packed (rows, 3C) block.
    head_first=False channel order [3, heads, dim_head] (map_maxvit.py
    :182-251): a last-dim slice IS the (qkv, head) index."""
    d = c // nh
    q = blk[:, h * d:(h + 1) * d]
    k = blk[:, c + h * d:c + (h + 1) * d]
    v = blk[:, 2 * c + h * d:2 * c + (h + 1) * d]
    return q, k, v


def _image_view(ref, e: int, part_type: str):
    """Per-image strip: block (th, W, C); grid (th, s1, tw, C) — the
    in-VMEM transpose makes each dilated window's tokens contiguous."""
    if part_type == "block":
        return ref[e, 0]
    return ref[e, :, 0].transpose(0, 2, 1, 3)


def _gather_pack(strip, part_type: str, th: int, tw: int, j0: int,
                 pack: int):
    """-> (th*pack*tw, C) packed rows in (a, w', b) order via sublane
    slices + one VMEM concat."""
    if part_type == "block":
        ptw = pack * tw
        pieces = [strip[a, j0 * ptw:(j0 + 1) * ptw, :] for a in range(th)]
    else:
        pieces = [strip[a, j0 * pack + wp, :, :]
                  for a in range(th) for wp in range(pack)]
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0)


def _scatter_pack(o_ref, rows, part_type: str, e: int, th: int, tw: int,
                  j0: int, pack: int):
    ptw = pack * tw
    if part_type == "block":
        for a in range(th):
            o_ref[e, 0, a, j0 * ptw:(j0 + 1) * ptw, :] = \
                rows[a * ptw:(a + 1) * ptw, :]
    else:
        for a in range(th):
            for wp in range(pack):
                o_ref[e, a, 0, j0 * pack + wp, :, :] = \
                    rows[a * ptw + wp * tw:a * ptw + (wp + 1) * tw, :]


def _fwd_kernel(qkv_ref, b2_ref, o_ref, *, part_type: str, ps, nh: int,
                pack: int):
    th, tw = ps
    bb = qkv_ref.shape[0]
    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    nu = (qkv_ref.shape[3] // tw if part_type == "block"
          else qkv_ref.shape[4])
    for e in range(bb):
        strip = _image_view(qkv_ref, e, part_type)
        for j0 in range(nu // pack):
            blk = _gather_pack(strip, part_type, th, tw, j0, pack)
            heads = []
            for h in range(nh):
                q, k, v = _heads_of(blk, c, nh, h)
                _, o = _attend(q, k, v, b2_ref[h])
                heads.append(o.astype(o_ref.dtype))
            rows = heads[0] if nh == 1 else jnp.concatenate(heads, axis=-1)
            _scatter_pack(o_ref, rows, part_type, e, th, tw, j0, pack)


def _bwd_kernel(qkv_ref, b2_ref, g_ref, dqkv_ref, db2_ref, *,
                part_type: str, ps, nh: int, pack: int):
    th, tw = ps
    bb = qkv_ref.shape[0]
    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    d = c // nh
    nu = (qkv_ref.shape[3] // tw if part_type == "block"
          else qkv_ref.shape[4])

    @pl.when(pl.program_id(0) + pl.program_id(1) == 0)
    def _init():
        db2_ref[...] = jnp.zeros_like(db2_ref)

    db_acc = [jnp.zeros(b2_ref.shape[1:], jnp.float32) for _ in range(nh)]
    for e in range(bb):
        strip = _image_view(qkv_ref, e, part_type)
        gstrip = _image_view(g_ref, e, part_type)
        for j0 in range(nu // pack):
            blk = _gather_pack(strip, part_type, th, tw, j0, pack)
            gblk = _gather_pack(gstrip, part_type, th, tw, j0, pack)
            dqs, dks, dvs = [], [], []
            for h in range(nh):
                q, k, v = _heads_of(blk, c, nh, h)
                gh = gblk[:, h * d:(h + 1) * d]
                p, _ = _attend(q, k, v, b2_ref[h])
                # dv = p^T g ; dp = g v^T ; ds = p*(dp - rowsum(dp*p))
                dv = jax.lax.dot_general(p, gh, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                dp = jax.lax.dot_general(gh, v, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                pf = p.astype(jnp.float32)
                ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
                db_acc[h] = db_acc[h] + ds
                dsq = ds.astype(q.dtype)
                dq = jnp.dot(dsq, k, preferred_element_type=jnp.float32)
                dk = jax.lax.dot_general(dsq, q, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                dqs.append(dq.astype(dqkv_ref.dtype))
                dks.append(dk.astype(dqkv_ref.dtype))
                dvs.append(dv.astype(dqkv_ref.dtype))
            rows = jnp.concatenate(dqs + dks + dvs, axis=-1)
            _scatter_pack(dqkv_ref, rows, part_type, e, th, tw, j0, pack)
    for h in range(nh):
        db2_ref[h] += db_acc[h]


# ---------------------------------------------------------------------------
# pallas_call wrappers.


def _block_batch(b: int, per_step_attends: int, block_bytes: int) -> int:
    """Images per grid step: amortize pipeline overhead on small stages
    (target ~32 unrolled attends) without blowing VMEM or compile time."""
    bb = 1
    while (2 * bb <= b and b % (2 * bb) == 0
           and 2 * bb * per_step_attends <= 32
           and 2 * bb * block_bytes <= (4 << 20)):
        bb *= 2
    return bb


def _in_view(x, part_type: str, ps):
    """Free (metadata-only) reshape of (B, H, W, C) to the kernel's view."""
    b, h, w, c = x.shape
    th, tw = ps
    if part_type == "block":
        return x.reshape(b, h // th, th, w, c)
    return x.reshape(b, th, h // th, tw, w // tw, c)


def _specs(part_type: str, b: int, h: int, w: int, c: int, ps, nh: int,
           pack: int, itemsize: int, out: bool = False):
    th, tw = ps
    nu = w // tw
    per_step_attends = (nu // pack) * nh
    bb = _block_batch(b, per_step_attends, th * w * c * itemsize)
    if part_type == "block":
        blk = (bb, 1, th, w, c)
        shape = (b, h // th, th, w, c)
        imap = lambda n, i: (n, i, 0, 0, 0)
    elif out:
        # permuted output layout (B, th, s0, s1, tw, C): un-permuted by one
        # XLA transpose after the call (see module docstring)
        blk = (bb, th, 1, nu, tw, c)
        shape = (b, th, h // th, nu, tw, c)
        imap = lambda n, i: (n, 0, i, 0, 0, 0)
    else:
        blk = (bb, th, 1, tw, nu, c)
        shape = (b, th, h // th, tw, nu, c)
        imap = lambda n, i: (n, 0, i, 0, 0, 0)
    grid = (b // bb, h // th)
    return grid, pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM), shape


def _out_4d(o, part_type: str, b: int, h: int, w: int, c: int):
    if part_type == "block":
        return o.reshape(b, h, w, c)
    return o.transpose(0, 1, 2, 4, 3, 5).reshape(b, h, w, c)


def _fwd_pallas(qkv, bias, *, part_type: str, ps, nh: int, pack: int,
                interpret: bool = False):
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    b2 = packed_bias(bias, ps, pack)
    itemsize = jnp.dtype(qkv.dtype).itemsize
    grid, qspec, _ = _specs(part_type, b, h, w, c3, ps, nh, pack, itemsize)
    _, ospec, oshape = _specs(part_type, b, h, w, c, ps, nh, pack, itemsize,
                              out=True)
    bspec = pl.BlockSpec(b2.shape, lambda n, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, part_type=part_type, ps=tuple(ps),
                          nh=nh, pack=pack),
        grid=grid,
        in_specs=[qspec, bspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct(oshape, qkv.dtype),
        compiler_params=_VMEM,
        interpret=interpret,
    )(_in_view(qkv, part_type, ps), b2)
    return _out_4d(out, part_type, b, h, w, c)


def _bwd_pallas(qkv, bias, g, *, part_type: str, ps, nh: int, pack: int,
                interpret: bool = False):
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    b2 = packed_bias(bias, ps, pack)
    itemsize = jnp.dtype(qkv.dtype).itemsize
    grid, qspec, _ = _specs(part_type, b, h, w, c3, ps, nh, pack, itemsize)
    _, gspec, _ = _specs(part_type, b, h, w, c, ps, nh, pack, itemsize)
    _, dspec, dshape = _specs(part_type, b, h, w, c3, ps, nh, pack,
                              itemsize, out=True)
    bspec = pl.BlockSpec(b2.shape, lambda n, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    accspec = pl.BlockSpec(b2.shape, lambda n, i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    dqkv_v, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, part_type=part_type, ps=tuple(ps),
                          nh=nh, pack=pack),
        grid=grid,
        in_specs=[qspec, bspec, gspec],
        out_specs=[dspec, accspec],
        out_shape=[jax.ShapeDtypeStruct(dshape, qkv.dtype),
                   jax.ShapeDtypeStruct(b2.shape, jnp.float32)],
        compiler_params=_VMEM,
        interpret=interpret,
    )(_in_view(qkv, part_type, ps), b2, _in_view(g, part_type, ps))
    # un-permute the packed-bias cotangent back to (heads, T, T) via the
    # (tiny, XLA-side) bias-construction VJP
    _, bias_vjp = jax.vjp(lambda bi: packed_bias(bi, ps, pack), bias)
    (db,) = bias_vjp(db2)
    return _out_4d(dqkv_v, part_type, b, h, w, c3), db


# ---------------------------------------------------------------------------
# Plain-ops twin (CPU path, parity reference) + differentiable dispatch.


def plain_partition_attention(qkv, bias, *, part_type: str, ps, nh: int,
                              pack: int):
    """XLA composition with numerics identical to the kernel: partition ->
    pack (contiguous-window order) -> fp32 softmax(q k^T + bias2) -> @v ->
    reverse."""
    from imagenet_models_tpu.ops.window_attention import (
        grid_partition,
        grid_reverse,
        window_partition,
        window_reverse,
    )

    b, h, w, c3 = qkv.shape
    c = c3 // 3
    d = c // nh
    t = ps[0] * ps[1]
    bias2 = packed_bias(bias, ps, pack, order="plain")
    part = (window_partition(qkv, ps) if part_type == "block"
            else grid_partition(qkv, ps))
    bwn = part.shape[0]
    rows = part.reshape(bwn // pack, pack * t, c3)
    q = rows[..., :c].reshape(-1, pack * t, nh, d)
    k = rows[..., c:2 * c].reshape(-1, pack * t, nh, d)
    v = rows[..., 2 * c:].reshape(-1, pack * t, nh, d)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32)
    s = s + bias2[None]
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v,
                   preferred_element_type=jnp.float32).astype(qkv.dtype)
    o = o.reshape(bwn, ps[0], ps[1], c)
    return (window_reverse(o, ps, (h, w)) if part_type == "block"
            else grid_reverse(o, ps, (h, w)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused(qkv, bias, part_type, ps, nh, pack):
    return _fwd_pallas(qkv, bias, part_type=part_type, ps=ps, nh=nh,
                       pack=pack)


def _fused_fwd(qkv, bias, part_type, ps, nh, pack):
    return _fused(qkv, bias, part_type, ps, nh, pack), (qkv, bias)


def _fused_bwd(part_type, ps, nh, pack, res, g):
    qkv, bias = res
    return _bwd_pallas(qkv, bias, g, part_type=part_type, ps=ps, nh=nh,
                       pack=pack)


_fused.defvjp(_fused_fwd, _fused_bwd)


def partition_attention(qkv, bias, *, part_type: str, ps, num_heads: int):
    """softmax-attention over window ("block") / dilated-grid ("grid")
    partitions of an UNPARTITIONED (B, H, W, 3*C) qkv tensor; returns
    (B, H, W, C).

    bias: (heads, T, T) pre-softmax rel-pos bias (T = ps[0]*ps[1]); q must
    be pre-scaled by the caller. Packs windows per MXU tile; Pallas on TPU,
    plain XLA composition elsewhere. Differentiable."""
    b, h, w, _ = qkv.shape
    ps = tuple(ps)
    pack = _pack_factor(ps, h, w)

    def fused(qkv, bias):
        return _fused(qkv, bias, part_type, ps, num_heads, pack)

    def plain(qkv, bias):
        return plain_partition_attention(qkv, bias, part_type=part_type,
                                         ps=ps, nh=num_heads, pack=pack)

    return jax.lax.platform_dependent(qkv, bias, cpu=plain, default=fused)
