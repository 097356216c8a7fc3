"""Partition-free packed window attention for TPU (MaxViT block geometry).

The reference's MaxViT attention (/root/reference/MAP/models/map_maxvit.py:
611-644 window/grid partition, :658-719 PartitionAttentionCl) reorders the
NHWC activation into a (B*nWin, 49, C) window batch before and after every
attention — in XLA those partition/reverse transposes are HBM round-trip
copies; the r4 full-step trace charged 45.6 ms/step (16%) to them, and the
49-token windows underfill the 128-row MXU tile besides.

This kernel removes both costs for the block-window case:

1. **Free 5-D view, legal blocks.** The (B, H, W, 3C) qkv tensor is viewed
   as (B, H/th, th, W, 3C) (a pure row-major split — no data movement); a
   BlockSpec whose last two dims are FULL array dims (always legal on TPU)
   hands the kernel one window-row strip (th, W, 3C) per image per step.
   The partition never touches HBM.
2. **Interleaved packing.** P=2 adjacent windows are packed per score
   matrix (98 rows -> one 128-row MXU tile instead of two half-empty ones).
   The packed rows are gathered in-VMEM as th sublane slices of the strip
   (`jnp.concatenate` — vector shuffles, not HBM copies), which leaves
   tokens window-INTERLEAVED: rather than shuffling data into window-major
   order, the packed rel-pos bias is PERMUTED to match (attention is
   permutation-equivariant; -1e30 masked entries make cross-window
   probability exactly 0). The permutation is baked into the tiny
   (heads, PT, PT) bias tensor in XLA — activations never move.
3. Backward is a Pallas kernel with the same geometry (dqkv assembled
   in-VMEM, permuted-bias gradient accumulated across grid steps and
   un-permuted by XLA autodiff of the bias construction).

The dilated-grid partition keeps the XLA composition: its window tokens are
stride-s1 columns, which Mosaic cannot gather contiguously (strided
loads/dynamic slices unsupported; measured 2026-08-21), so a grid kernel
would pay an XLA-side relayout anyway — see PARITY.md receipts.

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
    order (a, w', b): u = a*(pack*tw) + w'*tw + b."""
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


def _gather_pair(strip, th: int, j0: int, ptw: int):
    """(th, W, C) strip -> (th*ptw, C) packed rows for the windows covering
    columns [j0*ptw, (j0+1)*ptw): th sublane slices + one VMEM concat."""
    if th == 1:
        return strip[0, j0 * ptw:(j0 + 1) * ptw, :]
    return jnp.concatenate(
        [strip[a, j0 * ptw:(j0 + 1) * ptw, :] for a in range(th)], axis=0)


def _fwd_kernel(qkv_ref, b2_ref, o_ref, *, ps, nh: int, pack: int):
    th, tw = ps
    ptw = pack * tw
    bb = qkv_ref.shape[0]
    w = qkv_ref.shape[3]
    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    for e in range(bb):
        strip = qkv_ref[e, 0]
        for j0 in range(w // ptw):
            blk = _gather_pair(strip, th, j0, ptw)
            heads = []
            for h in range(nh):
                q, k, v = _heads_of(blk, c, nh, h)
                _, o = _attend(q, k, v, b2_ref[h])
                heads.append(o.astype(o_ref.dtype))
            rows = heads[0] if nh == 1 else jnp.concatenate(heads, axis=-1)
            for a in range(th):
                o_ref[e, 0, a, j0 * ptw:(j0 + 1) * ptw, :] = \
                    rows[a * ptw:(a + 1) * ptw, :]


def _bwd_kernel(qkv_ref, b2_ref, g_ref, dqkv_ref, db2_ref, *,
                ps, nh: int, pack: int):
    th, tw = ps
    ptw = pack * tw
    bb = qkv_ref.shape[0]
    w = qkv_ref.shape[3]
    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    d = c // nh

    @pl.when(pl.program_id(0) + pl.program_id(1) == 0)
    def _init():
        db2_ref[...] = jnp.zeros_like(db2_ref)

    db_acc = [jnp.zeros(b2_ref.shape[1:], jnp.float32) for _ in range(nh)]
    for e in range(bb):
        strip = qkv_ref[e, 0]
        gstrip = g_ref[e, 0]
        for j0 in range(w // ptw):
            blk = _gather_pair(strip, th, j0, ptw)
            gblk = _gather_pair(gstrip, th, j0, ptw)
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
            for a in range(th):
                dqkv_ref[e, 0, a, j0 * ptw:(j0 + 1) * ptw, :] = \
                    rows[a * ptw:(a + 1) * ptw, :]
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


def _specs(b: int, h: int, w: int, c: int, ps, nh: int, pack: int,
           itemsize: int):
    th, tw = ps
    per_step_attends = (w // (pack * tw)) * nh
    bb = _block_batch(b, per_step_attends, th * w * c * itemsize)
    blk = (bb, 1, th, w, c)
    spec = pl.BlockSpec(blk, lambda n, i: (n, i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return (b // bb, h // th), spec


def _five_d(x, th: int):
    b, h, w, c = x.shape
    return x.reshape(b, h // th, th, w, c)


def _fwd_pallas(qkv, bias, *, ps, nh: int, pack: int,
                interpret: bool = False):
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    b2 = packed_bias(bias, ps, pack)
    itemsize = jnp.dtype(qkv.dtype).itemsize
    grid, qspec = _specs(b, h, w, c3, ps, nh, pack, itemsize)
    _, ospec = _specs(b, h, w, c, ps, nh, pack, itemsize)
    bspec = pl.BlockSpec(b2.shape, lambda n, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    out5 = pl.pallas_call(
        functools.partial(_fwd_kernel, ps=tuple(ps), nh=nh, pack=pack),
        grid=grid,
        in_specs=[qspec, bspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, h // ps[0], ps[0], w, c),
                                       qkv.dtype),
        compiler_params=_VMEM,
        interpret=interpret,
    )(_five_d(qkv, ps[0]), b2)
    return out5.reshape(b, h, w, c)


def _bwd_pallas(qkv, bias, g, *, ps, nh: int, pack: int,
                interpret: bool = False):
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    b2 = packed_bias(bias, ps, pack)
    itemsize = jnp.dtype(qkv.dtype).itemsize
    grid, qspec = _specs(b, h, w, c3, ps, nh, pack, itemsize)
    _, gspec = _specs(b, h, w, c, ps, nh, pack, itemsize)
    bspec = pl.BlockSpec(b2.shape, lambda n, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    accspec = pl.BlockSpec(b2.shape, lambda n, i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    dqkv5, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, ps=tuple(ps), nh=nh, pack=pack),
        grid=grid,
        in_specs=[qspec, bspec, gspec],
        out_specs=[qspec, accspec],
        out_shape=[jax.ShapeDtypeStruct((b, h // ps[0], ps[0], w, c3),
                                        qkv.dtype),
                   jax.ShapeDtypeStruct(b2.shape, jnp.float32)],
        compiler_params=_VMEM,
        interpret=interpret,
    )(_five_d(qkv, ps[0]), b2, _five_d(g, ps[0]))
    # un-permute the packed-bias cotangent back to (heads, T, T) via the
    # (tiny, XLA-side) bias-construction VJP
    _, bias_vjp = jax.vjp(lambda bi: packed_bias(bi, ps, pack), bias)
    (db,) = bias_vjp(db2)
    return dqkv5.reshape(b, h, w, c3), db


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused(qkv, bias, ps, nh, pack):
    return _fwd_pallas(qkv, bias, ps=ps, nh=nh, pack=pack)


def _fused_fwd(qkv, bias, ps, nh, pack):
    return _fused(qkv, bias, ps, nh, pack), (qkv, bias)


def _fused_bwd(ps, nh, pack, res, g):
    qkv, bias = res
    return _bwd_pallas(qkv, bias, g, ps=ps, nh=nh, pack=pack)


_fused.defvjp(_fused_fwd, _fused_bwd)


def partition_attention(qkv, bias, *, part_type: str, ps, num_heads: int):
    """softmax-attention over block-window partitions of an UNPARTITIONED
    (B, H, W, 3*C) qkv tensor; returns (B, H, W, C).

    bias: (heads, T, T) pre-softmax rel-pos bias (T = ps[0]*ps[1]); q must
    be pre-scaled by the caller. Packs windows per MXU tile; Pallas on TPU,
    plain XLA composition elsewhere. Differentiable. part_type must be
    "block" (the dilated grid keeps the XLA path — see module docstring)."""
    assert part_type == "block", part_type
    b, h, w, _ = qkv.shape
    ps = tuple(ps)
    pack = _pack_factor(ps, h, w)

    def fused(qkv, bias):
        return _fused(qkv, bias, ps, num_heads, pack)

    def plain(qkv, bias):
        return plain_partition_attention(qkv, bias, part_type="block",
                                         ps=ps, nh=num_heads, pack=pack)

    return jax.lax.platform_dependent(qkv, bias, cpu=plain, default=fused)
