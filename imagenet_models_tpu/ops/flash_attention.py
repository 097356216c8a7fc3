"""Fused window attention for TPU: softmax(q@k^T + bias) @ v in one Pallas
kernel, batched over (window, head).

The reference's window attentions (CSWin stripes /root/reference/GA/
ga_cswin.py:59-136, MaxViT window/grid map_maxvit.py:611-644, FasterViT HAT
map_fastervit.py:571-705) run as torch SDPA over many tiny windows. In XLA
the equivalent batched-matmul + softmax materializes the (nWin*heads, n, n)
score tensor in HBM twice per direction; for GA-CSWin-T stage 3 that is
~13GB of HBM traffic per 256-image batch. Windows are tiny (n <= 98 tokens
for CSWin, 49 for stage-5), so the whole score matrix for a window fits in
VMEM: this kernel fuses qk^T -> (+bias) -> fp32 softmax -> @v, grouping G
windows per grid step to amortize pipeline overhead.

No online/streaming softmax is needed (that trick exists for long sequences);
a plain fp32 softmax over the full in-VMEM score matrix is exact and faster
here.

Numerics match the XLA path: bf16 MXU matmuls with fp32 accumulation, fp32
softmax (ops/cswin_attention.py:86-89 semantics).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_body(q, k, v, bias, *, n: int, np_: int):
    """qk^T -> (+bias) -> fp32 masked softmax -> @v for one (Np, D) window.

    Single source of the numerics for both kernel layouts (per-window bias
    and per-head shared bias) so a masking/precision fix cannot diverge them."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias
    if n != np_:
        col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
        s = jnp.where(col < n, s, jnp.float32(-1e30))  # padded KEY columns
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
    return jnp.dot(p, v, preferred_element_type=jnp.float32)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n: int, np_: int, g: int,
                 bias_ref=None):
    """One grid step: G windows of (Np, D) q/k/v -> (Np, D) out each."""
    for w in range(g):
        bias = bias_ref[w].astype(jnp.float32) if bias_ref is not None else None
        o_ref[w] = _attn_body(q_ref[w], k_ref[w], v_ref[w], bias,
                              n=n, np_=np_).astype(o_ref.dtype)


def fused_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           bias: Optional[jnp.ndarray] = None,
                           group: int = 0,
                           interpret: bool = False) -> jnp.ndarray:
    """softmax(q @ k^T [+ bias]) @ v over a flat window*head batch.

    q, k, v: (BW, N, D) — BW = batch * windows * heads, N tokens per window.
    bias:    optional (BW, N, N) additive pre-softmax bias (rel-pos / LePE
             style biases must be broadcast by the caller).
    Scale q beforehand. Returns (BW, N, D).
    """
    bw, n, d = q.shape
    np_ = _round_up(n, 8)
    dp = _round_up(d, 128)

    if group <= 0:
        # amortize grid overhead; keep G * Np * Dp modest for VMEM
        import os

        group = int(os.environ.get("IMTPU_FLASH_GROUP", "32"))
        while group > 1 and bw % group:
            group //= 2
    assert bw % group == 0, (bw, group)

    pad_qkv = [(0, 0), (0, np_ - n), (0, dp - d)]
    qp = jnp.pad(q, pad_qkv)
    kp = jnp.pad(k, pad_qkv)
    vp = jnp.pad(v, pad_qkv)

    specs = [pl.BlockSpec((group, np_, dp), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)] * 3
    operands = [qp, kp, vp]
    bias_kw = {}
    if bias is not None:
        bp = jnp.pad(bias, [(0, 0), (0, np_ - n), (0, np_ - n)])
        specs.append(pl.BlockSpec((group, np_, np_), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM))
        operands.append(bp)

    def kernel(*refs):
        if bias is not None:
            q_ref, k_ref, v_ref, b_ref, o_ref = refs
            _attn_kernel(q_ref, k_ref, v_ref, o_ref, n=n, np_=np_, g=group,
                         bias_ref=b_ref)
        else:
            q_ref, k_ref, v_ref, o_ref = refs
            _attn_kernel(q_ref, k_ref, v_ref, o_ref, n=n, np_=np_, g=group)

    out = pl.pallas_call(
        kernel,
        grid=(bw // group,),
        in_specs=specs,
        out_specs=pl.BlockSpec((group, np_, dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, np_, dp), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(*operands)
    return out[:, :n, :d]


def _attn_kernel_heads(q_ref, k_ref, v_ref, b_ref, o_ref, *, n: int, np_: int,
                       g: int):
    """Per-head shared bias: q/k/v blocks (G, 1, Np, Dp), bias (1, Np, Np)."""
    bias = b_ref[0].astype(jnp.float32)  # loaded once, shared by all G windows
    for w in range(g):
        o_ref[w, 0] = _attn_body(q_ref[w, 0], k_ref[w, 0], v_ref[w, 0], bias,
                                 n=n, np_=np_).astype(o_ref.dtype)


def fused_window_attention_heads(q, k, v, bias, group: int = 0,
                                 interpret: bool = False):
    """softmax(q @ k^T + bias[head]) @ v with a per-head shared bias.

    q, k, v: (BW, H, N, D) — BW = batch*windows; bias (H, N, N) shared across
    windows (MaxViT rel-pos tables, map_maxvit.py:647-655; FasterViT CPB).
    Avoids broadcasting the bias to every window in HBM. q pre-scaled."""
    bw, heads, n, d = q.shape
    np_ = _round_up(n, 8)
    dp = _round_up(d, 128)
    if group <= 0:
        group = 8
        while group > 1 and bw % group:
            group //= 2
    assert bw % group == 0, (bw, group)

    pad = [(0, 0), (0, 0), (0, np_ - n), (0, dp - d)]
    qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    bp = jnp.pad(bias, [(0, 0), (0, np_ - n), (0, np_ - n)])

    qkv_spec = pl.BlockSpec((group, 1, np_, dp), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel_heads, n=n, np_=np_, g=group),
        grid=(bw // group, heads),
        in_specs=[qkv_spec, qkv_spec, qkv_spec,
                  pl.BlockSpec((1, np_, np_), lambda i, j: (j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bw, heads, np_, dp), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(qp, kp, vp, bp)
    return out[:, :, :n, :d]


def plain_window_attention_heads(q, k, v, bias):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
    s = s + bias.astype(jnp.float32)[None]
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


@jax.custom_vjp
def _fused_heads_diff(q, k, v, bias):
    return fused_window_attention_heads(q, k, v, bias)


def _fused_heads_fwd(q, k, v, bias):
    return fused_window_attention_heads(q, k, v, bias), (q, k, v, bias)


def _fused_heads_bwd(res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(plain_window_attention_heads, q, k, v, bias)
    return vjp(g)


_fused_heads_diff.defvjp(_fused_heads_fwd, _fused_heads_bwd)


def window_attention_heads(q, k, v, bias):
    """Dispatch: fused on TPU, plain elsewhere; differentiable."""
    return jax.lax.platform_dependent(
        q, k, v, bias,
        cpu=plain_window_attention_heads, default=_fused_heads_diff)


def plain_window_attention(q, k, v, bias=None):
    """XLA reference composition (the pre-kernel path) for parity tests."""
    s = jnp.einsum("bnd,bmd->bnm", q, k).astype(jnp.float32)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bnm,bmd->bnd", p, v)


@jax.custom_vjp
def _fused_diff(q, k, v, bias):
    return fused_window_attention(q, k, v, bias)


def _fused_diff_fwd(q, k, v, bias):
    return fused_window_attention(q, k, v, bias), (q, k, v, bias)


def _fused_diff_bwd(res, g):
    # windows are tiny: recomputing the plain composition for the pullback
    # costs one extra (n, n) score matrix per window, all XLA-fusable
    q, k, v, bias = res
    _, vjp = jax.vjp(plain_window_attention, q, k, v, bias)
    return vjp(g)


_fused_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)


def window_attention(q, k, v, bias=None):
    """Dispatch: fused Pallas kernel on TPU, plain composition elsewhere.

    q, k, v: (BW, N, D), q pre-scaled; optional bias (BW, N, N).
    Differentiable (plain-ops pullback)."""
    zero_bias = bias is None
    if zero_bias:
        bias = jnp.zeros((1, 1, 1), q.dtype)

    def fused(q, k, v, bias):
        return _fused_diff(q, k, v, None if zero_bias else bias)

    def plain(q, k, v, bias):
        return plain_window_attention(q, k, v, None if zero_bias else bias)

    return jax.lax.platform_dependent(q, k, v, bias, cpu=plain, default=fused)
