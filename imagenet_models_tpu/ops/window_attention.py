"""Block-window / dilated-grid attention (MaxViT-style), channels-last.

Rebuild of the reference's vendored timm maxxvit attention machinery
(/root/reference/MAP/models/map_maxvit.py:182-251 AttentionCl, :611-644
window/grid partition, :647-655 rel-pos classes). Partitions are pure
reshape/transposes; attention is batched over windows on the MXU with fp32
softmax; the TF-style relative position bias table matches timm RelPosBiasTf
(tf_ checkpoints use it; table shape (heads, 2H-1, 2W-1), zero-init).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from imagenet_models_tpu.nn.layers import Dense

Dtype = Any


def window_partition(x: jnp.ndarray, ws: Tuple[int, int]) -> jnp.ndarray:
    """Contiguous blocks: (B,H,W,C) -> (B*nW, wh, ww, C)
    (map_maxvit.py:611-617)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws[0], ws[0], w // ws[1], ws[1], c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws[0], ws[1], c)


def window_reverse(x: jnp.ndarray, ws: Tuple[int, int], hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = hw
    c = x.shape[-1]
    x = x.reshape(-1, h // ws[0], w // ws[1], ws[0], ws[1], c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, h, w, c)


def grid_partition(x: jnp.ndarray, gs: Tuple[int, int]) -> jnp.ndarray:
    """Dilated grid: (B,H,W,C) -> (B*nW, gh, gw, C) with stride H/gh
    (map_maxvit.py:629-635)."""
    b, h, w, c = x.shape
    x = x.reshape(b, gs[0], h // gs[0], gs[1], w // gs[1], c)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(-1, gs[0], gs[1], c)


def grid_reverse(x: jnp.ndarray, gs: Tuple[int, int], hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = hw
    c = x.shape[-1]
    x = x.reshape(-1, h // gs[0], w // gs[1], gs[0], gs[1], c)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(-1, h, w, c)


def _rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """Standard relative position index: (area, area) into a (2wh-1)*(2ww-1)
    table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)  # (area, area, 2)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (area, area)


def _use_matmul_relpos() -> bool:
    # Resolve the rel-pos table via a constant one-hot matmul instead of
    # gather: fwd gather (heads, area^2) becomes an MXU (area^2, table) x
    # (table, heads) dot, and — the real point — the BACKWARD scatter-add
    # into the table becomes a transposed matmul (TPU scatters serialize).
    # Opt-in until measured on the full train step (IMTPU_RELPOS_MATMUL=1).
    return os.environ.get("IMTPU_RELPOS_MATMUL", "") == "1"


def _onehot_index(idx: np.ndarray, n_table: int) -> np.ndarray:
    """(area, area) index map -> (area*area, n_table) one-hot selector."""
    flat = idx.reshape(-1)
    sel = np.zeros((flat.size, n_table), np.float32)
    sel[np.arange(flat.size), flat] = 1.0
    return sel


class RelPosBiasTf(nn.Module):
    """timm RelPosBiasTf: zero-init table of shape (heads, 2H-1, 2W-1)."""

    window_size: Tuple[int, int]
    num_heads: int

    @nn.compact
    def __call__(self):
        wh, ww = self.window_size
        table = self.param("relative_position_bias_table", nn.initializers.zeros_init(),
                           (self.num_heads, 2 * wh - 1, 2 * ww - 1), jnp.float32)
        idx = _rel_pos_index(wh, ww)
        flat = table.reshape(self.num_heads, -1)
        if _use_matmul_relpos():
            sel = jnp.asarray(_onehot_index(idx, flat.shape[-1]))
            bias = jax.lax.dot_general(  # (area^2, T) x (heads, T) -> contract T
                sel, flat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return bias.T.reshape(self.num_heads, wh * ww, wh * ww)
        bias = flat[:, idx.reshape(-1)].reshape(self.num_heads, wh * ww, wh * ww)
        return bias


class RelPosBias(nn.Module):
    """timm RelPosBias: trunc-normal table ((2H-1)*(2W-1)+extra, heads)."""

    window_size: Tuple[int, int]
    num_heads: int

    @nn.compact
    def __call__(self):
        wh, ww = self.window_size
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * wh - 1) * (2 * ww - 1), self.num_heads), jnp.float32)
        idx = _rel_pos_index(wh, ww)
        bias = table[idx.reshape(-1)].reshape(wh * ww, wh * ww, self.num_heads)
        return bias.transpose(2, 0, 1)


def use_fused_partition_attn(x_shape, ps, part_type: str, attn_drop: float,
                             deterministic: bool) -> bool:
    """Gate for the partition-free packed Pallas attention
    (ops/partition_attention.py): on by default for both partition types
    (CPU falls back to the plain twin via platform dispatch inside the op);
    IMTPU_PART_ATTN=xla restores the partition->AttentionCl->reverse
    composition, =block fuses block windows only. Softmax dropout would
    need in-kernel RNG; a single-window image (stage 3) has a metadata-only
    partition XLA already elides; oversized strips would blow the VMEM
    block — those route to the XLA path."""
    mode = os.environ.get("IMTPU_PART_ATTN", "fused")
    if mode == "xla":
        return False
    if mode == "block" and part_type != "block":
        return False  # A/B attribution knob: fuse block windows only
    if attn_drop > 0 and not deterministic:
        return False
    if deterministic and mode != "all":
        # Mode-gated by measurement (map_maxvit_tiny_tf_224 B=128,
        # 2026-08-21): the kernel wins the TRAIN step 552.5 vs 502.6 img/s
        # (+9.9% — the bwd relayouts it deletes dominate) but loses the
        # fwd-only eval 1328.7 vs 1359.2 (-2.2%): eval's partition copies
        # fuse into the surrounding fwd graph more cheaply than the
        # kernel's per-window gathers. IMTPU_PART_ATTN=all forces fused in
        # both modes.
        return False
    h, w, c = x_shape[1], x_shape[2], x_shape[3]
    if h % ps[0] or w % ps[1] or (h == ps[0] and w == ps[1]):
        return False
    return ps[0] * w * 3 * c * 2 <= (4 << 20)


class AttentionCl(nn.Module):
    """Channels-last MHSA over the trailing token grid, optional rel-pos bias
    (map_maxvit.py:182-251). `head_first=False` layout semantics are only
    relevant to the torch qkv weight ordering; we reshape identically so the
    converter is a plain transpose.

    With `partition` set ("block"|"grid", (th, tw)), x is the UNPARTITIONED
    (B, H, W, C) map and the window partition + attention + reverse run as
    one fused Pallas op (the per-token qkv/proj projections commute with the
    partition, so applying them unpartitioned is the same math — parity:
    tests/test_partition_attention.py)."""

    dim: int
    dim_out: Optional[int] = None
    dim_head: int = 32
    bias: bool = True
    rel_pos_type: Optional[str] = None  # None | 'bias' | 'bias_tf'
    window_size: Optional[Tuple[int, int]] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    partition: Optional[Tuple[str, Tuple[int, int]]] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        dim_out = self.dim_out or self.dim
        dim_attn = dim_out if dim_out > self.dim else self.dim
        nh = dim_attn // self.dim_head
        d = self.dim_head
        lead = x.shape[:-1]
        b = x.shape[0]
        n = int(np.prod(lead[1:]))

        qkv = Dense(dim_attn * 3, use_bias=self.bias, dtype=self.dtype, name="qkv")(x)

        import os

        bias = None
        if self.rel_pos_type == "bias_tf":
            bias = RelPosBiasTf(self.window_size, nh, name="rel_pos")()
        elif self.rel_pos_type == "bias":
            bias = RelPosBias(self.window_size, nh, name="rel_pos")()

        if self.partition is not None:
            from imagenet_models_tpu.ops.partition_attention import (
                partition_attention,
            )

            part_type, ps = self.partition
            if bias is None:
                bias = jnp.zeros((nh, ps[0] * ps[1], ps[0] * ps[1]),
                                 jnp.float32)
            # pre-scale q through the qkv output (fuses into the Dense)
            scale = jnp.concatenate([
                jnp.full((dim_attn,), d ** -0.5, jnp.float32),
                jnp.ones((2 * dim_attn,), jnp.float32)])
            out = partition_attention(qkv * scale.astype(qkv.dtype), bias,
                                      part_type=part_type, ps=ps,
                                      num_heads=nh)
            out = Dense(dim_out, use_bias=self.bias, dtype=self.dtype,
                        name="proj")(out)
            return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)

        if os.environ.get("IMTPU_QKV_SPLIT", "slice") == "slice" and \
                not os.environ.get("IMTPU_FLASH_ATTN", "0") == "1":
            # Channel-slice formulation — THE DEFAULT: identical math to the
            # stacked (3, B, heads, N, d) split (head_first=False channel
            # order is [3, heads, d], so a last-dim slice IS the 3-axis
            # index), but without materializing the 5-d qkv transpose or the
            # (B, heads, N, d) -> (B, N, heads*d) output transpose. The
            # map_maxvit_tiny_tf_224 train step profile charged ~8ms/step of
            # (4096,49,3,2,32) relayout copies to the stacked split; A/B on
            # the full train step (v5e, B=64, 2026-08-20): slice 427.8 vs
            # stack 386.6 img/s (+10.7%). IMTPU_QKV_SPLIT=stack restores the
            # old path. (IMTPU_RELPOS_MATMUL=1 measured flat, 390.9 — the
            # table scatter is NOT a bottleneck; kept opt-in.)
            c = dim_attn
            qkv = qkv.reshape(b, n, 3 * c)
            q = qkv[..., :c].reshape(b, n, nh, d)
            k = qkv[..., c:2 * c].reshape(b, n, nh, d)
            v = qkv[..., 2 * c:].reshape(b, n, nh, d)
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * (d ** -0.5), k)
            if bias is not None:
                attn = attn + bias.astype(attn.dtype)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(*lead, dim_attn)
            out = Dense(dim_out, use_bias=self.bias, dtype=self.dtype, name="proj")(out)
            return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)

        # head_first=False ordering: (..., 3, heads, dim_head)
        qkv = qkv.reshape(b, n, 3, nh, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # opt-in only: XLA's batched attention measured faster at these
        # window sizes (see ops/cswin_attention.py for the recorded A/B)
        use_flash = not (self.attn_drop > 0 and not deterministic) and \
            os.environ.get("IMTPU_FLASH_ATTN", "0") == "1"
        if use_flash:
            from imagenet_models_tpu.ops.flash_attention import (
                window_attention,
                window_attention_heads,
            )

            qs = (q * (d ** -0.5)).astype(q.dtype)
            if bias is not None:
                # per-head shared rel-pos bias fused in-kernel (never
                # broadcast to the window batch in HBM)
                out = window_attention_heads(qs, k, v, bias.astype(jnp.float32))
            else:
                flat = lambda t: t.reshape(b * nh, n, d)
                out = window_attention(flat(qs), flat(k), flat(v))
                out = out.reshape(b, nh, n, d)
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * (d ** -0.5), k)
            if bias is not None:
                attn = attn + bias.astype(attn.dtype)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(*lead, dim_attn)
        out = Dense(dim_out, use_bias=self.bias, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
