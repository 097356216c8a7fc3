"""Cross-shaped window (CSWin) attention with LePE, channels-last.

TPU-native implementation of the reference's LePEAttention / CSWinBlock
(/root/reference/GA/ga_cswin.py:59-212): the sequence axis is split into
full-height / full-width stripes of width `split_size`, half the heads attend
within each orientation, and a per-window depthwise 3x3 conv on V provides
the positional bias (LePE) added after attention.

Window partition is pure reshape/transpose (no gathers), so XLA lays it out
as cheap relayouts feeding batched MXU matmuls; softmax runs in fp32.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from imagenet_models_tpu.nn.layers import Dense, DropPath, GroupConvMlp, LayerNorm, Mlp, gelu, trunc_normal_init

Dtype = Any


def img2windows(x: jnp.ndarray, hs: int, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nWin, hs * ws, C), windows row-major, tokens
    row-major within a window (matches ga_cswin.py:215-222)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // hs, hs, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, hs * ws, c)


def windows2img(x: jnp.ndarray, hs: int, ws: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of img2windows: (B*nWin, hs*ws, C) -> (B, H, W, C)."""
    b = x.shape[0] // ((h // hs) * (w // ws))
    x = x.reshape(b, h // hs, w // ws, hs, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


class LePEAttention(nn.Module):
    """One stripe orientation (reference: ga_cswin.py:59-136).

    idx semantics: -1 full window (last stage), 0 -> H_sp=H (vertical
    stripes of width split), 1 -> W_sp=W (horizontal stripes).
    """

    dim: int
    num_heads: int
    idx: int
    split_size: int
    attn_drop: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, q, k, v, *, deterministic: bool = True):
        b, h, w, c = q.shape
        if self.idx == -1:
            hs, ws = h, w
        elif self.idx == 0:
            hs, ws = h, self.split_size
        else:
            hs, ws = self.split_size, w
        nh = self.num_heads
        d = c // nh
        scale = d ** -0.5

        def to_heads(t):  # (B*, n, C) -> (B*, heads, n, d)
            bn, n, _ = t.shape
            return t.reshape(bn, n, nh, d).transpose(0, 2, 1, 3)

        qw = to_heads(img2windows(q, hs, ws)) * scale
        kw = to_heads(img2windows(k, hs, ws))

        # LePE: depthwise 3x3 on V *per window* (border handling is
        # per-window, which matters for stripe windows; ga_cswin.py:95-108)
        vw_sp = img2windows(v, hs, ws).reshape(-1, hs, ws, c)
        lepe = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=c,
                       dtype=self.dtype, kernel_init=trunc_normal_init(),
                       name="get_v")(vw_sp)
        lepe = to_heads(lepe.reshape(-1, hs * ws, c))
        vw = to_heads(vw_sp.reshape(-1, hs * ws, c))

        import os

        # Default is the XLA batched path: measured A/B on v5e (ga_cswin_tiny
        # 224 eval, scripts/bench_cswin.py) gives XLA 1589 img/s vs 1137-1172
        # for the fused per-window Pallas kernel — stripe windows are 56-98
        # tokens and the per-window grid overhead + small-dot inefficiency
        # outweighs the saved score-matrix HBM traffic. IMTPU_FLASH_ATTN=1
        # opts into the kernel (ops/flash_attention.py) for re-evaluation.
        if (self.attn_drop > 0 and not deterministic) or \
                os.environ.get("IMTPU_FLASH_ATTN", "0") != "1":
            # prob-dropout needs the materialized attention matrix
            attn = jnp.einsum("bhnd,bhmd->bhnm", qw, kw)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, vw) + lepe
        else:
            from imagenet_models_tpu.ops.flash_attention import window_attention

            bw, nh_, n_, d_ = qw.shape
            flat = lambda t: t.reshape(bw * nh_, n_, d_)
            out = window_attention(flat(qw), flat(kw), flat(vw))
            out = out.reshape(bw, nh_, n_, d_) + lepe
        out = out.transpose(0, 2, 1, 3).reshape(-1, hs * ws, c)
        return windows2img(out, hs, ws, h, w)


class CSWinBlock(nn.Module):
    """reference: ga_cswin.py:139-212. Operates on (B, H, W, C)."""

    dim: int
    num_heads: int
    split_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    last_stage: bool = False
    mlp_groups: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        # `training` is positional-friendly so GA_CSWinTransformer can wrap
        # this block in nn.remat(static_argnums=(2,)) for use_chk parity
        # (ga_cswin.py:640-657 torch.utils.checkpoint per stage block).
        det = not training
        b, h, w, c = x.shape
        last = self.last_stage or (h == self.split_size)
        img = LayerNorm(dtype=self.dtype, name="norm1")(x)
        qkv = Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(img).reshape(b, h, w, 3, c)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

        if last:
            att = LePEAttention(self.dim, self.num_heads, idx=-1,
                                split_size=self.split_size, attn_drop=self.attn_drop,
                                dtype=self.dtype, name="attns_0")(
                q, k, v, deterministic=det)
        else:
            half = c // 2
            a0 = LePEAttention(self.dim // 2, self.num_heads // 2, idx=0,
                               split_size=self.split_size, attn_drop=self.attn_drop,
                               dtype=self.dtype, name="attns_0")(
                q[..., :half], k[..., :half], v[..., :half], deterministic=det)
            a1 = LePEAttention(self.dim // 2, self.num_heads // 2, idx=1,
                               split_size=self.split_size, attn_drop=self.attn_drop,
                               dtype=self.dtype, name="attns_1")(
                q[..., half:], k[..., half:], v[..., half:], deterministic=det)
            att = jnp.concatenate([a0, a1], axis=-1)

        att = Dense(self.dim, dtype=self.dtype, name="proj")(att)
        dp = DropPath(self.drop_path)
        x = x + dp(att, deterministic=det)
        n2 = LayerNorm(dtype=self.dtype, name="norm2")(x)
        if self.mlp_groups == 1:
            m = Mlp(hidden_features=int(self.dim * self.mlp_ratio), act=gelu,
                    drop=self.drop, dtype=self.dtype, name="mlp")(n2, deterministic=det)
        else:
            m = GroupConvMlp(hidden_features=int(self.dim * self.mlp_ratio), act=gelu,
                             drop=self.drop, groups=self.mlp_groups, dtype=self.dtype,
                             name="mlp")(n2, deterministic=det)
        return x + dp(m, deterministic=det)
