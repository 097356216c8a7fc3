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

import os
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


class _DWConvParams(nn.Module):
    """Bare depthwise-3x3 conv params with nn.Conv's exact pytree
    (kernel (3,3,1,C) HWIO + bias (C,)) so the checkpoint converter and
    param paths are unchanged; callers apply them via lax.conv or hand
    them to the fused stripe kernel."""

    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", trunc_normal_init(),
                       (3, 3, 1, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k, b


class LePEAttention(nn.Module):
    """One stripe orientation (reference: ga_cswin.py:59-136).

    idx semantics: -1 full window (last stage), 0 -> H_sp=H (vertical
    stripes of width split), 1 -> W_sp=W (horizontal stripes).

    The depthwise LePE conv lives in `setup` (not compact) so CSWinBlock's
    fused two-branch path can drive the window partition / LePE / attention
    pieces separately while the param path stays `.../get_v/...`.
    """

    dim: int
    num_heads: int
    idx: int
    split_size: int
    attn_drop: float = 0.0
    dtype: Optional[Dtype] = None

    def setup(self):
        self.get_v = _DWConvParams(self.dim)
        self.attn_dropout = nn.Dropout(self.attn_drop)

    def _dw_conv(self, x):
        """nn.Conv-equivalent depthwise 3x3: params cast to the compute
        dtype, f32 MXU accumulation, bias added in the compute dtype."""
        k, b = self.get_v()
        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt), k.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.dim)
        return y + b.astype(dt)

    def geometry(self, h: int, w: int) -> Tuple[int, int]:
        if self.idx == -1:
            return h, w
        if self.idx == 0:
            return h, self.split_size
        return self.split_size, w

    def to_heads(self, t):  # (B*, n, C) -> (B*, heads, n, d)
        bn, n, _ = t.shape
        nh = self.num_heads
        return t.reshape(bn, n, nh, t.shape[-1] // nh).transpose(0, 2, 1, 3)

    def lepe_windows(self, v, heads_inner: bool = False):
        """Per-window depthwise 3x3 on V -> (B*nWin, heads, n, d) (or
        (B*nWin, n, heads, d) when heads_inner). Border handling is
        per-window, which matters for stripe windows (ga_cswin.py:95-108)."""
        b, h, w, c = v.shape
        hs, ws = self.geometry(h, w)
        vw_sp = img2windows(v, hs, ws).reshape(-1, hs, ws, c)
        lepe = self._dw_conv(vw_sp)
        if heads_inner:
            nh = self.num_heads
            return lepe.reshape(-1, hs * ws, nh, c // nh)
        return self.to_heads(lepe.reshape(-1, hs * ws, c))

    def __call__(self, q, k, v, *, deterministic: bool = True):
        b, h, w, c = q.shape
        hs, ws = self.geometry(h, w)
        nh = self.num_heads
        d = c // nh
        scale = d ** -0.5

        from imagenet_models_tpu.ops.stripe_attention import (
            stripe_attention,
            use_fused_stripe_attn,
        )

        if (self.idx == 0
                and use_fused_stripe_attn(q.shape, self.split_size,
                                          self.attn_drop, deterministic)
                and os.environ.get("IMTPU_FLASH_ATTN", "0") != "1"
                and os.environ.get("IMTPU_CSWIN_DIRECT", "0") != "1"
                and os.environ.get("IMTPU_CSWIN_INNER", "0") != "1"):
            # Partition-free fused stripe attention + LePE: zero relayouts
            # for the expensive idx=0 orientation (see ops/stripe_attention).
            k9, kb = self.get_v()
            return stripe_attention(
                q, k, v, k9.reshape(9, c).astype(jnp.float32),
                kb.reshape(1, c).astype(jnp.float32),
                ws=self.split_size, num_heads=nh, scale=scale)

        # Default is the XLA batched path: measured A/B on v5e (ga_cswin_tiny
        # 224 eval, scripts/bench_cswin.py) gives XLA 1589 img/s vs 1137-1172
        # for the fused per-window Pallas kernel — stripe windows are 56-98
        # tokens and the per-window grid overhead + small-dot inefficiency
        # outweighs the saved score-matrix HBM traffic. IMTPU_FLASH_ATTN=1
        # opts into the kernel (ops/flash_attention.py) for re-evaluation.
        if (self.attn_drop > 0 and not deterministic) or \
                os.environ.get("IMTPU_FLASH_ATTN", "0") != "1":
            if self.idx == 0 and os.environ.get("IMTPU_CSWIN_DIRECT", "0") == "1":
                # Direct-stripe einsum probe — measured MUCH SLOWER, kept as
                # a receipt: the idx=0 (vertical-stripe) partition is the one
                # genuinely expensive relayout (idx=1's img2windows
                # permutation only moves a size-1 dim), so attention is
                # expressed straight on the unpartitioned (B,H,W,C) layout
                # with two token dims per einsum side. A/B on the full
                # ga_cswin_tiny train step (v5e B=128, 2026-08-20): direct
                # 425.4 vs default 716.5 img/s — XLA materializes worse
                # relayouts inside the 7-d dots than the explicit partition.
                # Third losing formulation for the stripe layout (see also
                # IMTPU_CSWIN_INNER 710.7, IMTPU_CSWIN_FUSED 1418-vs-1589
                # eval): the partition transpose IS the efficient frontier.
                j = w // ws
                q5 = q.reshape(b, h, j, ws, nh, d) * scale
                k5 = k.reshape(b, h, j, ws, nh, d)
                v5 = v.reshape(b, h, j, ws, nh, d)
                attn = jnp.einsum("bxjyhd,bujvhd->bjhxyuv", q5, k5)
                a = attn.reshape(b, j, nh, h * ws, h * ws)
                a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(attn.dtype)
                a = self.attn_dropout(a, deterministic=deterministic)
                attn7 = a.reshape(b, j, nh, h, ws, h, ws)
                out = jnp.einsum("bjhxyuv,bujvhd->bxjyhd", attn7, v5)
                lepe = self.lepe_windows(v, heads_inner=True)  # (b*j, hs*ws, nh, d)
                lepe = lepe.reshape(b, j, h, ws, nh, d).transpose(0, 2, 1, 3, 4, 5)
                out = out + lepe
                return out.reshape(b, h, w, c)
            if os.environ.get("IMTPU_CSWIN_INNER", "0") == "1":
                # heads-inner formulation — measured FLAT here, kept opt-in:
                # unlike MaxViT's AttentionCl (+10.7%), the A/B on the full
                # ga_cswin_tiny train step (v5e B=128, 2026-08-20) gives
                # inner 710.7 vs stacked 716.5 img/s — the stripe partition
                # (img2windows) relayout dominates and XLA already folds the
                # to_heads transpose into it; moving heads inner just moves
                # the relayout into the einsum operands. (Both numbers are
                # above the 695 img/s round-2 record: the unconditional qkv
                # channel-slice split below + the scatter-free gram-triu
                # backward account for the +3%.)
                qw = img2windows(q, hs, ws)
                kw = img2windows(k, hs, ws)
                vw = img2windows(v, hs, ws)
                n = qw.shape[1]
                qh = qw.reshape(-1, n, nh, d) * scale
                kh = kw.reshape(-1, n, nh, d)
                vh = vw.reshape(-1, n, nh, d)
                lepe = self.lepe_windows(v, heads_inner=True)
                attn = jnp.einsum("bnhd,bmhd->bhnm", qh, kh)
                attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
                attn = self.attn_dropout(attn, deterministic=deterministic)
                out = jnp.einsum("bhnm,bmhd->bnhd", attn, vh) + lepe
                out = out.reshape(-1, hs * ws, c)
                return windows2img(out, hs, ws, h, w)
            # stacked (B*, heads, n, d) formulation
            qw = self.to_heads(img2windows(q, hs, ws)) * scale
            kw = self.to_heads(img2windows(k, hs, ws))
            lepe = self.lepe_windows(v)
            vw = self.to_heads(img2windows(v, hs, ws))
            attn = jnp.einsum("bhnd,bhmd->bhnm", qw, kw)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
            attn = self.attn_dropout(attn, deterministic=deterministic)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, vw) + lepe
        else:
            from imagenet_models_tpu.ops.flash_attention import window_attention

            qw = self.to_heads(img2windows(q, hs, ws)) * scale
            kw = self.to_heads(img2windows(k, hs, ws))
            lepe = self.lepe_windows(v)
            vw = self.to_heads(img2windows(v, hs, ws))
            bw, nh_, n_, d_ = qw.shape
            flat = lambda t: t.reshape(bw * nh_, n_, d_)
            out = window_attention(flat(qw), flat(kw), flat(vw))
            out = out.reshape(bw, nh_, n_, d_) + lepe
        out = out.transpose(0, 2, 1, 3).reshape(-1, hs * ws, c)
        return windows2img(out, hs, ws, h, w)


# Fused two-branch stripe attention (opt-in, measured SLOWER): when the
# feature map is square, the H-stripe and V-stripe windows have identical
# token counts and window counts, so both half-channel branches can run as
# ONE batched attention (2x the batch dim per einsum) — attention is
# permutation-equivariant over window tokens, so each branch keeps its own
# token order and is reassembled in its own orientation. Numerically
# identical to the two-call path up to fp reduction order
# (tests/test_cswin_fused.py). A/B on v5e (ga_cswin_tiny 224 eval B=256,
# scripts/bench_cswin.py, 2026-08-18, two runs each): fused 1418/1419 vs
# unfused 1589/1590 img/s — inside one jit program XLA already overlaps the
# two independent branches, and the batch-axis concats add pure HBM
# relayout traffic. Default OFF; IMTPU_CSWIN_FUSED=1 enables the probe.
_CSWIN_FUSED = os.environ.get("IMTPU_CSWIN_FUSED", "0") == "1"


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

    @staticmethod
    def _fused_branches(a0m: "LePEAttention", a1m: "LePEAttention",
                        q, k, v, half: int):
        """Both stripe orientations as ONE batched attention (see
        _CSWIN_FUSED note). Requires h == w so the two orientations share
        window count and tokens-per-window; each branch keeps its own
        token order (attention is permutation-equivariant) and is
        reassembled in its own orientation."""
        b, h, w, _ = q.shape
        g0, g1 = a0m.geometry(h, w), a1m.geometry(h, w)

        def windows(m, geom, t):  # (B*nw, heads, n, d)
            return m.to_heads(img2windows(t, *geom))

        d = half // a0m.num_heads
        scale = d ** -0.5
        qw = jnp.concatenate([windows(a0m, g0, q[..., :half]),
                              windows(a1m, g1, q[..., half:])], axis=0) * scale
        kw = jnp.concatenate([windows(a0m, g0, k[..., :half]),
                              windows(a1m, g1, k[..., half:])], axis=0)
        vw = jnp.concatenate([windows(a0m, g0, v[..., :half]),
                              windows(a1m, g1, v[..., half:])], axis=0)
        lepe = jnp.concatenate([a0m.lepe_windows(v[..., :half]),
                                a1m.lepe_windows(v[..., half:])], axis=0)

        attn = jnp.einsum("bhnd,bhmd->bhnm", qw, kw)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vw) + lepe

        bw = out.shape[0] // 2
        n = out.shape[2]
        flat = out.transpose(0, 2, 1, 3).reshape(2 * bw, n, half)
        a0 = windows2img(flat[:bw], *g0, h, w)
        a1 = windows2img(flat[bw:], *g1, h, w)
        return jnp.concatenate([a0, a1], axis=-1)

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
                    name="qkv")(img)
        # channel slices == indexing the 3-axis of reshape(..., 3, c): the
        # qkv channel order is [3, c], and slicing avoids the strided
        # mid-dim copies XLA emits for the (b,h,w,3,c) index
        q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]

        if last:
            att = LePEAttention(self.dim, self.num_heads, idx=-1,
                                split_size=self.split_size, attn_drop=self.attn_drop,
                                dtype=self.dtype, name="attns_0")(
                q, k, v, deterministic=det)
        else:
            half = c // 2
            a0m = LePEAttention(self.dim // 2, self.num_heads // 2, idx=0,
                                split_size=self.split_size, attn_drop=self.attn_drop,
                                dtype=self.dtype, name="attns_0")
            a1m = LePEAttention(self.dim // 2, self.num_heads // 2, idx=1,
                                split_size=self.split_size, attn_drop=self.attn_drop,
                                dtype=self.dtype, name="attns_1")
            fuse = (_CSWIN_FUSED and h == w
                    and (det or self.attn_drop == 0.0)
                    and os.environ.get("IMTPU_FLASH_ATTN", "0") != "1")
            if fuse:
                att = self._fused_branches(a0m, a1m, q, k, v, half)
            else:
                a0 = a0m(q[..., :half], k[..., :half], v[..., :half],
                         deterministic=det)
                a1 = a1m(q[..., half:], k[..., half:], v[..., half:],
                         deterministic=det)
                att = jnp.concatenate([a0, a1], axis=-1)

        att = Dense(self.dim, dtype=self.dtype, name="proj")(att)
        dp = DropPath(self.drop_path)
        x = x + dp(att, deterministic=det)
        hidden = int(self.dim * self.mlp_ratio)
        from imagenet_models_tpu.ops.convnext_block import (
            ln_mlp_apply,
            use_transformer_lnmlp,
        )

        if self.mlp_groups == 1 and use_transformer_lnmlp(self.drop, det):
            from imagenet_models_tpu.nn.param_holder import MlpParams, ParamHolder

            norm = ParamHolder([("scale", (self.dim,), nn.initializers.ones_init()),
                                ("bias", (self.dim,), nn.initializers.zeros_init())],
                               name="norm2")()
            fc1, fc2 = MlpParams(self.dim, hidden, trunc_normal_init(),
                                 name="mlp")()
            xc = x if self.dtype is None else x.astype(self.dtype)
            m = ln_mlp_apply(xc, norm["scale"], norm["bias"],
                             fc1["kernel"], fc1["bias"],
                             fc2["kernel"], fc2["bias"],
                             eps=1e-6, training=not det).astype(x.dtype)
            return x + dp(m, deterministic=det)
        n2 = LayerNorm(dtype=self.dtype, name="norm2")(x)
        if self.mlp_groups == 1:
            m = Mlp(hidden_features=hidden, act=gelu,
                    drop=self.drop, dtype=self.dtype, name="mlp")(n2, deterministic=det)
        else:
            m = GroupConvMlp(hidden_features=hidden, act=gelu,
                             drop=self.drop, groups=self.mlp_groups, dtype=self.dtype,
                             name="mlp")(n2, deterministic=det)
        return x + dp(m, deterministic=det)
