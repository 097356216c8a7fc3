"""Standard ViT transformer block (timm-compatible semantics, channels-last).

Matches timm's `vision_transformer.Block` as consumed by the reference PiT
(/root/reference/MAP/models/map_pit.py:34-45): pre-LN, fused-qkv MHSA,
GELU MLP, per-branch drop-path. Attention math runs softmax in fp32.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from imagenet_models_tpu.nn.layers import (
    Dense,
    DropPath,
    LayerNorm,
    Mlp,
    gelu,
    trunc_normal_init,
)

Dtype = Any


class Attention(nn.Module):
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, c = x.shape
        h = self.num_heads
        d = self.dim // h
        qkv = Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        # channel-slice split (channel order is [3, heads, d], so a last-dim
        # slice IS the 3-axis index) with heads kept as an inner dim: avoids
        # materializing the (3, B, h, n, d) relayout and the output
        # transpose — same win as ops/window_attention.AttentionCl (+10.7%
        # on the maxvit train step; receipts there)
        q = qkv[..., :self.dim].reshape(b, n, h, d)
        k = qkv[..., self.dim:2 * self.dim].reshape(b, n, h, d)
        v = qkv[..., 2 * self.dim:].reshape(b, n, h, d)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (d ** -0.5), k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        out = Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attn_drop: float = 0.0
    drop: float = 0.0
    drop_path: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        dp = DropPath(self.drop_path)
        a = Attention(self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                      attn_drop=self.attn_drop, proj_drop=self.drop, dtype=self.dtype,
                      name="attn")(LayerNorm(dtype=self.dtype, name="norm1")(x), deterministic=deterministic)
        x = x + dp(a, deterministic=deterministic)
        hidden = int(self.dim * self.mlp_ratio)
        from imagenet_models_tpu.ops.convnext_block import (
            ln_mlp_apply,
            use_transformer_lnmlp,
        )

        if use_transformer_lnmlp(self.drop, deterministic):
            from imagenet_models_tpu.nn.param_holder import MlpParams, ParamHolder

            c = self.dim
            norm = ParamHolder([("scale", (c,), nn.initializers.ones_init()),
                                ("bias", (c,), nn.initializers.zeros_init())],
                               name="norm2")()
            fc1, fc2 = MlpParams(c, hidden, trunc_normal_init(), name="mlp")()
            xc = x if self.dtype is None else x.astype(self.dtype)
            m = ln_mlp_apply(xc, norm["scale"], norm["bias"],
                             fc1["kernel"], fc1["bias"],
                             fc2["kernel"], fc2["bias"],
                             eps=1e-6, training=not deterministic).astype(x.dtype)
        else:
            m = Mlp(hidden_features=hidden, act=gelu, drop=self.drop,
                    dtype=self.dtype, name="mlp")(
                LayerNorm(dtype=self.dtype, name="norm2")(x),
                deterministic=deterministic)
        return x + dp(m, deterministic=deterministic)
