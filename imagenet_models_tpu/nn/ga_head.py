"""GA (Gramian Attention) head components, TPU-native.

Re-implementation of the per-branch head machinery of the ICCV'23 GA models:
CaiT-style class attention with layer-scale (reference:
/root/reference/GA/ga_convnext.py:153-248), the SE Bottleneck used as stage-5
(:251-318), and the gram utilities. All channels-last; the Gram matrix runs
as an fp32 HIGHEST-precision MXU einsum replacing the reference's
fp64-at-small-batch path (:452-467) — the global scale cancels in the L2
normalize, so only mantissa accuracy matters, and bf16x6 accumulation is
well inside fp32 tolerance.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from imagenet_models_tpu.nn.layers import (
    BatchNorm,
    Dense,
    DropPath,
    GroupConvMlp,
    LayerNorm,
    gelu,
    trunc_normal_init,
)

Dtype = Any


class ClassAttn(nn.Module):
    """Single-query class attention (reference: ga_convnext.py:153-187).

    q is computed from token 0 only; k/v over all tokens; embedding dim
    `dim_embed` projected back to `dim`.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dim_embed: int = 128
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, _ = x.shape
        e, h = self.dim_embed, self.num_heads
        d = e // h
        q = Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x[:, 0])
        q = q.reshape(b, 1, h, d).transpose(0, 2, 1, 3) * (d ** -0.5)
        k = Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="k")(x)
        k = k.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        v = Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(x)
        v = v.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhtd,bhnd->bhtn", q, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhtn,bhnd->bhtd", attn, v).transpose(0, 2, 1, 3).reshape(b, 1, e)
        out = Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class LayerScaleBlockClassAttn(nn.Module):
    """Class-attention block with layer scale
    (reference: ga_convnext.py:225-248)."""

    dim: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    mlp_block_groups: int = 2
    init_values: float = 1e-4
    dim_embed: int = 128
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, x_cls, *, deterministic: bool = True):
        gamma_1 = self.param("gamma_1", nn.initializers.constant(self.init_values),
                             (self.dim,), jnp.float32)
        gamma_2 = self.param("gamma_2", nn.initializers.constant(self.init_values),
                             (self.dim,), jnp.float32)
        u = jnp.concatenate([x_cls, x], axis=1)
        a = ClassAttn(self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                      attn_drop=self.attn_drop, proj_drop=self.drop,
                      dim_embed=self.dim_embed, dtype=self.dtype, name="attn")(
            LayerNorm(dtype=self.dtype, name="norm1")(u), deterministic=deterministic)
        dp = DropPath(self.drop_path)
        x_cls = x_cls + dp(gamma_1.astype(a.dtype) * a, deterministic=deterministic)
        m = GroupConvMlp(hidden_features=int(self.dim * self.mlp_ratio), act=gelu,
                         drop=self.drop, groups=self.mlp_block_groups, dtype=self.dtype,
                         name="mlp")(LayerNorm(dtype=self.dtype, name="norm2")(x_cls), deterministic=deterministic)
        x_cls = x_cls + dp(gamma_2.astype(m.dtype) * m, deterministic=deterministic)
        return x_cls


class SEModule(nn.Module):
    """timm SEModule as used by create_attn('se', width, rd_ratio=1/4)
    (reference: ga_convnext.py:279). MaxViT's MBConv uses the same module
    with a silu gate-act (map_maxvit.py:489-503) — select via `act`."""

    rd_channels: int
    act: Callable = nn.relu
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_channels, (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="fc1")(s)
        s = self.act(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="fc2")(s)
        return x * jax.nn.sigmoid(s)


def make_divisible(v: int, divisor: int = 8, min_value: Optional[int] = None) -> int:
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class Bottleneck(nn.Module):
    """ResNet-style SE bottleneck used as GA stage-5 over the multi-scale
    concat (reference: ga_convnext.py:251-318). The 1x1 downsample projection
    is unconditional in the reference."""

    planes: int
    outplanes: int
    drop_path: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        ura = not training
        width = self.planes

        def conv_bn(h, feats, k, name, pad=0):
            h = nn.Conv(feats, (k, k), padding=[(pad, pad), (pad, pad)], use_bias=False,
                        dtype=self.dtype, kernel_init=trunc_normal_init(), name=f"conv{name}")(h)
            return BatchNorm(dtype=self.dtype, name=f"bn{name}")(h, use_running_average=ura)

        shortcut = nn.Conv(self.outplanes, (1, 1), use_bias=True, dtype=self.dtype,
                           kernel_init=trunc_normal_init(), name="downsample_conv")(x)
        shortcut = BatchNorm(dtype=self.dtype, name="downsample_bn")(shortcut, use_running_average=ura)

        h = nn.relu(conv_bn(x, width, 1, "1"))
        h = nn.relu(conv_bn(h, width, 3, "2", pad=1))
        h = SEModule(make_divisible(width // 4), dtype=self.dtype, name="se")(h)
        h = conv_bn(h, self.outplanes, 1, "3")
        h = DropPath(self.drop_path)(h, deterministic=not training)
        return nn.relu(h + shortcut)
