"""ConvNeXt backbone + MAP integration (TPU-native, NHWC).

Re-implements the behaviour of /root/reference/MAP/models/map_convnext.py
(FB ConvNeXt with a 5-level feature pyramid and `global_pool='mmcap'`
swapping GAP+FC for the MAPHead, lines 43-142) as Flax modules. The torch
version permutes NCHW<->NHWC around every block; here everything is NHWC
end-to-end, which is the layout XLA:TPU wants, so the block body is
dwconv7x7 -> LayerNorm -> Dense x2 with no data movement.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from imagenet_models_tpu.ckpt.pretrained import register_torch_rules
from imagenet_models_tpu.ckpt.torch_convert import MAP_HEAD_RULES
from imagenet_models_tpu.core.registry import register_default_cfg, register_model
from imagenet_models_tpu.nn.heads import MAPHead
from imagenet_models_tpu.nn.layers import (
    Dense,
    DropPath,
    LayerNorm,
    gelu,
    trunc_normal_init,
)

Dtype = Any


def _scaled_trunc_normal(scale: float):
    base = trunc_normal_init()
    if scale == 1.0:
        return base

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class ConvNeXtBlock(nn.Module):
    """dw7x7 conv -> LN -> pw Dense(4x) -> GELU -> pw Dense -> layer-scale ->
    drop-path + residual (reference: map_convnext.py:14-40).

    The branch body runs as ONE fused Pallas kernel on TPU
    (ops/convnext_block.py); the param tree matches the unfused layout, so
    checkpoints are unaffected."""

    dim: int
    drop_path: float = 0.0
    ls_init_value: float = 1e-6
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        from imagenet_models_tpu.nn.param_holder import ParamHolder
        from imagenet_models_tpu.ops.convnext_block import convnext_block_apply

        c = self.dim
        zeros, ones = nn.initializers.zeros_init(), nn.initializers.ones_init()
        dw = ParamHolder([("kernel", (7, 7, 1, c), trunc_normal_init()),
                          ("bias", (c,), zeros)], name="dwconv")()
        norm = ParamHolder([("scale", (c,), ones), ("bias", (c,), zeros)], name="norm")()
        pw1 = ParamHolder([("kernel", (c, 4 * c), trunc_normal_init()),
                           ("bias", (4 * c,), zeros)], name="pwconv1")()
        pw2 = ParamHolder([("kernel", (4 * c, c), trunc_normal_init()),
                           ("bias", (c,), zeros)], name="pwconv2")()
        if self.ls_init_value > 0:
            gamma = self.param("gamma", nn.initializers.constant(self.ls_init_value),
                               (c,), jnp.float32)
        else:
            gamma = None
        xc = x if self.dtype is None else x.astype(self.dtype)
        # Pallas fusion both ways: fused forward + fused backward (dx and
        # in-kernel weight-grad accumulation, ops/convnext_block.py)
        branch = convnext_block_apply(
            xc, dw["kernel"], dw["bias"], norm["scale"], norm["bias"],
            pw1["kernel"], pw1["bias"], pw2["kernel"], pw2["bias"], gamma,
            training=training)
        branch = DropPath(self.drop_path)(branch, deterministic=not training)
        return x + branch.astype(x.dtype)


class ConvNeXt(nn.Module):
    """ConvNeXt with optional MAP head (reference: map_convnext.py:43-142)."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    ls_init_value: float = 1e-6
    head_init_scale: float = 1.0
    global_pool: str = "avg"  # avg | mmcap
    # MAP head config (only used when global_pool == 'mmcap')
    last_dim: int = 384
    n_groups: int = 4
    n_tokens: int = 3
    gram_group: int = 8
    bp_dim: int = 192
    bp_groups: int = 1
    gram_dim: Optional[int] = None
    ca_dim: int = 128
    num_heads: int = 8
    gram: bool = True
    split_norm: bool = False
    self_distill_token: bool = True
    distill_tokens: int = 0
    drop_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False, pre_logits: bool = False):
        dp_rates = np.linspace(0, self.drop_path_rate, sum(self.depths))
        features = []
        cur = 0
        for i in range(4):
            if i == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                            kernel_init=trunc_normal_init(), name="downsample_layers_0_conv")(x)
                x = LayerNorm(dtype=self.dtype, name="downsample_layers_0_norm")(x)
                features.append(x)
            else:
                x = LayerNorm(dtype=self.dtype, name=f"downsample_layers_{i}_norm")(x)
                x = nn.Conv(self.dims[i], (2, 2), strides=(2, 2), dtype=self.dtype,
                            kernel_init=trunc_normal_init(), name=f"downsample_layers_{i}_conv")(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(self.dims[i], drop_path=float(dp_rates[cur + j]),
                                  ls_init_value=self.ls_init_value, dtype=self.dtype,
                                  name=f"stages_{i}_blocks_{j}")(x, training=training)
            cur += self.depths[i]
            features.append(x)

        if self.global_pool == "mmcap":
            head = MAPHead(
                multi_scale_level=3, channels=[self.dims[0]] + list(self.dims),
                last_dim=self.last_dim, n_tokens=self.n_tokens, n_groups=self.n_groups,
                self_distill_token=self.self_distill_token,
                distill_tokens=self.distill_tokens, mlp_ratio=4, mlp_groups=2,
                head_fn="split_norm" if self.split_norm else "norm", fc_drop=0.0,
                num_classes=self.num_classes, non_linearity=gelu, gram=self.gram,
                bp_dim=self.bp_dim, bp_groups=self.bp_groups, gram_group=self.gram_group,
                gram_dim=self.gram_dim, ca_dim=self.ca_dim, num_heads=self.num_heads,
                dtype=self.dtype, name="head",
            )
            return head(features, training=training, pre_logits=pre_logits)
        x = jnp.mean(x, axis=(1, 2))
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=not training)
        # head_init_scale: the reference multiplies head weight AND bias after
        # init (map_convnext.py:91-93); scaling the init is equivalent
        s = self.head_init_scale
        return Dense(self.num_classes, dtype=self.dtype,
                     kernel_init=_scaled_trunc_normal(s),
                     bias_init=nn.initializers.zeros_init(), name="head")(x)


CONVNEXT_RULES = [
    (r"downsample_layers\.(\d+)\.0$", r"downsample_layers_\1_" + "conv_or_norm0"),
    (r"downsample_layers\.(\d+)\.1$", r"downsample_layers_\1_" + "conv_or_norm1"),
    # stem: .0 = conv, .1 = norm; later downsamples: .0 = norm, .1 = conv
    (r"downsample_layers_0_conv_or_norm0", "downsample_layers_0_conv"),
    (r"downsample_layers_0_conv_or_norm1", "downsample_layers_0_norm"),
    (r"downsample_layers_(\d+)_conv_or_norm0", r"downsample_layers_\1_norm"),
    (r"downsample_layers_(\d+)_conv_or_norm1", r"downsample_layers_\1_conv"),
    (r"stages\.(\d+)\.(\d+)\.", r"stages_\1_blocks_\2."),
] + MAP_HEAD_RULES

register_torch_rules("convnext_*", CONVNEXT_RULES, drop=[r"bp_index$"])
register_torch_rules("map_convnext_*", CONVNEXT_RULES, drop=[r"bp_index$"])


@register_model
def convnext_tiny(**kwargs):
    """reference: map_convnext.py:186-195"""
    kwargs.pop("in_22k", None)
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), **kwargs)


@register_model
def convnext_small(**kwargs):
    """reference: map_convnext.py:214-223"""
    kwargs.pop("in_22k", None)
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768), **kwargs)


@register_model
def map_convnext_tiny(**kwargs):
    """reference: map_convnext.py:198-211"""
    kwargs.pop("in_22k", None)
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), global_pool="mmcap",
                    last_dim=384, n_groups=4, n_tokens=2, gram_group=24,
                    bp_dim=384, ca_dim=384, num_heads=12, **kwargs)


@register_model
def map_convnext_small(**kwargs):
    """reference: map_convnext.py:226-239"""
    kwargs.pop("in_22k", None)
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768), global_pool="mmcap",
                    last_dim=384, n_groups=4, n_tokens=3, gram_group=16,
                    bp_dim=384, ca_dim=384, num_heads=12, **kwargs)


for _n in ("convnext_tiny", "convnext_small", "map_convnext_tiny", "map_convnext_small"):
    register_default_cfg(_n, {"crop_pct": 0.875, "interpolation": "bicubic"})
