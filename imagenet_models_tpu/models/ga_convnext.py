"""GA-ConvNeXt: 5-stage ConvNeXt with Gramian-Attention branch heads.

TPU-native rebuild of /root/reference/GA/ga_convnext.py (GA_ConvNeXt,
lines 320-505): 4 standard ConvNeXt stages, a multi-scale concat (stages 1/2
avg-pooled to the stage-3 grid, two stage-3 intermediate taps, stage-4
bilinearly upsampled 2x, :469-485), an SE-Bottleneck stage-5 (:376), and
`branches` parallel gram-seeded class-attention heads (:487-505).

Registry note: the reference README trains `ga_convnext_tiny` but only
registers width-suffixed names (:572-613); we register both, aliasing the
plain names to the _768/_1024 variants (SURVEY §2 gap resolution).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from imagenet_models_tpu.ckpt.pretrained import register_torch_rules
from imagenet_models_tpu.core.registry import register_default_cfg, register_model
from imagenet_models_tpu.nn.ga_head import Bottleneck, LayerScaleBlockClassAttn
from imagenet_models_tpu.nn.heads import gram_triu_normalize
from imagenet_models_tpu.nn.layers import (
    BatchNorm,
    Dense,
    DropPath,
    GroupedDense,
    LayerNorm,
    Mlp,
    adaptive_avg_pool,
    gelu,
    resize_bilinear,
    trunc_normal_init,
)

Dtype = Any


class GABlock(nn.Module):
    """timm-style ConvNeXt block: conv_dw -> LN -> Mlp(GELU) -> layer scale ->
    drop-path + residual (reference: ga_convnext.py:70-112)."""

    dim: int
    drop_path: float = 0.0
    ls_init_value: float = 1e-6
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        from imagenet_models_tpu.nn.param_holder import MlpParams, ParamHolder
        from imagenet_models_tpu.ops.convnext_block import convnext_block_apply

        c = self.dim
        zeros, ones = nn.initializers.zeros_init(), nn.initializers.ones_init()
        dw = ParamHolder([("kernel", (7, 7, 1, c), trunc_normal_init()),
                          ("bias", (c,), zeros)], name="conv_dw")()
        norm = ParamHolder([("scale", (c,), ones), ("bias", (c,), zeros)], name="norm")()
        fc1, fc2 = MlpParams(c, 4 * c, trunc_normal_init(), name="mlp")()
        gamma = self.param("gamma", nn.initializers.constant(self.ls_init_value),
                           (c,), jnp.float32) if self.ls_init_value > 0 else None
        xc = x if self.dtype is None else x.astype(self.dtype)
        branch = convnext_block_apply(
            xc, dw["kernel"], dw["bias"], norm["scale"], norm["bias"],
            fc1["kernel"], fc1["bias"], fc2["kernel"], fc2["bias"], gamma,
            training=training)
        branch = DropPath(self.drop_path)(branch, deterministic=not training)
        return x + branch.astype(x.dtype)


class GAStage(nn.Module):
    """ConvNeXt stage with optional downsample and stage-3 intermediate taps
    (reference: ga_convnext.py:115-150). When depth > 5, emits `stage3_naggre`
    intermediate block outputs at uniform intervals."""

    in_chs: int
    out_chs: int
    stride: int = 2
    depth: int = 2
    dp_rates: Optional[Sequence[float]] = None
    ls_init_value: float = 1e-6
    stage3_naggre: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        if self.in_chs != self.out_chs or self.stride > 1:
            x = LayerNorm(dtype=self.dtype, name="downsample_norm")(x)
            x = nn.Conv(self.out_chs, (self.stride, self.stride), strides=(self.stride, self.stride),
                        dtype=self.dtype, kernel_init=trunc_normal_init(), name="downsample_conv")(x)
        dp = self.dp_rates or [0.0] * self.depth
        taps = []
        interval = self.depth // (self.stage3_naggre + 1) if self.depth > 5 else 0
        for j in range(self.depth):
            x = GABlock(self.out_chs, drop_path=float(dp[j]), ls_init_value=self.ls_init_value,
                        dtype=self.dtype, name=f"blocks_{j}")(x, training=training)
            if interval and (j + 1) % interval == 0 and len(taps) < self.stage3_naggre:
                taps.append(x)
        if self.depth > 5:
            return x, taps
        return x


class GA_ConvNeXt(nn.Module):
    """reference: ga_convnext.py:320-505."""

    depths: Sequence[int] = (3, 3, 9, 3, 1)
    dims: Sequence[int] = (96, 192, 384, 768, 768)
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    ls_init_value: float = 1e-6
    branches: int = 5
    gram_embedding_groups: int = 8
    dim_embed: int = 128
    stage3_naggre: int = 2
    gram_dim: int = 192
    gram_layer: bool = True
    drop_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        dims, depths = self.dims, self.depths
        splits = np.split(np.linspace(0, self.drop_path_rate, sum(depths)),
                          np.cumsum(depths)[:-1])

        x = nn.Conv(dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="stem_conv")(x)
        x = LayerNorm(dtype=self.dtype, name="stem_norm")(x)

        x_cat, taps = [], []
        prev = dims[0]
        for i in range(4):
            stage = GAStage(prev, dims[i], stride=1 if i == 0 else 2, depth=depths[i],
                            dp_rates=list(splits[i]), ls_init_value=self.ls_init_value,
                            stage3_naggre=self.stage3_naggre, dtype=self.dtype,
                            name=f"stages_{i}")
            out = stage(x, training=training)
            if isinstance(out, tuple):
                x, taps = out
            else:
                x = out
            x_cat.append(x)
            prev = dims[i]

        # multi-scale concat on the stage-3 grid (ga_convnext.py:479-483)
        hw = x_cat[2].shape[1:3]
        parts = [adaptive_avg_pool(x_cat[0], hw), adaptive_avg_pool(x_cat[1], hw)]
        parts += taps
        parts += [x_cat[2], resize_bilinear(x_cat[3], hw)]
        x = jnp.concatenate(parts, axis=-1)

        x = Bottleneck(planes=dims[4] // 4, outplanes=dims[4], drop_path=self.drop_path_rate,
                       dtype=self.dtype, name="stage4")(x, training=training)

        b, h, w, c = x.shape
        img_tokens = x.reshape(b, h * w, c)
        ura = not training

        outs = []
        for k in range(self.branches):
            g = nn.Conv(self.gram_dim, (1, 1), use_bias=True, dtype=self.dtype,
                        kernel_init=trunc_normal_init(), name=f"gram_contraction_{k}_conv")(x)
            g = BatchNorm(dtype=self.dtype, name=f"gram_contraction_{k}_bn")(g, use_running_average=ura)
            if self.gram_layer:
                g = GAStage(self.gram_dim, self.gram_dim, stride=1, depth=1,
                            dp_rates=list(splits[-1]), ls_init_value=self.ls_init_value,
                            dtype=self.dtype, name=f"gram_layer_{k}")(g, training=training)
            # gram: x/H then bmm/(HW) (ga_convnext.py:452-460); global scale
            # cancels in the L2 normalize inside gram_triu_normalize.
            gt = g.reshape(b, h * w, self.gram_dim)
            gv = gram_triu_normalize(gt, scale=1.0 / h)
            gv = GroupedDense(dims[4], groups=self.gram_embedding_groups, use_bias=True,
                              dtype=self.dtype, name=f"gram_embedding_{k}")(gv)
            gv = BatchNorm(dtype=self.dtype, name=f"gram_embedding_{k}_bn")(gv, use_running_average=ura)
            token = gv.reshape(b, 1, dims[4]).astype(x.dtype)

            token = LayerScaleBlockClassAttn(
                dims[4], num_heads=8, mlp_block_groups=4, dim_embed=self.dim_embed,
                dtype=self.dtype, name=f"ga_{k}")(img_tokens, token, deterministic=ura)
            outs.append(Dense(self.num_classes, dtype=self.dtype, name=f"fc_{k}")(token[:, 0]))
        return tuple(outs)


GA_CONVNEXT_RULES = [
    (r"^stem\.0$", "stem_conv"),
    (r"^stem\.1$", "stem_norm"),
    # stage-5 bottleneck
    (r"^stages\.4\.downsample\.0$", "stage4.downsample_conv"),
    (r"^stages\.4\.downsample\.1$", "stage4.downsample_bn"),
    (r"^stages\.4\.", "stage4."),
    (r"^stages\.(\d)\.downsample\.0$", r"stages_\1.downsample_norm"),
    (r"^stages\.(\d)\.downsample\.1$", r"stages_\1.downsample_conv"),
    (r"^stages\.(\d)\.blocks\.(\d+)\.", r"stages_\1.blocks_\2."),
    (r"^gram_contraction\.(\d+)\.0$", r"gram_contraction_\1_conv"),
    (r"^gram_contraction\.(\d+)\.1$", r"gram_contraction_\1_bn"),
    (r"^gram_layer\.(\d+)\.blocks\.(\d+)\.", r"gram_layer_\1.blocks_\2."),
    (r"^gram_embedding\.(\d+)\.0$", r"gram_embedding_\1"),
    (r"^gram_embedding\.(\d+)\.1$", r"gram_embedding_\1_bn"),
    (r"^ga\.(\d+)\.", r"ga_\1."),
    (r"^fc\.(\d+)$", r"fc_\1"),
]

register_torch_rules("ga_convnext_*", GA_CONVNEXT_RULES)


def _factory(depths, dims, dim_embed, stage3_naggre, **kwargs):
    kwargs.pop("in_22k", None)
    return GA_ConvNeXt(depths=depths, dims=dims, dim_embed=dim_embed,
                       stage3_naggre=stage3_naggre, gram_dim=192,
                       gram_embedding_groups=8, **kwargs)


@register_model
def ga_convnext_tiny_688(**kwargs):
    """reference: ga_convnext.py:572-576"""
    return _factory((3, 3, 9, 3, 1), (96, 192, 384, 688, 688), 168, 2, **kwargs)


@register_model
def ga_convnext_tiny_768(**kwargs):
    """reference: ga_convnext.py:578-583"""
    return _factory((3, 3, 9, 3, 1), (96, 192, 384, 768, 768), 192, 2, **kwargs)


@register_model
def ga_convnext_small_688(**kwargs):
    """reference: ga_convnext.py:585-590"""
    return _factory((3, 3, 27, 3, 1), (96, 192, 384, 688, 688), 168, 4, **kwargs)


@register_model
def ga_convnext_small_768(**kwargs):
    """reference: ga_convnext.py:592-597"""
    return _factory((3, 3, 27, 3, 1), (96, 192, 384, 768, 768), 192, 4, **kwargs)


@register_model
def ga_convnext_base_976(**kwargs):
    """reference: ga_convnext.py:599-605"""
    return _factory((3, 3, 27, 3, 1), (128, 256, 512, 976, 976), 240, 4, **kwargs)


@register_model
def ga_convnext_base_1024(**kwargs):
    """reference: ga_convnext.py:607-613"""
    return _factory((3, 3, 27, 3, 1), (128, 256, 512, 1024, 1024), 256, 4, **kwargs)


@register_model
def ga_convnext_tiny(**kwargs):
    """Alias for the README training command (GA/README.md:29) — see module
    docstring for the registry-gap resolution."""
    return ga_convnext_tiny_768(**kwargs)


@register_model
def ga_convnext_small(**kwargs):
    return ga_convnext_small_768(**kwargs)


@register_model
def ga_convnext_base(**kwargs):
    return ga_convnext_base_1024(**kwargs)


for _n in ("ga_convnext_tiny", "ga_convnext_small", "ga_convnext_base"):
    for _suffix in ("", "_688", "_768", "_976", "_1024"):
        register_default_cfg(_n + _suffix, {"crop_pct": 0.875, "interpolation": "bicubic"})
