"""MobileNetV1 (+MAP head), TPU-native NHWC.

Rebuild of /root/reference/MAP/models/map_mobilenet.py: depthwise-separable
conv stacks restructured into 5 feature stages (:39-64), with the MAP head in
last-level-only mode (multi_scale_level=-1 -> channel_convertor path,
map.py:361-364) per the factory config (:66-83).
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn
import jax.numpy as jnp

from imagenet_models_tpu.ckpt.pretrained import register_torch_rules
from imagenet_models_tpu.ckpt.torch_convert import MAP_HEAD_RULES
from imagenet_models_tpu.core.registry import register_default_cfg, register_model
from imagenet_models_tpu.nn.heads import MAPHead
from imagenet_models_tpu.nn.layers import BatchNorm, Dense, gelu, trunc_normal_init

Dtype = Any


class ConvBN(nn.Module):
    """3x3 conv + BN + ReLU (reference: map_mobilenet.py:19-24)."""

    features: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="conv0")(x)
        x = BatchNorm(dtype=self.dtype, name="bn0")(x, use_running_average=not training)
        return nn.relu(x)


class ConvDW(nn.Module):
    """dw3x3+BN+ReLU then pw1x1+BN+ReLU (reference: map_mobilenet.py:26-37)."""

    features: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        ura = not training
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), strides=(self.stride, self.stride), padding=[(1, 1), (1, 1)],
                    feature_group_count=c, use_bias=False, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="conv0")(x)
        x = BatchNorm(dtype=self.dtype, name="bn0")(x, use_running_average=ura)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, use_running_average=ura)
        return nn.relu(x)


# (block type, out_channels, stride) per stage (map_mobilenet.py:39-64)
_STAGES = [
    [(ConvBN, 32, 2), (ConvDW, 64, 1)],
    [(ConvDW, 128, 2), (ConvDW, 128, 1)],
    [(ConvDW, 256, 2), (ConvDW, 256, 1)],
    [(ConvDW, 512, 2)] + [(ConvDW, 512, 1)] * 5,
    [(ConvDW, 1024, 2), (ConvDW, 1024, 1)],
]


class MobileNetV1(nn.Module):
    num_classes: int = 1000
    use_map: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False, pre_logits: bool = False):
        features = []
        for i, stage in enumerate(_STAGES):
            for j, (blk, ch, stride) in enumerate(stage):
                x = blk(ch, stride=stride, dtype=self.dtype, name=f"layers_{i}_{j}")(
                    x, training=training)
            features.append(x)
        if self.use_map:
            dim = 192
            head = MAPHead(
                multi_scale_level=-1, channels=[64, 128, 256, 512, 1024], last_dim=dim,
                n_tokens=4, n_groups=1, self_distill_token=False, non_linearity=gelu,
                gram=True, bp_dim=dim, bp_groups=1, gram_group=32, gram_dim=dim,
                num_heads=dim // 32, ca_dim=dim, mlp_ratio=1, mlp_groups=1,
                interactive=True, head_fn="linear", fc_drop=0.0,
                num_classes=self.num_classes, dtype=self.dtype, name="fc",
            )
            return head(features, training=training, pre_logits=pre_logits)
        x = jnp.mean(x, axis=(1, 2))
        return Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


MOBILENET_RULES = [
    (r"^layers\.(\d+)\.(\d+)\.0$", r"layers_\1_\2.conv0"),
    (r"^layers\.(\d+)\.(\d+)\.1$", r"layers_\1_\2.bn0"),
    (r"^layers\.(\d+)\.(\d+)\.3$", r"layers_\1_\2.conv1"),
    (r"^layers\.(\d+)\.(\d+)\.4$", r"layers_\1_\2.bn1"),
    (r"^fc\.2$", "fc"),  # plain-head: Sequential(avgpool, flatten, linear)
] + MAP_HEAD_RULES

register_torch_rules("*mobilenet_v1", MOBILENET_RULES, drop=[r"bp_index$"])


@register_model
def mobilenet_v1(**kwargs):
    kwargs.pop("drop", None), kwargs.pop("drop_rate", None), kwargs.pop("drop_path_rate", None)
    return MobileNetV1(num_classes=kwargs.pop("num_classes", 1000), **kwargs)


@register_model
def map_mobilenet_v1(**kwargs):
    """reference: map_mobilenet.py:109-117"""
    kwargs.pop("drop", None), kwargs.pop("drop_rate", None), kwargs.pop("drop_path_rate", None)
    return MobileNetV1(num_classes=kwargs.pop("num_classes", 1000), use_map=True, **kwargs)


register_default_cfg("mobilenet_v1", {"crop_pct": 0.95, "interpolation": "bicubic",
                                      "input_size": (224, 224, 3)})
register_default_cfg("map_mobilenet_v1", {"crop_pct": 0.95, "interpolation": "bicubic",
                                          "input_size": (224, 224, 3)})
