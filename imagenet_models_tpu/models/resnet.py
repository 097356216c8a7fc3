"""MAP-ResNet50: from-scratch SE-ResNet50 (deep stem, GELU ConvNormActs,
stochastic depth) + MAPHead.

TPU-native rebuild of /root/reference/MAP/models/map_resnet.py
(MAP_ResNet, lines 290-441; factory map_resnet50 :444-459). The reference has
a latent routing bug — the factory passes pool_type='map' (:450) but forward
only routes the MAPHead for pool_type in ['mmcap','multi_gap'] (:415) — here
the key is unified: pool_type='map' routes the MAP head (SURVEY §2 #7).
Activation quirk preserved: this file's ConvNormAct defaults to GELU
(map_resnet.py:24), so all conv stacks are GELU while the residual join is
ReLU (:56,66).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from imagenet_models_tpu.ckpt.pretrained import register_torch_rules
from imagenet_models_tpu.ckpt.torch_convert import MAP_HEAD_RULES
from imagenet_models_tpu.core.registry import register_default_cfg, register_model
from imagenet_models_tpu.nn.heads import MAPHead
from imagenet_models_tpu.nn.layers import (
    ConvNormAct,
    Dense,
    DropPath,
    LayerNorm,
    SEUnit,
    gelu,
)

Dtype = Any


class BottleNeck(nn.Module):
    """reference: map_resnet.py:45-66 (SE applied after conv3, ReLU join)."""

    channels: int
    stride: int = 1
    has_downsample: bool = False
    drop_path: float = 0.0
    se: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        ura = not training
        width = self.channels
        out_ch = self.channels * 4
        h = ConvNormAct(width, 1, act=gelu, dtype=self.dtype, name="conv1")(x, use_running_average=ura)
        h = ConvNormAct(width, 3, stride=self.stride, padding=1, act=gelu,
                        dtype=self.dtype, name="conv2")(h, use_running_average=ura)
        h = ConvNormAct(out_ch, 1, act=None, dtype=self.dtype, name="conv3")(h, use_running_average=ura)
        if self.se:
            h = SEUnit(act=gelu, dtype=self.dtype, name="se")(h, use_running_average=ura)
        if self.has_downsample:
            residual = ConvNormAct(out_ch, 1, stride=self.stride, act=None, dtype=self.dtype,
                                   name="downsample")(x, use_running_average=ura)
        else:
            residual = x
        h = DropPath(self.drop_path)(h, deterministic=not training)
        return nn.relu(residual + h)


def max_pool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class MAP_ResNet(nn.Module):
    """reference: map_resnet.py:290-441."""

    nblock: Sequence[int] = (3, 4, 6, 3)
    channels: Sequence[int] = (64, 128, 256, 512)
    strides: Sequence[int] = (1, 2, 2, 2)
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    se: bool = False
    stem_type: str = "normal"
    dropout: float = 0.0
    pool_type: str = "map"
    last_dim: int = 384
    n_groups: int = 4
    n_tokens: int = 3
    gram_group: int = 24
    token_distill: bool = True
    multi_scale_level: int = 3
    light: bool = False
    split_norm: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False, pre_logits: bool = False):
        ura = not training
        if self.stem_type == "deep":
            x = ConvNormAct(64, 3, stride=2, padding=1, act=gelu, dtype=self.dtype,
                            name="stem_0")(x, use_running_average=ura)
            x = ConvNormAct(64, 3, stride=1, padding=1, act=gelu, dtype=self.dtype,
                            name="stem_1")(x, use_running_average=ura)
            x = ConvNormAct(self.channels[0], 3, stride=1, padding=1, act=gelu,
                            dtype=self.dtype, name="stem_2")(x, use_running_average=ura)
        else:
            x = ConvNormAct(self.channels[0], 7, stride=2, padding=3, act=gelu,
                            dtype=self.dtype, name="stem_0")(x, use_running_average=ura)
        stem = x
        x = max_pool_3x3_s2(x)

        features = [stem]
        num_block = sum(self.nblock)
        cur = 0
        in_ch = self.channels[0]
        for i, (nb, ch, stride) in enumerate(zip(self.nblock, self.channels, self.strides)):
            for j in range(nb):
                s = stride if j == 0 else 1
                has_ds = j == 0 and (in_ch != ch * 4 or s != 1)
                dp = self.drop_path_rate * (cur / num_block)
                x = BottleNeck(ch, stride=s, has_downsample=has_ds, drop_path=dp, se=self.se,
                               dtype=self.dtype, name=f"layer{i + 1}_{j}")(x, training=training)
                cur += 1
                in_ch = ch * 4
            features.append(x)

        if self.pool_type in ("map", "mmcap"):
            head = MAPHead(
                multi_scale_level=self.multi_scale_level,
                channels=[self.channels[0]] + [c * 4 for c in self.channels],
                last_dim=self.last_dim, n_tokens=self.n_tokens, n_groups=self.n_groups,
                self_distill_token=self.token_distill, mlp_ratio=4, mlp_groups=2,
                head_fn="split_norm" if self.split_norm else "norm", fc_drop=0.0,
                num_classes=self.num_classes, non_linearity=gelu, gram=True,
                bp_dim=self.last_dim, bp_groups=1, gram_group=self.gram_group,
                gram_dim=self.last_dim, ca_dim=384, num_heads=12, light=self.light,
                dropout=self.dropout, interactive=True, dtype=self.dtype, name="head",
            )
            return head(features, training=training, pre_logits=pre_logits)
        # GAP + fc fallback (the reference's Linear(channels[0], ...) at :368 is
        # non-functional; we wire the sane dimension)
        x = jnp.mean(x, axis=(1, 2))
        return Dense(self.num_classes, dtype=self.dtype, name="head")(x)


RESNET_RULES = [
    (r"^stem\.(\d+)\.0$", r"stem_\1.conv"),
    (r"^stem\.(\d+)\.1$", r"stem_\1.bn"),
    (r"^layer(\d+)\.(\d+)\.", r"layer\1_\2."),
    (r"\bconv(\d)\.0$", r"conv\1.conv"),
    (r"\bconv(\d)\.1$", r"conv\1.bn"),
    (r"\bdownsample\.0$", "downsample.conv"),
    (r"\bdownsample\.1$", "downsample.bn"),
    (r"\bse\.1\.0$", "se.fc1.conv"),
    (r"\bse\.1\.1$", "se.fc1.bn"),
    (r"\bse\.2$", "se.fc2"),
] + MAP_HEAD_RULES

register_torch_rules("map_resnet*", RESNET_RULES, drop=[r"bp_index$"])
register_torch_rules("resnet50", RESNET_RULES, drop=[r"bp_index$"])


@register_model
def map_resnet50(**kwargs):
    """reference: map_resnet.py:444-459 (channels[3]=256 -> 1024-ch stage 4)."""
    cfg = dict(nblock=(3, 4, 6, 3), channels=(64, 128, 256, 256), pool_type="map",
               last_dim=384, n_groups=4, n_tokens=4, gram_group=32, se=True,
               stem_type="deep", token_distill=True)
    cfg["drop_path_rate"] = kwargs.pop("drop_path_rate", 0.0)
    cfg["dropout"] = kwargs.pop("drop", kwargs.pop("drop_rate", 0.0))
    cfg["num_classes"] = kwargs.pop("num_classes", 1000)
    cfg.update(kwargs)
    return MAP_ResNet(**cfg)


@register_model
def resnet50(**kwargs):
    """Plain SE-less ResNet50-ish baseline with GAP head (parity aid)."""
    cfg = dict(nblock=(3, 4, 6, 3), channels=(64, 128, 256, 512), pool_type="avg")
    cfg["drop_path_rate"] = kwargs.pop("drop_path_rate", 0.0)
    cfg["num_classes"] = kwargs.pop("num_classes", 1000)
    kwargs.pop("drop", None), kwargs.pop("drop_rate", None)
    cfg.update(kwargs)
    return MAP_ResNet(**cfg)


register_default_cfg("map_resnet50", {"crop_pct": 0.95, "interpolation": "bicubic"})
register_default_cfg("resnet50", {"crop_pct": 0.95, "interpolation": "bicubic"})
