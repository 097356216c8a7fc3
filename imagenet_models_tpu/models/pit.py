"""PiT (Pooling Transformer) + MAP head, TPU-native NHWC.

Rebuild of /root/reference/MAP/models/map_pit.py: conv patch embed + learned
pos_embed (:106-111), 3 transformer stages with depthwise conv_head_pooling
between (:59-70,116-132), pyramid = [embed, s1, s2, s3] (:173-188), MAPHead at
multi_scale_level=2 (:139-146).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from imagenet_models_tpu.ckpt.pretrained import register_torch_rules
from imagenet_models_tpu.ckpt.torch_convert import MAP_HEAD_RULES
from imagenet_models_tpu.core.registry import register_default_cfg, register_model
from imagenet_models_tpu.nn.heads import MAPHead
from imagenet_models_tpu.nn.layers import Dense, gelu, trunc_normal_init
from imagenet_models_tpu.nn.vit import ViTBlock

Dtype = Any


class PoolingTransformer(nn.Module):
    """reference: map_pit.py:85-199."""

    image_size: int = 224
    patch_size: int = 16
    stride: int = 8
    base_dims: Sequence[int] = (48, 48, 48)
    depth: Sequence[int] = (2, 6, 4)
    heads: Sequence[int] = (3, 6, 12)
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    attn_drop_rate: float = 0.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    pool_type: str = "gap"  # gap | map
    last_dim: int = 384
    n_groups: int = 4
    n_tokens: int = 3
    gram_group: int = 24
    self_distill_token: bool = True
    gram: bool = True
    multi_scale_level: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False, pre_logits: bool = False):
        det = not training
        width = math.floor((self.image_size - self.patch_size) / self.stride + 1)
        dim0 = self.base_dims[0] * self.heads[0]
        x = nn.Conv(dim0, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride), padding="VALID", use_bias=True,
                    dtype=self.dtype, kernel_init=trunc_normal_init(), name="patch_embed")(x)
        pos = self.param("pos_embed", trunc_normal_init(), (1, width, width, dim0), jnp.float32)
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.drop_rate)(x, deterministic=det)

        features = [x]
        total_block = sum(self.depth)
        block_idx = 0
        n_stages = len(self.depth)
        for s in range(n_stages):
            dim = self.base_dims[s] * self.heads[s]
            b, h, w, c = x.shape
            t = x.reshape(b, h * w, c)
            for i in range(self.depth[s]):
                dp = self.drop_path_rate * (block_idx + i) / total_block
                t = ViTBlock(dim, num_heads=self.heads[s], mlp_ratio=self.mlp_ratio,
                             qkv_bias=True, attn_drop=self.attn_drop_rate, drop_path=dp,
                             dtype=self.dtype, name=f"transformers_{s}_blocks_{i}")(
                    t, deterministic=det)
            block_idx += self.depth[s]
            x = t.reshape(b, h, w, c)
            features.append(x)
            if s < n_stages - 1:
                out_dim = self.base_dims[s + 1] * self.heads[s + 1]
                x = nn.Conv(out_dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                            feature_group_count=dim, use_bias=True, dtype=self.dtype,
                            kernel_init=trunc_normal_init(), name=f"pools_{s}")(x)

        if self.pool_type == "map":
            channels = [dim0] + [d * h for d, h in zip(self.base_dims, self.heads)]
            head = MAPHead(
                multi_scale_level=self.multi_scale_level, channels=channels,
                last_dim=self.last_dim, n_tokens=self.n_tokens, n_groups=self.n_groups,
                self_distill_token=self.self_distill_token, mlp_ratio=4, mlp_groups=2,
                head_fn="norm", fc_drop=0.0, num_classes=self.num_classes,
                non_linearity=gelu, gram=self.gram, bp_dim=self.last_dim, bp_groups=1,
                gram_group=self.gram_group, gram_dim=self.last_dim, ca_dim=192,
                num_heads=12, dtype=self.dtype, name="head",
            )
            return head(features, training=training, pre_logits=pre_logits)
        x = jnp.mean(features[-1], axis=(1, 2))
        return Dense(self.num_classes, dtype=self.dtype, name="head")(x)


PIT_RULES = [
    (r"^transformers\.(\d+)\.blocks\.(\d+)\.", r"transformers_\1_blocks_\2."),
    (r"^pools\.(\d+)\.conv$", r"pools_\1"),
    (r"^patch_embed\.conv$", "patch_embed"),
] + MAP_HEAD_RULES

register_torch_rules("pit_s", PIT_RULES, drop=[r"bp_index$"])
register_torch_rules("map_pit_s", PIT_RULES, drop=[r"bp_index$"])


@register_model
def pit_s(**kwargs):
    """reference: map_pit.py:202-218"""
    kwargs.pop("drop", None), kwargs.pop("drop_rate", None)
    return PoolingTransformer(pool_type="gap",
                              drop_path_rate=kwargs.pop("drop_path_rate", 0.0),
                              num_classes=kwargs.pop("num_classes", 1000), **kwargs)


@register_model
def map_pit_s(**kwargs):
    """reference: map_pit.py:221-247"""
    kwargs.pop("drop", None), kwargs.pop("drop_rate", None)
    return PoolingTransformer(pool_type="map", last_dim=384, n_groups=2, n_tokens=4,
                              gram_group=32,
                              drop_path_rate=kwargs.pop("drop_path_rate", 0.0),
                              num_classes=kwargs.pop("num_classes", 1000), **kwargs)


register_default_cfg("pit_s", {"crop_pct": 0.95, "interpolation": "bicubic"})
register_default_cfg("map_pit_s", {"crop_pct": 0.95, "interpolation": "bicubic"})
