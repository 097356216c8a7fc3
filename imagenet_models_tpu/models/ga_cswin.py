"""GA-CSWin: 5-stage CSWin transformer with Gramian-Attention branch heads.

TPU-native rebuild of /root/reference/GA/ga_cswin.py (GA_CSWinTransformer,
lines 447-693): deep 3-conv stem (:462-477), 4 CSWin stages with Merge_Block
3x3-s2 downsampling (:253-268), stage-3 intermediate taps (:659-661),
multi-scale concat on the 1/16 grid (:666-669), stage-5 = 1x1 Merge_Block_LCF
+ one CSWinBlock (:531-539), and `branches` gram-seeded class-attention heads
with a CSWinBlock gram_layer (:556-586).

Registry reconstruction (SURVEY §2 gap): the reference defines default_cfgs
for ga_CSWin_64_12211_tiny_224 / ga_CSWin_64_24322_small_224 (:34-37) but no
factories. Configs are rebuilt from the upstream CSWin name encoding
(embed 64; depths 1-2-21-1 / 2-4-32-2; heads 2-4-8-16 + stage-5 16; splits
1-2-7-7 + stage-5 7) and the GA class defaults (:450-453).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from imagenet_models_tpu.ckpt.pretrained import register_torch_rules
from imagenet_models_tpu.ckpt.reverse_rules import register_reverse_rules
from imagenet_models_tpu.core.registry import register_default_cfg, register_model
from imagenet_models_tpu.nn.ga_head import Bottleneck, LayerScaleBlockClassAttn
from imagenet_models_tpu.nn.heads import gram_triu_normalize
from imagenet_models_tpu.nn.layers import (
    BatchNorm,
    Dense,
    GroupedDense,
    LayerNorm,
    adaptive_avg_pool,
    gelu,
    resize_bilinear,
    resolve_act,
    trunc_normal_init,
)
from imagenet_models_tpu.ops.cswin_attention import CSWinBlock

Dtype = Any


class MergeBlock(nn.Module):
    """3x3 stride-2 conv + LN (reference: ga_cswin.py:253-268)."""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim_out, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, kernel_init=trunc_normal_init(), name="conv")(x)
        return LayerNorm(dtype=self.dtype, name="norm")(x)


class MergeBlockLCF(nn.Module):
    """1x1 conv + LN (reference: ga_cswin.py:236-251)."""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="conv")(x)
        return LayerNorm(dtype=self.dtype, name="norm")(x)


class GA_CSWinTransformer(nn.Module):
    """reference: ga_cswin.py:447-693."""

    embed_dim: int = 64
    depth: Sequence[int] = (1, 2, 21, 1)
    dims: Sequence[int] = (64, 128, 256, 512)
    num_heads: Sequence[int] = (2, 4, 8, 16, 16)
    split_size: Sequence[int] = (1, 2, 7, 7, 7)
    num_classes: int = 1000
    mlp_ratio: float = 4.0
    mlp_ratio_stage4: float = 4.0
    mlp_ratio_stage5: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    stage3_naggre: int = 4
    ga_mlp_groups: int = 2
    ga_layer_mlp_groups: int = 1
    branches: int = 5
    gram_dim: int = 192
    deep_stem: bool = True
    stage5: str = "CSWin"  # CSWin | bottleneck
    stage5_mlp_groups: int = 1
    ga_layer: bool = True
    use_chk: bool = False  # per-block gradient checkpointing (ga_cswin.py:640-657)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        det = not training
        dims, depth = self.dims, self.depth
        heads, split = self.num_heads, self.split_size
        dpr = np.linspace(0, self.drop_path_rate, sum(depth))

        # deep stem (ga_cswin.py:462-477)
        if self.deep_stem:
            x = nn.Conv(self.embed_dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, kernel_init=trunc_normal_init(),
                        name="stem_conv0")(x)
            x = resolve_act(gelu, not training)(LayerNorm(dtype=self.dtype, name="stem_norm0")(x))
            x = nn.Conv(self.embed_dim, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, kernel_init=trunc_normal_init(), name="stem_conv1")(x)
            x = resolve_act(gelu, not training)(LayerNorm(dtype=self.dtype, name="stem_norm1")(x))
            x = nn.Conv(dims[0], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, kernel_init=trunc_normal_init(),
                        name="stem_conv2")(x)
            x = LayerNorm(dtype=self.dtype, name="stem_norm2")(x)
        else:
            x = nn.Conv(dims[0], (7, 7), strides=(4, 4), padding=[(2, 2), (2, 2)],
                        dtype=self.dtype, kernel_init=trunc_normal_init(), name="stem_conv0")(x)
            x = LayerNorm(dtype=self.dtype, name="stem_norm0")(x)

        # use_chk ≡ torch.utils.checkpoint per stage block (ga_cswin.py:640-657):
        # nn.remat recomputes the block in the backward, trading FLOPs for
        # activation memory. Lifted transform — param names are unchanged
        # (checkpoint maps stay valid); `training` must be static (argnum 2).
        block_cls = (nn.remat(CSWinBlock, static_argnums=(2,))
                     if self.use_chk and training else CSWinBlock)

        def run_stage(x, name, n_blocks, dim, nh, ss, mlp_ratio, dp_off, last=False,
                      tap_interval=0, max_taps=0):
            taps = []
            for i in range(n_blocks):
                x = block_cls(dim, nh, split_size=ss, mlp_ratio=mlp_ratio,
                              qkv_bias=self.qkv_bias, drop=self.drop_rate,
                              attn_drop=self.attn_drop_rate,
                              drop_path=float(dpr[dp_off + i]), last_stage=last,
                              dtype=self.dtype, name=f"{name}_{i}")(x, training)
                if tap_interval and (i + 1) % tap_interval == 0 and len(taps) < max_taps:
                    taps.append(x)
            return x, taps

        xs = []
        x, _ = run_stage(x, "stage1", depth[0], dims[0], heads[0], split[0],
                         self.mlp_ratio, 0)
        xs.append(x)
        x = MergeBlock(dims[1], dtype=self.dtype, name="merge1")(x)
        x, _ = run_stage(x, "stage2", depth[1], dims[1], heads[1], split[1],
                         self.mlp_ratio, depth[0])
        xs.append(x)
        x = MergeBlock(dims[2], dtype=self.dtype, name="merge2")(x)
        interval = depth[2] // (self.stage3_naggre + 1)
        x, taps = run_stage(x, "stage3", depth[2], dims[2], heads[2], split[2],
                            self.mlp_ratio, sum(depth[:2]), tap_interval=interval,
                            max_taps=self.stage3_naggre)
        xs.extend(taps)
        xs.append(x)
        x = MergeBlock(dims[3], dtype=self.dtype, name="merge3")(x)
        x, _ = run_stage(x, "stage4", depth[3], dims[3], heads[3], split[-1],
                         self.mlp_ratio_stage4, sum(depth[:3]), last=True)
        xs.append(x)

        # multi-scale concat on the 1/16 grid (ga_cswin.py:666-669); taps and
        # stage-3 output are already on it
        hw = xs[2].shape[1:3]
        parts = [adaptive_avg_pool(xs[0], hw), adaptive_avg_pool(xs[1], hw)]
        parts += xs[2:-1]
        parts += [resize_bilinear(xs[-1], hw)]
        x = jnp.concatenate(parts, axis=-1)

        curr_dim = dims[3]
        if self.stage5 == "CSWin":
            x = MergeBlockLCF(curr_dim, dtype=self.dtype, name="stage5_merge")(x)
            x = CSWinBlock(curr_dim, heads[4], split_size=split[4],
                           mlp_ratio=self.mlp_ratio_stage5, qkv_bias=self.qkv_bias,
                           drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                           drop_path=float(dpr[-1]), mlp_groups=self.stage5_mlp_groups,
                           dtype=self.dtype, name="stage5_block")(x, training=training)
        else:
            x = Bottleneck(planes=curr_dim // 4, outplanes=curr_dim,
                           drop_path=self.drop_path_rate, dtype=self.dtype,
                           name="stage5_block")(x, training=training)

        b, h, w, c = x.shape
        img_tokens = x.reshape(b, h * w, c)
        ura = not training

        outs = []
        for k in range(self.branches):
            g = GroupedDense(self.gram_dim, groups=8, use_bias=True, dtype=self.dtype,
                             name=f"gram_contraction_{k}")(x)
            g = BatchNorm(dtype=self.dtype, name=f"gram_contraction_{k}_bn")(
                g, use_running_average=ura)
            if self.ga_layer:
                g = CSWinBlock(self.gram_dim, 6, split_size=split[4],
                               qkv_bias=self.qkv_bias, drop=self.drop_rate,
                               attn_drop=self.attn_drop_rate, drop_path=float(dpr[-1]),
                               mlp_groups=self.ga_layer_mlp_groups, dtype=self.dtype,
                               name=f"gram_layer_{k}")(g, training=training)
            gt = g.reshape(b, h * w, self.gram_dim)
            gv = gram_triu_normalize(gt, scale=1.0 / h)
            gv = GroupedDense(curr_dim, groups=8, use_bias=True, dtype=self.dtype,
                              name=f"gram_embedding_{k}")(gv)
            gv = BatchNorm(dtype=self.dtype, name=f"gram_embedding_{k}_bn")(
                gv, use_running_average=ura)
            token = gv.reshape(b, 1, curr_dim).astype(x.dtype)
            token = LayerScaleBlockClassAttn(
                curr_dim, num_heads=8, mlp_block_groups=self.ga_mlp_groups,
                dim_embed=curr_dim // 4, dtype=self.dtype, name=f"ga_{k}")(
                img_tokens, token, deterministic=det)
            outs.append(Dense(self.num_classes, dtype=self.dtype, name=f"fc_{k}")(token[:, 0]))
        return tuple(outs)


GA_CSWIN_RULES = [
    # deep stem Sequential indices (convs at 0/5/10, LNs at 2/7/12)
    (r"^stage1_conv_embed\.0$", "stem_conv0"),
    (r"^stage1_conv_embed\.2$", "stem_norm0"),
    (r"^stage1_conv_embed\.5$", "stem_conv1"),
    (r"^stage1_conv_embed\.7$", "stem_norm1"),
    (r"^stage1_conv_embed\.10$", "stem_conv2"),
    (r"^stage1_conv_embed\.12$", "stem_norm2"),
    # stage5 is Sequential(LCF-merge, CSWinBlock) — must rewrite before the
    # generic stage-block rule or it would shadow these (caught by the
    # ga_cswin export round-trip test)
    (r"^stage5\.1\.", "stage5_merge."),
    (r"^stage5\.2\.", "stage5_block."),
    (r"^stage([1-4])\.(\d+)\.", r"stage\1_\2."),
    (r"attns\.(\d)\.", r"attns_\1."),
    (r"^gram_contraction\.(\d+)\.0$", r"gram_contraction_\1"),
    (r"^gram_contraction\.(\d+)\.1$", r"gram_contraction_\1_bn"),
    (r"^gram_layer\.(\d+)\.1\.", r"gram_layer_\1."),
    (r"^gram_embedding\.(\d+)\.0$", r"gram_embedding_\1"),
    (r"^gram_embedding\.(\d+)\.1$", r"gram_embedding_\1_bn"),
    (r"^ga\.(\d+)\.", r"ga_\1."),
    (r"^fc\.(\d+)$", r"fc_\1"),
]

register_torch_rules("ga_cswin*", GA_CSWIN_RULES)
register_torch_rules("ga_CSWin*", GA_CSWIN_RULES)

# flax path -> torch dotted key (inverse of GA_CSWIN_RULES; ordering matters:
# _bn suffixes must rewrite before their prefix patterns)
GA_CSWIN_REVERSE = [
    (r"^stem_conv0", "stage1_conv_embed.0"),
    (r"^stem_norm0", "stage1_conv_embed.2"),
    (r"^stem_conv1", "stage1_conv_embed.5"),
    (r"^stem_norm1", "stage1_conv_embed.7"),
    (r"^stem_conv2", "stage1_conv_embed.10"),
    (r"^stem_norm2", "stage1_conv_embed.12"),
    (r"^stage5_merge\.", "stage5.1."),
    (r"^stage5_block\.", "stage5.2."),
    (r"^stage(\d)_(\d+)\.", r"stage\1.\2."),
    (r"attns_(\d)\.", r"attns.\1."),
    (r"^gram_contraction_(\d+)_bn", r"gram_contraction.\1.1"),
    (r"^gram_contraction_(\d+)", r"gram_contraction.\1.0"),
    (r"^gram_layer_(\d+)\.", r"gram_layer.\1.1."),
    (r"^gram_embedding_(\d+)_bn", r"gram_embedding.\1.1"),
    (r"^gram_embedding_(\d+)", r"gram_embedding.\1.0"),
    (r"^ga_(\d+)\.", r"ga.\1."),
    (r"^fc_(\d+)$", r"fc.\1"),
]

register_reverse_rules("ga_cswin*", GA_CSWIN_REVERSE)
register_reverse_rules("ga_CSWin*", GA_CSWIN_REVERSE)


@register_model
def ga_cswin_tiny(**kwargs):
    """ga_CSWin_64_12211_tiny_224 (reconstructed; see module docstring)."""
    kwargs.pop("drop", None), kwargs.pop("drop_rate", None)
    return GA_CSWinTransformer(
        embed_dim=64, depth=(1, 2, 21, 1), dims=(64, 128, 256, 512),
        num_heads=(2, 4, 8, 16, 16), split_size=(1, 2, 7, 7, 7),
        drop_path_rate=kwargs.pop("drop_path_rate", 0.0),
        num_classes=kwargs.pop("num_classes", 1000), **kwargs)


@register_model
def ga_cswin_small(**kwargs):
    """ga_CSWin_64_24322_small_224 (reconstructed)."""
    kwargs.pop("drop", None), kwargs.pop("drop_rate", None)
    return GA_CSWinTransformer(
        embed_dim=64, depth=(2, 4, 32, 2), dims=(64, 128, 256, 512),
        num_heads=(2, 4, 8, 16, 16), split_size=(1, 2, 7, 7, 7),
        drop_path_rate=kwargs.pop("drop_path_rate", 0.0),
        num_classes=kwargs.pop("num_classes", 1000), **kwargs)


@register_model
def ga_cswin_base(**kwargs):
    """GA-CSWin-B (96-dim embed per upstream CSWin-B; used by BASELINE config
    #5 384-res fine-tune)."""
    kwargs.pop("drop", None), kwargs.pop("drop_rate", None)
    return GA_CSWinTransformer(
        embed_dim=96, depth=(2, 4, 32, 2), dims=(96, 192, 384, 768),
        num_heads=(4, 8, 16, 32, 32), split_size=(1, 2, 7, 7, 7),
        drop_path_rate=kwargs.pop("drop_path_rate", 0.0),
        num_classes=kwargs.pop("num_classes", 1000), **kwargs)


@register_model
def ga_cswin_base_384(**kwargs):
    """GA-CSWin-B at 384 resolution (BASELINE config #5 fine-tune target).

    Stage grids at 384 are 96/48/24/12 with the stage-5 head on the 24 grid;
    stripe widths scale to (1, 2, 12, 12, 12) following upstream CSWin's
    384 variants so every grid is divisible by its split."""
    kwargs.pop("drop", None), kwargs.pop("drop_rate", None)
    return GA_CSWinTransformer(
        embed_dim=96, depth=(2, 4, 32, 2), dims=(96, 192, 384, 768),
        num_heads=(4, 8, 16, 32, 32), split_size=(1, 2, 12, 12, 12),
        drop_path_rate=kwargs.pop("drop_path_rate", 0.0),
        num_classes=kwargs.pop("num_classes", 1000), **kwargs)


# reference aliases for the default_cfgs names (ga_cswin.py:34-37)
@register_model(name="ga_CSWin_64_12211_tiny_224")
def _ga_cswin_tiny_alias(**kwargs):
    return ga_cswin_tiny(**kwargs)


@register_model(name="ga_CSWin_64_24322_small_224")
def _ga_cswin_small_alias(**kwargs):
    return ga_cswin_small(**kwargs)


for _n in ("ga_cswin_tiny", "ga_cswin_small", "ga_cswin_base",
           "ga_CSWin_64_12211_tiny_224", "ga_CSWin_64_24322_small_224"):
    register_default_cfg(_n, {"crop_pct": 0.9, "interpolation": "bicubic"})
register_default_cfg("ga_cswin_base_384", {"crop_pct": 1.0, "interpolation": "bicubic",
                                           "input_size": (384, 384, 3)})
