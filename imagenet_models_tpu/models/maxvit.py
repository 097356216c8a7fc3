"""MaxViT (TF-style tiny) + MAP head, TPU-native NHWC.

Rebuild of the reference's vendored timm maxxvit (the 'M'-block path actually
used by map_maxvit_tiny_tf_224: /root/reference/MAP/models/map_maxvit.py —
MbConvBlock :436-531, window/grid partition attention :658-719, MaxxVitBlock
:896-938, Stem :1048-1080, MaxxVit :1112-1325, tf cfg :1463-1478,1483-1491,
factory :1792-1804). TF specifics preserved: BN eps 1e-3 + 'SAME' padding in
conv blocks, LN eps 1e-5 in attention blocks, head_first=False qkv ordering,
zero-init TF rel-pos bias tables, window/grid = input/32.

The NCHW<->NHWC permutes bracketing every attention pair in the torch version
(:931-937) vanish: everything is NHWC end-to-end.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from imagenet_models_tpu.ckpt.pretrained import register_torch_rules
from imagenet_models_tpu.ckpt.reverse_rules import MAP_HEAD_REVERSE, register_reverse_rules
from imagenet_models_tpu.ckpt.torch_convert import MAP_HEAD_RULES
from imagenet_models_tpu.core.registry import register_default_cfg, register_model
from imagenet_models_tpu.nn.ga_head import SEModule, make_divisible
from imagenet_models_tpu.nn.heads import MAPHead
from imagenet_models_tpu.nn.layers import (
    BatchNorm,
    Dense,
    DropPath,
    LayerNorm,
    Mlp,
    gelu,
    resolve_act,
    trunc_normal_init,
)
from imagenet_models_tpu.ops.window_attention import (
    AttentionCl,
    grid_partition,
    grid_reverse,
    use_fused_partition_attn,
    window_partition,
    window_reverse,
)

Dtype = Any

BN_EPS_TF = 1e-3
LN_EPS_TF = 1e-5


def avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class BNAct(nn.Module):
    apply_act: bool = True
    eps: float = BN_EPS_TF
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = BatchNorm(epsilon=self.eps, dtype=self.dtype, name="bn")(
            x, use_running_average=not training)
        if not self.apply_act:
            return x
        # training-mode fast GELU (nn.layers.resolve_act); eval = exact erf
        return resolve_act(gelu, not training)(x)


class MbConvBlock(nn.Module):
    """Pre-norm MBConv (map_maxvit.py:436-531), tf cfg: stride via the
    depthwise conv, SE after norm2, BN eps 1e-3, SAME padding."""

    out_chs: int
    stride: int = 1
    drop_path: float = 0.0
    expand_ratio: float = 4.0
    attn_ratio: float = 0.25
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        in_chs = x.shape[-1]
        mid_chs = make_divisible(int(self.out_chs * self.expand_ratio))

        if self.stride == 2:
            shortcut = avg_pool2(x)
            # Downsample2d expands only on a channel change (map_maxvit.py:304-307,
            # nn.Identity otherwise) — stage0 block0 has in==out and no conv.
            if in_chs != self.out_chs:
                shortcut = nn.Conv(self.out_chs, (1, 1), use_bias=True, dtype=self.dtype,
                                   kernel_init=trunc_normal_init(), name="shortcut_expand")(shortcut)
        elif in_chs != self.out_chs:
            shortcut = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                               kernel_init=trunc_normal_init(), name="shortcut_conv")(x)
            shortcut = BatchNorm(dtype=self.dtype, name="shortcut_bn")(
                shortcut, use_running_average=not training)
        else:
            shortcut = x

        h = BNAct(apply_act=False, dtype=self.dtype, name="pre_norm")(x, training=training)
        h = nn.Conv(mid_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="conv1_1x1")(h)
        h = BNAct(dtype=self.dtype, name="norm1")(h, training=training)
        h = nn.Conv(mid_chs, (3, 3), strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=mid_chs, use_bias=False, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="conv2_kxk")(h)
        h = BNAct(dtype=self.dtype, name="norm2")(h, training=training)
        h = SEModule(int(self.attn_ratio * self.out_chs), act=jax.nn.silu,
                     dtype=self.dtype, name="se")(h)  # silu gate: map_maxvit.py:489-503
        h = nn.Conv(self.out_chs, (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="conv3_1x1")(h)
        h = DropPath(self.drop_path)(h, deterministic=not training)
        return h + shortcut


class PartitionAttention(nn.Module):
    """Window or grid partition + AttentionCl + MLP (map_maxvit.py:658-719)."""

    dim: int
    partition_type: str = "block"  # block | grid
    partition_size: Tuple[int, int] = (7, 7)
    dim_head: int = 32
    expand_ratio: float = 4.0
    rel_pos_type: str = "bias_tf"
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        det = not training
        hw = x.shape[1:3]
        ps = self.partition_size
        n1 = LayerNorm(epsilon=LN_EPS_TF, dtype=self.dtype, name="norm1")(x)
        if use_fused_partition_attn(n1.shape, ps, self.partition_type,
                                    self.attn_drop, det):
            # partition-free packed Pallas attention: the window/grid
            # relayout copies (45.6 ms/step in the r4 trace) move into the
            # kernel's VMEM shuffles; same params, same math.
            a = AttentionCl(self.dim, self.dim, dim_head=self.dim_head,
                            rel_pos_type=self.rel_pos_type, window_size=ps,
                            attn_drop=self.attn_drop, proj_drop=self.proj_drop,
                            partition=(self.partition_type, ps),
                            dtype=self.dtype, name="attn")(n1, deterministic=det)
        else:
            part = window_partition(n1, ps) if self.partition_type == "block" else grid_partition(n1, ps)
            part = AttentionCl(self.dim, self.dim, dim_head=self.dim_head,
                               rel_pos_type=self.rel_pos_type, window_size=ps,
                               attn_drop=self.attn_drop, proj_drop=self.proj_drop,
                               dtype=self.dtype, name="attn")(part, deterministic=det)
            a = window_reverse(part, ps, hw) if self.partition_type == "block" else grid_reverse(part, ps, hw)
        dp = DropPath(self.drop_path)
        x = x + dp(a, deterministic=det)
        hidden = int(self.dim * self.expand_ratio)
        from imagenet_models_tpu.ops.convnext_block import (
            ln_mlp_apply,
            use_transformer_lnmlp,
        )

        if use_transformer_lnmlp(self.proj_drop, det):
            # norm2+Mlp as one fused Pallas kernel (hidden never hits HBM);
            # identical param tree via ParamHolder, so checkpoints are
            # unaffected.
            from imagenet_models_tpu.nn.param_holder import MlpParams, ParamHolder

            c = self.dim
            zeros = nn.initializers.zeros_init()
            ones = nn.initializers.ones_init()
            norm = ParamHolder([("scale", (c,), ones), ("bias", (c,), zeros)],
                               name="norm2")()
            fc1, fc2 = MlpParams(c, hidden, trunc_normal_init(), name="mlp")()
            xc = x if self.dtype is None else x.astype(self.dtype)
            m = ln_mlp_apply(xc, norm["scale"], norm["bias"],
                             fc1["kernel"], fc1["bias"],
                             fc2["kernel"], fc2["bias"],
                             eps=LN_EPS_TF, training=training).astype(x.dtype)
        else:
            m = Mlp(hidden_features=hidden, act=gelu,
                    drop=self.proj_drop, dtype=self.dtype, name="mlp")(
                LayerNorm(epsilon=LN_EPS_TF, dtype=self.dtype, name="norm2")(x),
                deterministic=det)
        return x + dp(m, deterministic=det)


class MaxxVitBlock(nn.Module):
    """MBConv -> block-window attn -> grid attn (map_maxvit.py:896-938)."""

    dim_out: int
    stride: int = 1
    partition_size: Tuple[int, int] = (7, 7)
    drop_path: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        # `training` positional-friendly for nn.remat(static_argnums=(2,))
        # (grad_checkpointing ≡ checkpoint_seq, map_maxvit.py:1040-1044).
        x = MbConvBlock(self.dim_out, stride=self.stride, drop_path=self.drop_path,
                        dtype=self.dtype, name="conv")(x, training=training)
        x = PartitionAttention(self.dim_out, "block", self.partition_size,
                               drop_path=self.drop_path, dtype=self.dtype,
                               name="attn_block")(x, training=training)
        x = PartitionAttention(self.dim_out, "grid", self.partition_size,
                               drop_path=self.drop_path, dtype=self.dtype,
                               name="attn_grid")(x, training=training)
        return x


class MaxxVit(nn.Module):
    """reference: map_maxvit.py:1112-1325 (tf maxvit configs)."""

    embed_dim: Sequence[int] = (64, 128, 256, 512)
    depths: Sequence[int] = (2, 2, 5, 2)
    stem_width: int = 64
    num_classes: int = 1000
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    head_hidden_size: int = 512
    partition_ratio: int = 32
    global_pool: str = "avg"  # avg | mmcap
    # MAP head cfg (factory: map_maxvit.py:1792-1804)
    last_dim: Optional[int] = 384
    n_groups: int = 4
    n_tokens: int = 2
    bp_dim: int = 384
    bp_groups: int = 1
    gram_group: int = 24
    gram_dim: Optional[int] = 384
    ca_dim: int = 384
    num_heads: int = 12
    split_norm: bool = False
    grad_checkpointing: bool = False  # per-block remat (map_maxvit.py:1040-1044)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False, pre_logits: bool = False):
        h0, w0 = x.shape[1:3]
        ps = (h0 // self.partition_ratio, w0 // self.partition_ratio)

        # stem (map_maxvit.py:1048-1080): conv s2 + BN/GELU + conv s1
        x = nn.Conv(self.stem_width, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=True, dtype=self.dtype, kernel_init=trunc_normal_init(),
                    name="stem_conv1")(x)
        x = BNAct(dtype=self.dtype, name="stem_norm1")(x, training=training)
        x = nn.Conv(self.stem_width, (3, 3), padding="SAME", use_bias=True,
                    dtype=self.dtype, kernel_init=trunc_normal_init(), name="stem_conv2")(x)

        features = [x]
        splits = np.split(np.linspace(0, self.drop_path_rate, sum(self.depths)),
                          np.cumsum(self.depths)[:-1])
        block_cls = (nn.remat(MaxxVitBlock, static_argnums=(2,))
                     if self.grad_checkpointing and training else MaxxVitBlock)
        for i, (depth, dim) in enumerate(zip(self.depths, self.embed_dim)):
            for j in range(depth):
                x = block_cls(dim, stride=2 if j == 0 else 1, partition_size=ps,
                              drop_path=float(splits[i][j]), dtype=self.dtype,
                              name=f"stages_{i}_blocks_{j}")(x, training)
            features.append(x)

        if self.global_pool == "mmcap":
            head = MAPHead(
                multi_scale_level=3, channels=[self.stem_width] + list(self.embed_dim),
                last_dim=self.last_dim or self.embed_dim[-1], n_tokens=self.n_tokens,
                n_groups=self.n_groups, self_distill_token=True, mlp_ratio=4,
                mlp_groups=2, head_fn="split_norm" if self.split_norm else "norm",
                fc_drop=self.drop_rate, num_classes=self.num_classes,
                non_linearity=gelu, gram=True, bp_dim=self.bp_dim,
                bp_groups=self.bp_groups, gram_group=self.gram_group,
                gram_dim=self.gram_dim, ca_dim=self.ca_dim, num_heads=self.num_heads,
                dtype=self.dtype, name="head",
            )
            return head(features, training=training, pre_logits=pre_logits)

        # timm NormMlpClassifierHead is "A Pool -> Norm -> Mlp Classifier
        # Head": GAP first, LN over the pooled vector, then fc hidden + tanh
        # -> drop -> fc (map_maxvit.py:1226-1232; LN before pooling is NOT
        # equivalent — LN is nonlinear across tokens)
        x = jnp.mean(x, axis=(1, 2))
        x = LayerNorm(epsilon=LN_EPS_TF, dtype=self.dtype, name="head_norm")(x)
        x = jnp.tanh(Dense(self.head_hidden_size, dtype=self.dtype, name="head_pre_logits")(x))
        x = nn.Dropout(self.drop_rate)(x, deterministic=not training)
        return Dense(self.num_classes, dtype=self.dtype, name="head_fc")(x)


MAXVIT_RULES = [
    (r"^stem\.(conv1|conv2)$", r"stem_\1"),
    (r"^stem\.norm1$", "stem_norm1.bn"),
    (r"^stages\.(\d+)\.blocks\.(\d+)\.", r"stages_\1_blocks_\2."),
    (r"\bconv\.shortcut\.expand$", "conv.shortcut_expand"),
    (r"\bconv\.shortcut\.0$", "conv.shortcut_conv"),
    (r"\bconv\.shortcut\.1$", "conv.shortcut_bn"),
    (r"\bconv\.(pre_norm|norm1|norm2)$", r"conv.\1.bn"),
    (r"^head\.norm$", "head_norm"),
    (r"^head\.pre_logits\.fc$", "head_pre_logits"),
    (r"^head\.fc$", "head_fc"),
] + MAP_HEAD_RULES

register_torch_rules("*maxvit_*", MAXVIT_RULES, drop=[r"bp_index$", r"^norm\."])

MAXVIT_REVERSE = [
    (r"^stem_conv(\d)", r"stem.conv\1"),
    (r"^stem_norm1\.bn", "stem.norm1"),
    (r"^stages_(\d+)_blocks_(\d+)\.", r"stages.\1.blocks.\2."),
    (r"\bconv\.shortcut_expand", "conv.shortcut.expand"),
    (r"\bconv\.shortcut_conv", "conv.shortcut.0"),
    (r"\bconv\.shortcut_bn", "conv.shortcut.1"),
    (r"\bconv\.(pre_norm|norm1|norm2)\.bn", r"conv.\1"),
    (r"^head_norm", "head.norm"),
    (r"^head_pre_logits", "head.pre_logits.fc"),
    (r"^head_fc", "head.fc"),
] + MAP_HEAD_REVERSE

register_reverse_rules("*maxvit_*", MAXVIT_REVERSE)


# tf-family architecture table (reference model_cfgs, map_maxvit.py:1483-1527):
# name -> (embed_dim, depths, stem_width, head_hidden_size). All share
# block_type 'M', stem_bias=True and the _tf_cfg() specifics baked into the
# modules above (BN eps 1e-3 / SAME / LN eps 1e-5 / head_first=False /
# rel_pos 'bias_tf'). The reference registers factory functions only for
# tiny but every cfg here is buildable via its _create_maxxvit
# (map_maxvit.py:1543-1559); exposing them all closes the cfg-zoo gap.
_TF_CFGS = {
    "tiny": ((64, 128, 256, 512), (2, 2, 5, 2), 64, 512),
    "small": ((96, 192, 384, 768), (2, 2, 5, 2), 64, 768),
    "base": ((96, 192, 384, 768), (2, 6, 14, 2), 64, 768),
    "large": ((128, 256, 512, 1024), (2, 6, 14, 2), 128, 1024),
    "xlarge": ((192, 384, 768, 1536), (2, 6, 14, 2), 192, 1536),
}


def _maxvit_tf(size: str, **kwargs):
    embed_dim, depths, stem_width, head_hidden = _TF_CFGS[size]
    kwargs.pop("drop", None)
    kwargs.setdefault("drop_rate", 0.0)
    return MaxxVit(embed_dim=embed_dim, depths=depths, stem_width=stem_width,
                   head_hidden_size=head_hidden,
                   drop_path_rate=kwargs.pop("drop_path_rate", 0.0),
                   num_classes=kwargs.pop("num_classes", 1000), **kwargs)


@register_model
def maxvit_tiny_tf_224(**kwargs):
    """reference: map_maxvit.py:1792-1795 (cfg maxvit_tiny_tf :1483-1491)."""
    return _maxvit_tf("tiny", **kwargs)


@register_model
def maxvit_tiny_tf_384(**kwargs):
    """Same architecture at 384 input (partition = input/32 -> 12x12 windows;
    rel-pos tables sized accordingly). reference cfg: the vendored timm zoo,
    map_maxvit.py:1585-1588 ('maxvit_tiny_tf_384.in1k', crop_pct 1.0)."""
    return _maxvit_tf("tiny", **kwargs)


@register_model
def maxvit_tiny_tf_512(**kwargs):
    """reference cfg: map_maxvit.py:1589-1592 ('maxvit_tiny_tf_512.in1k')."""
    return _maxvit_tf("tiny", **kwargs)


def _tf_data_cfg(size: str, res: int):
    """Data config mirroring the reference default_cfgs rows for the tf
    family (map_maxvit.py:1720-1784, first tag per model wins as in timm's
    generate_default_cfgs): 224 `.in1k` rows override mean/std to ImageNet
    defaults with crop_pct 0.95; 384/512 rows keep the maxxvit `_cfg` 0.5
    mean/std but use crop_pct 1.0 + crop_mode='squash'; xlarge has no 224
    in1k row — its default tag is `.in21k` (num_classes 21843, 0.5 norm)."""
    if res == 224:
        cfg = {"crop_pct": 0.95, "interpolation": "bicubic"}
        if size == "xlarge":
            cfg.update(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                       num_classes=21843)
        else:
            cfg.update(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
        return cfg
    return {"crop_pct": 1.0, "crop_mode": "squash", "interpolation": "bicubic",
            "input_size": (res, res, 3),
            "mean": (0.5, 0.5, 0.5), "std": (0.5, 0.5, 0.5)}


def _register_tf_size(size: str):
    """Register {size} x {224,384,512} factories mirroring the reference's
    default_cfgs rows (map_maxvit.py:1720-1784)."""
    for res in (224, 384, 512):
        name = f"maxvit_{size}_tf_{res}"

        def factory(_size=size, **kwargs):
            return _maxvit_tf(_size, **kwargs)

        factory.__name__ = name
        factory.__doc__ = (
            f"reference cfg: map_maxvit.py:1492-1527 (maxvit_{size}_tf) + "
            "default_cfgs :1729-1784; buildable there via _create_maxxvit.")
        register_model(factory)
        register_default_cfg(name, _tf_data_cfg(size, res))


for _size in ("small", "base", "large", "xlarge"):
    _register_tf_size(_size)


@register_model
def map_maxvit_tiny_tf_224(**kwargs):
    """reference: map_maxvit.py:1797-1804."""
    kwargs.pop("drop", None)
    kwargs.setdefault("drop_rate", 0.0)
    return MaxxVit(embed_dim=(64, 128, 256, 512), depths=(2, 2, 5, 2), stem_width=64,
                   global_pool="mmcap", last_dim=384, n_groups=4, n_tokens=2,
                   bp_dim=384, bp_groups=1, gram_dim=384, gram_group=24,
                   ca_dim=384, num_heads=12,
                   drop_path_rate=kwargs.pop("drop_path_rate", 0.0),
                   num_classes=kwargs.pop("num_classes", 1000), **kwargs)


# map_maxvit_tiny_tf_224 resolves the same 'maxvit_tiny_tf_224' cfg as the
# backbone (map_maxvit.py:1793-1795 passes the timm variant name); the golden
# validate log confirms ImageNet mean/std + crop_pct 0.95 + crop_mode center
# (MAP/README.MD maxvit detail block).
for _n in ("maxvit_tiny_tf_224", "map_maxvit_tiny_tf_224"):
    register_default_cfg(_n, _tf_data_cfg("tiny", 224))
for _sz in (384, 512):
    register_default_cfg(f"maxvit_tiny_tf_{_sz}", _tf_data_cfg("tiny", _sz))
