"""FasterViT-3 (+MAP head), TPU-native NHWC.

Rebuild of /root/reference/MAP/models/map_fastervit.py (NVIDIA FasterViT with
hierarchical attention): conv PatchEmbed (:442-468), 2 conv stages (:471-511),
2 transformer stages of HAT (:571-705) with carrier tokens pooled per window
(TokenInitializer :708-743), SwinV2-style log-CPB MLP rel-pos
(PosEmbMLPSwinv2D :211-308) and MLP absolute pos (PosEmbMLPSwinv1D :311-366),
carrier propagation on the last HAT block (:699-704), and the MAPHead
integration (:932-948).

The torch version caches pos-emb grids imperatively (grid_exists/deploy);
here the bias MLPs run inside the jitted graph on constant coordinate tables
— XLA hoists them, which is the functional equivalent of deploy-mode caching.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from imagenet_models_tpu.ckpt.pretrained import register_torch_rules
from imagenet_models_tpu.ckpt.reverse_rules import MAP_HEAD_REVERSE, register_reverse_rules
from imagenet_models_tpu.ckpt.torch_convert import MAP_HEAD_RULES
from imagenet_models_tpu.core.registry import register_default_cfg, register_model
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

Dtype = Any


def window_partition_tokens(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B*nw, ws*ws, C) (map_fastervit.py:82-86)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse_tokens(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(-1, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, h, w, c)


def ct_dewindow(ct: jnp.ndarray, size: int, ws: int) -> jnp.ndarray:
    """Window-grouped carrier tokens -> raster order (map_fastervit.py:95-100).
    ct: (B, size*size, C) grouped by (size/ws) windows of ws*ws."""
    b, n, c = ct.shape
    g = size // ws
    x = ct.reshape(b, g, g, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, g, ws, g, ws, c)
    return x.reshape(b, size * size, c)


def ct_window(ct: jnp.ndarray, size: int, ws: int) -> jnp.ndarray:
    """Raster -> window-grouped order (map_fastervit.py:103-108)."""
    b, n, c = ct.shape
    g = size // ws
    x = ct.reshape(b, g, ws, g, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, size * size, c)


class CPBMlp(nn.Module):
    """2-layer coord MLP: Linear(rank,512)+ReLU+Linear(512,out,no bias)."""

    out_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, coords):
        h = Dense(512, dtype=self.dtype, name="fc1")(coords)
        h = nn.relu(h)
        return Dense(self.out_dim, use_bias=False, dtype=self.dtype, name="fc2")(h)


class PosEmbMLPSwinv2D(nn.Module):
    """Log-CPB relative bias (map_fastervit.py:211-308). Returns the
    (heads, seq, seq) additive bias; carrier-token rows/cols are zero-padded
    (ct_correct=False path, the one the released models use)."""

    window_size: int
    num_heads: int
    seq_length: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self):
        ws = self.window_size
        rng = np.arange(-(ws - 1), ws, dtype=np.float32)
        table = np.stack(np.meshgrid(rng, rng, indexing="ij"), axis=-1)  # (2w-1,2w-1,2)
        table = table / (ws - 1)
        table *= 8.0
        table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8)

        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
        flat = coords.reshape(2, -1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.transpose(1, 2, 0)
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        idx = rel.sum(-1).reshape(-1)

        bias_table = CPBMlp(self.num_heads, dtype=self.dtype, name="cpb_mlp")(
            jnp.asarray(table).reshape(-1, 2))  # ((2w-1)^2, heads)
        bias = bias_table[idx].reshape(ws * ws, ws * ws, self.num_heads)
        bias = 16.0 * jax.nn.sigmoid(bias.transpose(2, 0, 1))  # (heads, n, n)
        pad = self.seq_length - ws * ws
        if pad > 0:
            bias = jnp.pad(bias, ((0, 0), (pad, 0), (pad, 0)))
        return bias


class PosEmbMLPSwinv1D(nn.Module):
    """MLP absolute position embedding over a sqrt(seq) x sqrt(seq) grid
    (map_fastervit.py:311-366, rank=2 path)."""

    dim: int
    seq_length: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        s = int(self.seq_length ** 0.5)
        grid = np.stack(np.meshgrid(np.arange(s, dtype=np.float32),
                                    np.arange(s, dtype=np.float32), indexing="ij"))
        grid = (grid - s // 2) / (s // 2)
        coords = jnp.asarray(grid.reshape(2, -1).T)  # (seq, 2)
        pos = CPBMlp(self.dim, dtype=self.dtype, name="cpb_mlp")(coords)
        return x + pos[None].astype(x.dtype)


class WindowAttention(nn.Module):
    """MHSA with Swinv2D log-CPB bias (map_fastervit.py:514-568)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    resolution: int = 0
    seq_length: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        # channel-slice qkv split with heads inner (channel order [3, h, d]
        # makes a last-dim slice the 3-axis index): avoids the stacked
        # (3,B,h,n,d) relayout and the output transpose — same formulation
        # as ops/window_attention.AttentionCl (+10.7% on the maxvit train
        # step; receipts there)
        q = qkv[..., :self.dim].reshape(b, n, h, d)
        k = qkv[..., self.dim:2 * self.dim].reshape(b, n, h, d)
        v = qkv[..., 2 * self.dim:].reshape(b, n, h, d)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5)
        bias = PosEmbMLPSwinv2D(self.resolution, h, self.seq_length,
                                dtype=self.dtype, name="pos_emb_funct")()
        attn = attn + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        out = Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class ConvBlock(nn.Module):
    """conv3x3+BN+GELU+conv3x3+BN residual (map_fastervit.py:471-511)."""

    dim: int
    drop_path: float = 0.0
    layer_scale: Optional[float] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        ura = not training
        h = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                    dtype=self.dtype, kernel_init=trunc_normal_init(), name="conv1")(x)
        h = BatchNorm(dtype=self.dtype, name="norm1")(h, use_running_average=ura)
        # training-mode fast GELU (nn.layers.resolve_act); eval = exact erf
        h = resolve_act(gelu, ura)(h)
        h = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                    dtype=self.dtype, kernel_init=trunc_normal_init(), name="conv2")(h)
        h = BatchNorm(dtype=self.dtype, name="norm2")(h, use_running_average=ura)
        if self.layer_scale is not None:
            gamma = self.param("gamma", nn.initializers.constant(self.layer_scale),
                               (self.dim,), jnp.float32)
            h = h * gamma.astype(h.dtype)
        return x + DropPath(self.drop_path)(h, deterministic=not training)


class HAT(nn.Module):
    """Hierarchical attention block (map_fastervit.py:571-705)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    sr_ratio: int = 1
    window_size: int = 7
    last: bool = False
    layer_scale: Optional[float] = None
    ct_size: int = 1
    do_propagation: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, ct, *, training: bool = False):
        det = not training
        ws = self.window_size
        n_win_tokens = ws * ws
        use_ls = self.layer_scale is not None

        def gamma(name):
            if use_ls:
                return self.param(name, nn.initializers.constant(self.layer_scale),
                                  (self.dim,), jnp.float32)
            return jnp.ones((), jnp.float32)

        x = PosEmbMLPSwinv1D(self.dim, n_win_tokens, dtype=self.dtype, name="pos_embed")(x)

        dp = DropPath(self.drop_path)
        if self.sr_ratio > 1:
            ct_span = self.ct_size * self.sr_ratio
            bg, ng, hg = ct.shape
            ct = ct_dewindow(ct, ct_span, self.ct_size)
            ct = PosEmbMLPSwinv1D(self.dim, ct_span * ct_span, dtype=self.dtype,
                                  name="hat_pos_embed")(ct)
            a = WindowAttention(self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                                attn_drop=self.attn_drop, proj_drop=self.drop,
                                resolution=ct_span, seq_length=ct_span * ct_span,
                                dtype=self.dtype, name="hat_attn")(
                LayerNorm(epsilon=1e-5, dtype=self.dtype, name="hat_norm1")(ct), deterministic=det)
            g1 = gamma("gamma1")
            ct = ct + dp(g1.astype(a.dtype) * a, deterministic=det)
            m = Mlp(hidden_features=int(self.dim * self.mlp_ratio), act=gelu, drop=self.drop,
                    dtype=self.dtype, name="hat_mlp")(
                LayerNorm(epsilon=1e-5, dtype=self.dtype, name="hat_norm2")(ct), deterministic=det)
            ct = ct + dp(gamma("gamma2").astype(m.dtype) * m, deterministic=det)
            ct = ct_window(ct, ct_span, self.ct_size)
            ct = ct.reshape(x.shape[0], -1, self.dim)  # (B*nw, ct^2, C)
            x = jnp.concatenate([ct, x], axis=1)

        a = WindowAttention(self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                            attn_drop=self.attn_drop, proj_drop=self.drop,
                            resolution=ws,
                            seq_length=n_win_tokens + (self.ct_size ** 2 if self.sr_ratio > 1 else 0),
                            dtype=self.dtype, name="attn")(
            LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x), deterministic=det)
        x = x + dp(gamma("gamma3").astype(a.dtype) * a, deterministic=det)
        m = Mlp(hidden_features=int(self.dim * self.mlp_ratio), act=gelu, drop=self.drop,
                dtype=self.dtype, name="mlp")(
            LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), deterministic=det)
        x = x + dp(gamma("gamma4").astype(m.dtype) * m, deterministic=det)

        if self.sr_ratio > 1:
            ctr, x = x[:, :-n_win_tokens], x[:, -n_win_tokens:]
            ct = ctr.reshape(bg, ng, hg)
            if self.last and self.do_propagation:
                # upsample carrier tokens (nearest) into the window image space
                # (map_fastervit.py:699-704)
                bw = ctr.shape[0]
                ci = ctr.reshape(bw, self.ct_size, self.ct_size, self.dim).astype(jnp.float32)
                rep = ws // self.ct_size + (1 if ws % self.ct_size else 0)
                ci = jnp.repeat(jnp.repeat(ci, rep, axis=1), rep, axis=2)[:, :ws, :ws]
                x = x + g1.astype(x.dtype) * ci.reshape(bw, n_win_tokens, self.dim).astype(x.dtype)
        return x, ct


class TokenInitializer(nn.Module):
    """Pool carrier tokens per window (map_fastervit.py:708-743)."""

    dim: int
    input_resolution: int
    window_size: int
    ct_size: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        out_size = int(self.ct_size * self.input_resolution / self.window_size)
        stride = self.input_resolution // out_size
        kernel = self.input_resolution - (out_size - 1) * stride
        c = x.shape[-1]
        h = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=c,
                    use_bias=True, dtype=self.dtype, kernel_init=trunc_normal_init(),
                    name="pos_embed")(x)
        h = nn.avg_pool(h, (kernel, kernel), strides=(stride, stride))
        b = h.shape[0]
        ct = h.reshape(b, out_size // self.ct_size, self.ct_size,
                       out_size // self.ct_size, self.ct_size, c)
        ct = ct.transpose(0, 1, 3, 2, 4, 5).reshape(b, out_size * out_size, c)
        return ct


class FasterViT(nn.Module):
    """reference: map_fastervit.py:851-1005."""

    dim: int = 128
    in_dim: int = 64
    depths: Sequence[int] = (3, 3, 12, 5)
    window_size: Sequence[int] = (7, 7, 7, 7)
    ct_size: int = 2
    mlp_ratio: float = 4.0
    num_heads: Sequence[int] = (2, 4, 8, 16)
    resolution: int = 224
    drop_path_rate: float = 0.2
    num_classes: int = 1000
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    layer_scale: Optional[float] = None
    layer_scale_conv: Optional[float] = None
    hat: Sequence[bool] = (False, False, True, False)
    do_propagation: bool = False
    use_map: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False, pre_logits: bool = False):
        ura = not training
        # PatchEmbed (map_fastervit.py:442-468): BN eps 1e-4 + ReLU, twice
        x = nn.Conv(self.in_dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, kernel_init=trunc_normal_init(),
                    name="patch_embed_conv0")(x)
        x = nn.relu(BatchNorm(epsilon=1e-4, dtype=self.dtype, name="patch_embed_bn0")(
            x, use_running_average=ura))
        x = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, kernel_init=trunc_normal_init(),
                    name="patch_embed_conv1")(x)
        x = nn.relu(BatchNorm(epsilon=1e-4, dtype=self.dtype, name="patch_embed_bn1")(
            x, use_running_average=ura))

        features = [x]
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        offs = np.concatenate([[0], np.cumsum(self.depths)])
        for i, depth in enumerate(self.depths):
            dim_i = int(self.dim * 2 ** i)
            res = self.resolution // (4 * 2 ** i)
            ws = self.window_size[i]
            conv_stage = i in (0, 1)
            if conv_stage:
                for j in range(depth):
                    x = ConvBlock(dim_i, drop_path=float(dpr[offs[i] + j]),
                                  layer_scale=self.layer_scale_conv, dtype=self.dtype,
                                  name=f"levels_{i}_blocks_{j}")(x, training=training)
            else:
                only_local = not self.hat[i]
                sr_ratio = res // ws if not only_local else 1
                do_gt = (not only_local) and (res // ws > 1)
                ct = TokenInitializer(dim_i, res, ws, ct_size=self.ct_size,
                                      dtype=self.dtype, name=f"levels_{i}_global_tokenizer")(x) \
                    if do_gt else None
                b, hh, ww_, c = x.shape
                t = window_partition_tokens(x, ws)
                for j in range(depth):
                    t, ct = HAT(dim_i, num_heads=self.num_heads[i], mlp_ratio=self.mlp_ratio,
                                qkv_bias=self.qkv_bias, drop=self.drop_rate,
                                attn_drop=self.attn_drop_rate,
                                drop_path=float(dpr[offs[i] + j]), sr_ratio=sr_ratio,
                                window_size=ws, last=j == depth - 1,
                                layer_scale=self.layer_scale, ct_size=self.ct_size,
                                do_propagation=self.do_propagation, dtype=self.dtype,
                                name=f"levels_{i}_blocks_{j}")(t, ct, training=training)
                x = window_reverse_tokens(t, ws, hh, ww_)
            if i < 3:
                x = LayerNorm(dtype=self.dtype, name=f"levels_{i}_downsample_norm")(x)
                x = nn.Conv(dim_i * 2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                            use_bias=False, dtype=self.dtype, kernel_init=trunc_normal_init(),
                            name=f"levels_{i}_downsample_conv")(x)
            features.append(x)

        if self.use_map:
            channels = [self.dim, self.dim * 2, self.dim * 4, self.dim * 8, self.dim * 8]
            head = MAPHead(
                multi_scale_level=3, channels=channels, last_dim=384, n_tokens=3,
                n_groups=5, self_distill_token=True, non_linearity=gelu, gram=True,
                bp_dim=384, bp_groups=1, gram_group=32, gram_dim=384, num_heads=32,
                ca_dim=384, mlp_ratio=4, mlp_groups=2, interactive=True,
                head_fn="linear", fc_drop=self.drop_rate, num_classes=self.num_classes,
                dtype=self.dtype, name="head",
            )
            return head(features, training=training, pre_logits=pre_logits)
        x = BatchNorm(dtype=self.dtype, name="norm")(x, use_running_average=ura)
        x = jnp.mean(x, axis=(1, 2))
        return Dense(self.num_classes, dtype=self.dtype, name="head")(x)


FASTERVIT_RULES = [
    (r"^patch_embed\.conv_down\.0$", "patch_embed_conv0"),
    (r"^patch_embed\.conv_down\.1$", "patch_embed_bn0"),
    (r"^patch_embed\.conv_down\.3$", "patch_embed_conv1"),
    (r"^patch_embed\.conv_down\.4$", "patch_embed_bn1"),
    (r"^levels\.(\d)\.blocks\.(\d+)\.", r"levels_\1_blocks_\2."),
    (r"^levels\.(\d)\.downsample\.norm$", r"levels_\1_downsample_norm"),
    (r"^levels\.(\d)\.downsample\.reduction\.0$", r"levels_\1_downsample_conv"),
    # TokenInitializer's dw conv registered twice in torch; map one, drop dup
    (r"^levels\.(\d)\.global_tokenizer\.pos_embed$", r"levels_\1_global_tokenizer.pos_embed"),
    (r"cpb_mlp\.0$", "cpb_mlp.fc1"),
    (r"cpb_mlp\.2$", "cpb_mlp.fc2"),
] + MAP_HEAD_RULES

register_torch_rules(
    "*faster_vit*", FASTERVIT_RULES,
    drop=[r"bp_index$", r"relative_coords_table$", r"relative_position_index$",
          r"relative_bias$", r"to_global_feature"])

FASTERVIT_REVERSE = [
    (r"^patch_embed_conv0", "patch_embed.conv_down.0"),
    (r"^patch_embed_bn0", "patch_embed.conv_down.1"),
    (r"^patch_embed_conv1", "patch_embed.conv_down.3"),
    (r"^patch_embed_bn1", "patch_embed.conv_down.4"),
    (r"^levels_(\d)_blocks_(\d+)\.", r"levels.\1.blocks.\2."),
    (r"^levels_(\d)_downsample_norm", r"levels.\1.downsample.norm"),
    (r"^levels_(\d)_downsample_conv", r"levels.\1.downsample.reduction.0"),
    (r"^levels_(\d)_global_tokenizer\.pos_embed", r"levels.\1.global_tokenizer.pos_embed"),
    (r"cpb_mlp\.fc1", "cpb_mlp.0"),
    (r"cpb_mlp\.fc2", "cpb_mlp.2"),
] + MAP_HEAD_REVERSE

register_reverse_rules(
    "*faster_vit*", FASTERVIT_REVERSE,
    # TokenInitializer.pos_embed is also registered as to_global_feature.pos
    # (map_fastervit.py:732-735) — a reference state_dict carries both keys
    aliases=[(r"(global_tokenizer)\.pos_embed\.", r"\1.to_global_feature.pos.")])


@register_model
def faster_vit_3_224(**kwargs):
    """reference: map_fastervit.py:1008-1040."""
    kwargs.pop("drop", None)
    return FasterViT(dim=128, in_dim=64, depths=(3, 3, 12, 5), num_heads=(2, 4, 8, 16),
                     window_size=(7, 7, 7, 7), ct_size=2, mlp_ratio=4,
                     layer_scale=1e-5, do_propagation=True,
                     drop_path_rate=kwargs.pop("drop_path_rate", 0.3),
                     num_classes=kwargs.pop("num_classes", 1000), **kwargs)


@register_model
def map_faster_vit_3_224(**kwargs):
    """reference: map_fastervit.py:1043-1081."""
    kwargs.pop("drop", None)
    return FasterViT(dim=128, in_dim=64, depths=(3, 3, 12, 5), num_heads=(2, 4, 8, 16),
                     window_size=(7, 7, 7, 7), ct_size=2, mlp_ratio=4,
                     layer_scale=1e-5, do_propagation=True, use_map=True,
                     drop_path_rate=kwargs.pop("drop_path_rate", 0.3),
                     num_classes=kwargs.pop("num_classes", 1000), **kwargs)


# Reference default for faster_vit_3_224 is crop_pct=1.0, crop_mode='center'
# (map_fastervit.py:43-46); the README golden run passes --crop-pct 0.95 on
# the CLI. map_ resolves the same 'faster_vit_3_224' cfg (:1057).
for _n in ("faster_vit_3_224", "map_faster_vit_3_224"):
    register_default_cfg(_n, {"crop_pct": 1.0, "crop_mode": "center",
                              "interpolation": "bicubic"})
