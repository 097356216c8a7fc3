"""MAP head library: Gram-token seeded multi-token class-attention pooling.

TPU-native re-implementation of the reference's reusable pooling library
(/root/reference/MAP/models/map.py — the "download map.py and replace your
pooling" core of the WACV 2025 paper). Semantics are matched 1:1 (verified by
parity tests against the torch module); the implementation is channels-last,
runs the Gram bilinear pooling as a single fp32 MXU einsum (replacing the
reference's fp64-upcast-at-small-batch hack, map.py has none but GA does at
/root/reference/GA/ga_convnext.py:456-457), and expresses grouped 1x1 convs as
grouped einsum denses.

Module/parameter names intentionally mirror the torch attribute names so the
checkpoint converter (imagenet_models_tpu.ckpt.torch_convert) is a pure
name-map + transpose.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from imagenet_models_tpu.nn.layers import (
    BatchNorm,
    ConvNormAct,
    Dense,
    GroupConvMlp,
    GroupedDense,
    LayerNorm,
    Mlp,
    gelu,
    scale_features,
    trunc_normal_init,
)

Dtype = Any


def average_head_logits(out) -> jnp.ndarray:
    """The multi-head eval contract: mean of per-branch logits in fp32
    (reference: /root/reference/MAP/validate.py:275-279). Single source of
    truth shared by the eval step, the serving export, and its selftest."""
    if isinstance(out, (tuple, list)):
        return sum(o.astype(jnp.float32) for o in out) / len(out)
    return out.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _triu_take(gflat: jnp.ndarray, c: int) -> jnp.ndarray:
    """Upper-triangle extraction from a flattened (B, C*C) gram matrix.

    Custom VJP: autodiff would emit a scatter-add into the (B, C*C) gram
    cotangent — TPU scatters serialize; the map_maxvit train-step profile
    charged 0.92ms x n_groups per step to them. The indices are STATIC and
    unique, so the backward is a plain inverse gather times a 0/1 mask."""
    iu0, iu1 = np.triu_indices(c)
    return gflat[:, iu0 * c + iu1]


def _triu_take_fwd(gflat, c):
    return _triu_take(gflat, c), None


def _triu_take_bwd(c, _res, dflat):
    iu0, iu1 = np.triu_indices(c)
    idx = iu0 * c + iu1
    inv = np.zeros(c * c, np.int32)
    inv[idx] = np.arange(idx.size, dtype=np.int32)
    mask = np.zeros(c * c, np.float32)
    mask[idx] = 1.0
    dg = dflat[:, inv] * jnp.asarray(mask, dflat.dtype)
    return (dg,)


_triu_take.defvjp(_triu_take_fwd, _triu_take_bwd)


def gram_triu_normalize(x: jnp.ndarray, scale: float, interleave: int = 1) -> jnp.ndarray:
    """Fused Gram-matrix -> upper-triangle -> L2-normalize.

    x: (B, N, C) tokens. Returns (B, C*(C+1)//2), L2-normalized, optionally
    token-interleaved for a following grouped projection
    (reference: /root/reference/MAP/models/map.py:210-227).

    The matmul runs in fp32 at HIGHEST precision on the MXU; with the
    subsequent L2 normalization this matches the reference's fp64 path to well
    below bf16 resolution (the global scale cancels in the normalize).

    bf16 fast path: when the activations are already bf16 (the production
    compute dtype), a single-pass MXU matmul with fp32 accumulation computes
    every product EXACTLY (bf16*bf16 is exact in fp32) — identical numerics
    to the 6-pass HIGHEST decomposition at 1/6th the MXU cost. The 1/(h*w)
    scale moves after the product (s*x)'(s*x) == s^2 * x'x, avoiding
    non-representable pre-scaled inputs.
    """
    b, n, c = x.shape
    dims = (((1,), (1,)), ((0,), (0,)))
    if x.dtype == jnp.bfloat16:
        gram = jax.lax.dot_general(x, x, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)
        gram = gram * jnp.float32(scale * scale)
    else:
        xf = x.astype(jnp.float32) * scale
        gram = jax.lax.dot_general(
            xf, xf,
            dimension_numbers=dims,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (B, C, C)
    flat = _triu_take(gram.reshape(b, c * c), c)
    norm = jnp.sqrt(jnp.sum(jnp.square(flat), axis=-1, keepdims=True))
    flat = flat / jnp.maximum(norm, 1e-12)
    if interleave > 1:
        g = flat.shape[-1]
        flat = flat.reshape(b, g // interleave, interleave)
        flat = jnp.swapaxes(flat, -1, -2).reshape(b, g)
    return flat


class GramToken(nn.Module):
    """Gram-matrix class-token extraction
    (reference: /root/reference/MAP/models/map.py:187-234).

    NHWC in, (B, num_tokens, out_dim) class tokens out.
    """

    ch_dim: int
    num_groups: int = 8
    num_tokens: int = 1
    bp_groups: int = 1
    bp_dim: int = 192
    out_dim: Optional[int] = None
    gram_blk: Optional[Callable[..., nn.Module]] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        out_dim = self.out_dim or self.ch_dim
        ura = not training
        # ch_reduction: grouped 1x1 conv + BN (map.py:197-200)
        h = ConvNormAct(self.bp_dim, 1, groups=self.bp_groups, act=None,
                        dtype=self.dtype, name="ch_reduction")(x, use_running_average=ura)
        if self.gram_blk is not None:
            h = self.gram_blk(name="gram_blk")(h, training=training)
        b, hh, ww, c = h.shape
        tokens = h.reshape(b, hh * ww, c)
        # map.py:217 divides activations by (h*w) before the product.
        flat = gram_triu_normalize(tokens, scale=1.0 / (hh * ww), interleave=self.num_tokens)
        # bp_reduction: grouped 1x1 conv + BN on the (B, gram_dim) "1x1 image"
        flat = GroupedDense(out_dim * self.num_tokens, groups=self.num_groups,
                            use_bias=False, dtype=self.dtype, name="bp_reduction")(flat)
        flat = BatchNorm(dtype=self.dtype, name="bp_bn")(flat, use_running_average=ura)
        # (B, out_dim * nt) -> (B, nt, out_dim): token t takes channels [t::nt]
        # in out_dim-major order (map.py:231-233).
        cls = flat.reshape(b, out_dim, self.num_tokens)
        return jnp.swapaxes(cls, -1, -2)


class ClassAttention(nn.Module):
    """Multi-token class attention with optional interactive head mixing
    (reference: /root/reference/MAP/models/map.py:69-144).
    """

    in_dim: int
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    n_tokens: int = 1
    embed_dim: int = 128
    interactive: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        e = self.embed_dim
        h = self.num_heads
        d = e // h
        scale = self.qk_scale or d ** -0.5
        dim_mismatch = self.in_dim != self.dim

        def heads_of(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, d).transpose(0, 2, 1, 3)  # (B, h, n, d)

        if dim_mismatch:
            cls, img = x
            q = heads_of(Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(cls)) * scale
            # NB: reference concatenates k(cls) before k(img) (map.py:110-116).
            k = jnp.concatenate([
                heads_of(Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="k1")(cls)),
                heads_of(Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="k2")(img)),
            ], axis=-2)
            v = jnp.concatenate([
                heads_of(Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="v1")(cls)),
                heads_of(Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="v2")(img)),
            ], axis=-2)
            b = img.shape[0]
        else:
            cls = x[:, : self.n_tokens]
            q = heads_of(Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(cls)) * scale
            k = heads_of(Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="k")(x))
            v = heads_of(Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(x))
            b = x.shape[0]

        attn = jnp.einsum("bhtd,bhnd->bhtn", q, k)
        if self.interactive:
            # learned mixing over the head axis, pre-softmax (map.py:130-131)
            w1 = Dense(h, dtype=self.dtype, name="w1")
            attn = attn + jnp.moveaxis(w1(jnp.moveaxis(attn, 1, -1)), -1, 1)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
        if self.interactive:
            # post-softmax additive mixing, not re-normalized (map.py:135-136)
            w2 = Dense(h, dtype=self.dtype, name="w2")
            attn = attn + jnp.moveaxis(w2(jnp.moveaxis(attn, 1, -1)), -1, 1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        out = jnp.einsum("bhtn,bhnd->bhtd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, self.n_tokens, e)
        out = Dense(self.dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class CABlock(nn.Module):
    """Class-attention block: CA + grouped MLP with pre-norms
    (reference: /root/reference/MAP/models/map.py:147-184)."""

    in_dim: int
    dim: int
    num_heads: int = 32
    mlp_ratio: float = 4.0
    groups: int = 2
    qkv_bias: bool = True
    drop: float = 0.05
    attn_drop: float = 0.05
    act: Callable = gelu
    n_tokens: int = 1
    ca_dim: Optional[int] = None
    interactive: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x_cls, x_img = x
        dim_mismatch = self.in_dim != self.dim
        attn = ClassAttention(
            self.in_dim, self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop, n_tokens=self.n_tokens,
            embed_dim=self.ca_dim or self.dim, interactive=self.interactive,
            dtype=self.dtype, name="attn")
        if dim_mismatch:
            a = attn((LayerNorm(dtype=self.dtype, name="norm1_1")(x_cls), LayerNorm(dtype=self.dtype, name="norm1_2")(x_img)),
                     deterministic=deterministic)
            x_cls = a  # no residual on the mismatch path (map.py:174-177)
        else:
            u = jnp.concatenate([x_cls, x_img], axis=1)
            x_cls = x_cls + attn(LayerNorm(dtype=self.dtype, name="norm1")(u), deterministic=deterministic)
        x_cls = x_cls + GroupConvMlp(
            hidden_features=int(self.dim * self.mlp_ratio), act=self.act, drop=self.drop,
            groups=self.groups, dtype=self.dtype, name="mlp",
        )(LayerNorm(dtype=self.dtype, name="norm2")(x_cls), deterministic=deterministic)
        return x_cls, x_img


class CAP(nn.Module):
    """Class-attention pooling over one feature map, gram- or learned-token
    seeded (reference: /root/reference/MAP/models/map.py:237-278)."""

    last_dim: int = 1024
    num_heads: int = 8
    mlp_ratio: float = 4.0
    mlp_groups: int = 2
    n_layers: int = 1
    n_tokens: int = 1
    distill_tokens: int = 0
    attn_drop: float = 0.0
    self_distill_token: bool = False
    act: Callable = gelu
    gram: bool = False
    gram_group: int = 8
    bp_groups: int = 1
    gram_dim: Optional[int] = None
    bp_dim: int = 192
    gram_blk: Optional[Callable[..., nn.Module]] = None
    ca_dim: Optional[int] = None
    interactive: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        cls_tokens = self.n_tokens + self.distill_tokens
        all_tokens = cls_tokens + (1 if self.self_distill_token else 0)
        gram_dim = self.gram_dim or self.last_dim

        if self.gram:
            x_cls = GramToken(
                self.last_dim, num_groups=self.gram_group, num_tokens=self.n_tokens,
                bp_groups=self.bp_groups, bp_dim=self.bp_dim, out_dim=gram_dim,
                gram_blk=self.gram_blk, dtype=self.dtype, name="gram_token_extraction",
            )(x, training=training)
            if self.distill_tokens > 0:
                # learned distill tokens appended after the gram tokens (the
                # reference's gram path never wires distill_tokens — map.py:266
                # yields n_tokens only, leaving the distill loss branch at
                # MAP/train.py:797-806 unreachable; resolved here with
                # zero-init learned tokens, the non-gram convention map.py:262)
                dst = self.param("x_distill", nn.initializers.zeros_init(),
                                 (1, self.distill_tokens, gram_dim), jnp.float32)
                dst = jnp.broadcast_to(dst, (x.shape[0],) + dst.shape[1:]).astype(x_cls.dtype)
                x_cls = jnp.concatenate([x_cls, dst], axis=1)
        else:
            x_cls = self.param("x_cls", nn.initializers.zeros_init(),
                               (1, cls_tokens, self.last_dim), jnp.float32)
            x_cls = jnp.broadcast_to(x_cls, (x.shape[0],) + x_cls.shape[1:]).astype(x.dtype)

        b, h, w, c = x.shape
        img = x.reshape(b, h * w, c)

        if self.self_distill_token:
            adv = jnp.mean(x_cls, axis=1, keepdims=True)
            x_cls = jnp.concatenate([x_cls, adv], axis=1)

        for i in range(self.n_layers):
            x_cls, img = CABlock(
                gram_dim, self.last_dim, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                groups=self.mlp_groups, act=self.act, n_tokens=all_tokens,
                attn_drop=self.attn_drop, ca_dim=self.ca_dim, interactive=self.interactive,
                dtype=self.dtype, name=f"attention_{i}",
            )((x_cls, img), deterministic=not training)
        return x_cls.reshape(b, all_tokens * self.last_dim)


class MultiScale(nn.Module):
    """Pyramid fusion: every level resized to level `multi_scale_level`, concat,
    1x1 ConvNormAct (reference: /root/reference/MAP/models/map.py:311-333)."""

    multi_scale_level: int
    out_dim: int
    act: Callable = nn.relu
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], *, training: bool = False):
        target = features[self.multi_scale_level].shape[1:3]
        scaled = [scale_features(f, target) for f in features]
        x = jnp.concatenate(scaled, axis=-1)
        return ConvNormAct(self.out_dim, 1, act=self.act, dtype=self.dtype,
                           name="concat_conv")(x, use_running_average=not training)


class MAP(nn.Module):
    """n_groups parallel CAPs over the fused multi-scale feature
    (reference: /root/reference/MAP/models/map.py:336-376)."""

    multi_scale_level: int = 0
    channels: Sequence[int] = (64, 256, 512, 1024, 2048)
    last_dim: int = 1024
    non_linearity: Callable = nn.relu
    gram: bool = False
    gram_group: int = 16
    bp_groups: int = 1
    gram_blk: Optional[Callable[..., nn.Module]] = None
    bp_dim: int = 192
    gram_dim: Optional[int] = None
    num_heads: int = 8
    mlp_ratio: float = 2.0
    mlp_groups: int = 1
    n_layers: int = 1
    n_tokens: int = 1
    distill_tokens: int = 0
    self_distill_token: bool = False
    attn_drop: float = 0.0
    act: Callable = gelu
    ca_dim: Optional[int] = None
    n_groups: int = 1
    interactive: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        use_multi_scale = self.multi_scale_level > 0
        if use_multi_scale:
            x = MultiScale(self.multi_scale_level, self.last_dim, act=self.non_linearity,
                           dtype=self.dtype, name="multi_scale")(x, training=training)
        else:
            x = x[-1]
            if x.shape[-1] != self.last_dim:
                x = ConvNormAct(self.last_dim, 1, act=nn.relu, dtype=self.dtype,
                                name="channel_convertor")(x, use_running_average=not training)
        outputs = []
        for g in range(self.n_groups):
            outputs.append(CAP(
                last_dim=self.last_dim, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                mlp_groups=self.mlp_groups, n_layers=self.n_layers, n_tokens=self.n_tokens,
                distill_tokens=self.distill_tokens, attn_drop=self.attn_drop,
                self_distill_token=self.self_distill_token, act=self.act, gram=self.gram,
                gram_group=self.gram_group, bp_groups=self.bp_groups, gram_blk=self.gram_blk,
                bp_dim=self.bp_dim, gram_dim=self.gram_dim, ca_dim=self.ca_dim,
                interactive=self.interactive, dtype=self.dtype, name=f"mmcap_{g}",
            )(x, training=training))
        return outputs


class Head(nn.Module):
    """Dropout + Linear (reference: /root/reference/MAP/models/map.py:379-390)."""

    num_classes: int
    drop: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, pre_logits: bool = False):
        if pre_logits:
            return x
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return Dense(self.num_classes, dtype=self.dtype, name="head")(x)


class NormHead(nn.Module):
    """LayerNorm + Dropout + Linear
    (reference: /root/reference/MAP/models/map.py:393-412).

    pre_logits=True returns PER-TOKEN logits (B, nt, num_classes): the
    normalized features are split into nt chunks and each chunk is multiplied
    by its slice of the fc weight, NO bias (map.py:405-409) — the
    logit-extraction dump reconstructs full logits as sum-over-tokens plus
    the separately-dumped fc bias (MAP/validate.py:261-273)."""

    num_classes: int
    drop: float = 0.0
    nt: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, pre_logits: bool = False):
        from imagenet_models_tpu.nn.param_holder import ParamHolder

        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        b, c = x.shape
        hp = ParamHolder([("kernel", (c, self.num_classes), trunc_normal_init()),
                          ("bias", (self.num_classes,), nn.initializers.zeros_init())],
                         name="head")()
        kernel, bias = hp["kernel"], hp["bias"]
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel, bias = kernel.astype(self.dtype), bias.astype(self.dtype)
        if pre_logits:
            xs = x.reshape(b, self.nt, c // self.nt)
            w = kernel.reshape(self.nt, c // self.nt, self.num_classes)
            return jnp.einsum("btc,tcn->btn", xs, w)
        return x @ kernel + bias


class SplitNormHead(nn.Module):
    """Per-token LayerNorm+Linear, summed
    (reference: /root/reference/MAP/models/map.py:415-442)."""

    num_classes: int
    drop: float = 0.0
    nt: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, pre_logits: bool = False):
        b, c = x.shape
        xs = x.reshape(b, self.nt, c // self.nt)
        out = 0
        for i in range(self.nt):
            s = LayerNorm(dtype=self.dtype, name=f"norm_{i}")(xs[:, i])
            s = nn.Dropout(self.drop)(s, deterministic=deterministic)
            out = out + Dense(self.num_classes, dtype=self.dtype, name=f"head_{i}")(s)
        return out


class NormMlpHead(nn.Module):
    """LayerNorm + Linear + Tanh + Dropout + Linear
    (reference: /root/reference/MAP/models/map.py:445-459)."""

    num_classes: int
    drop: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, pre_logits: bool = False):
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = jnp.tanh(Dense(x.shape[-1], dtype=self.dtype, name="pre_logits")(x))
        if pre_logits:
            return x
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return Dense(self.num_classes, dtype=self.dtype, name="head")(x)


class MAPHead(nn.Module):
    """MAP + per-group heads (+ per-group self-distill heads)
    (reference: /root/reference/MAP/models/map.py:462-539).

    Training output: tuple of (org_logits, avg_logits) per group when
    self_distill_token, else tuple of logits. Eval output: tuple of logits
    (org heads, or self-distill heads in `light` mode).
    """

    channels: Sequence[int] = (64, 256, 512, 1024, 2048)
    last_dim: int = 512
    num_heads: int = 8
    multi_scale_level: int = 3
    n_tokens: int = 3
    n_groups: int = 4
    self_distill_token: bool = True
    distill_tokens: int = 0
    attn_drop: float = 0.05
    gram: bool = False
    gram_group: int = 8
    bp_groups: int = 1
    gram_blk: Optional[Callable[..., nn.Module]] = None
    bp_dim: int = 192
    gram_dim: Optional[int] = None
    mlp_ratio: float = 4.0
    mlp_groups: int = 2
    fc_drop: float = 0.0
    num_classes: int = 1000
    head_fn: str = "norm"  # norm | split_norm | norm_mlp | linear
    act: Callable = nn.relu
    non_linearity: Callable = nn.relu
    ca_dim: Optional[int] = None
    light: bool = False
    dropout: float = 0.0
    interactive: bool = False
    dtype: Optional[Dtype] = None

    def _make_head(self, i: int):
        out_ch = self.last_dim * self.n_tokens
        if self.head_fn == "norm":
            return NormHead(self.num_classes, self.fc_drop, nt=self.n_tokens,
                            dtype=self.dtype, name=f"heads_{i}")
        if self.head_fn == "split_norm":
            return SplitNormHead(self.num_classes, self.fc_drop, nt=self.n_tokens,
                                 dtype=self.dtype, name=f"heads_{i}")
        if self.head_fn == "norm_mlp":
            # fc_drop deliberately NOT passed: the reference's try/except head
            # construction (map.py head_fn(ch, nc, fc_drop, nt=nt) raises
            # TypeError for NormMlpHead) always builds it with drop=0
            return NormMlpHead(self.num_classes, 0.0, dtype=self.dtype,
                               name=f"heads_{i}")
        if self.head_fn == "linear":
            return Dense(self.num_classes, dtype=self.dtype, name=f"heads_{i}")
        raise ValueError(f"unknown head_fn {self.head_fn}")

    @nn.compact
    def __call__(self, features, *, training: bool = False, pre_logits: bool = False):
        out_ch = self.last_dim * self.n_tokens
        pools = MAP(
            multi_scale_level=self.multi_scale_level, channels=self.channels,
            last_dim=self.last_dim, num_heads=self.num_heads, n_tokens=self.n_tokens,
            n_groups=self.n_groups, self_distill_token=self.self_distill_token,
            distill_tokens=self.distill_tokens, attn_drop=self.attn_drop,
            mlp_ratio=self.mlp_ratio, mlp_groups=self.mlp_groups, act=self.act,
            gram=self.gram, gram_group=self.gram_group, bp_groups=self.bp_groups,
            gram_blk=self.gram_blk, bp_dim=self.bp_dim, gram_dim=self.gram_dim,
            non_linearity=self.non_linearity, ca_dim=self.ca_dim,
            interactive=self.interactive, dtype=self.dtype, name="mmcap",
        )(features, training=training)

        det = not training
        output = []
        for i in range(self.n_groups):
            head = self._make_head(i)

            def _apply(h, p):
                # pre_logits routes to each head's per-token path (the intent
                # of MAP/validate.py:255-273; the reference's MAPHead.forward
                # accepts pre_logits but drops it on the floor, map.py:514)
                if self.head_fn == "linear" and h is head:
                    return p if pre_logits else h(p)
                return h(p, deterministic=det, pre_logits=pre_logits)

            if self.self_distill_token:
                dst_ch = self.last_dim * self.distill_tokens
                org_pool = pools[i][:, :out_ch]
                dst_pool = pools[i][:, out_ch:out_ch + dst_ch] if dst_ch else None
                avg_pool = pools[i][:, out_ch + dst_ch:]
                dt_head = NormHead(self.num_classes, self.fc_drop, dtype=self.dtype,
                                   name=f"self_dt_heads_{i}")
                if training:
                    org_pool = nn.Dropout(self.dropout)(org_pool, deterministic=det)
                org_out = _apply(head, org_pool)
                avg_out = dt_head(avg_pool, deterministic=det)
                if dst_pool is not None:
                    # --distill-tokens path: per-group distill head over the
                    # extra tokens; training emits the 3-output form consumed
                    # by the distill loss branch (MAP/train.py:797-806)
                    dst_out = NormHead(self.num_classes, self.fc_drop,
                                       nt=self.distill_tokens, dtype=self.dtype,
                                       name=f"distill_heads_{i}")(dst_pool, deterministic=det)
                if training:
                    output.append((org_out, dst_out, avg_out) if dst_pool is not None
                                  else (org_out, avg_out))
                elif self.light:
                    output.append(avg_out)
                else:
                    output.append(org_out)
            else:
                output.append(_apply(head, pools[i]))
        return tuple(output)
