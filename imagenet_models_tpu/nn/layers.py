"""Common NN building blocks, TPU-first (NHWC, channels-last token layout).

These are original Flax implementations of the layer semantics used by the
reference models (cited per class); layouts and groupings are re-designed for
XLA/TPU: grouped 1x1 convolutions become grouped einsum denses that map
directly onto the MXU, and all spatial ops run in NHWC (the TPU-native
layout), unlike the reference's NCHW + permute dance.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from imagenet_models_tpu.ops.batch_norm import use_fused_bn as _use_fused_bn

Dtype = Any

# torch nn.GELU defaults to the exact erf formulation; flax defaults to tanh
# approximation. Exact is required for checkpoint-level numerical parity.
gelu = partial(jax.nn.gelu, approximate=False)

# Fast GELU for the plain-XLA MLPs (transformer families): the same
# single-segment minimax fit that won +4.2% inside the Pallas LN+MLP kernel
# (ops/convnext_block.py — erf as z*P8((z/2.75)^2)+clamp, total err
# <= 1.3e-4, ~20x below bf16 output quantization). Here it replaces XLA's
# exact-erf lowering; measured on the full ga_cswin_tiny train step (v5e
# B=128, 2026-08-19): 694 vs 613 img/s (+13.2%). TRAINING-mode default via
# resolve_act below; eval keeps exact erf (checkpoint-interchange contract).
# IMTPU_XLA_GELU ('fast'|'exact') forces one impl for both modes.
_ERF_F8 = (1.128179019700242, -2.833873458377666, 6.288517611119356,
           -10.440794928636649, 12.424005344159935, -9.860067339137903,
           4.602827094685715, -0.9452048310751889)
_XLA_GELU_ENV = os.environ.get("IMTPU_XLA_GELU", "")


def gelu_fast(x):
    xf = x.astype(jnp.float32)
    a = jnp.minimum(jnp.abs(xf) * (2 ** -0.5), 2.75)
    u = jnp.square(a * (1.0 / 2.75))
    r = jnp.float32(_ERF_F8[-1])
    for c in _ERF_F8[-2::-1]:
        r = r * u + jnp.float32(c)
    erf = jnp.sign(xf) * (a * r)
    return (0.5 * xf * (1.0 + erf)).astype(x.dtype)


def resolve_act(act: Callable, deterministic: bool) -> Callable:
    """Mode-resolved activation: the default exact-erf GELU swaps to the
    fast fit when training (deterministic=False); any explicitly different
    activation is returned untouched."""
    if act is not gelu:
        return act
    impl = _XLA_GELU_ENV or ("exact" if deterministic else "fast")
    return gelu_fast if impl == "fast" else gelu


def trunc_normal_init(std: float = 0.02):
    """timm trunc_normal_(std=.02) analogue (cut at +-2, effectively normal)."""
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0 / std, upper=2.0 / std)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, *args, **kwargs):
        return x


class Dense(nn.Dense):
    """nn.Dense with timm-style default init (trunc normal 0.02, zero bias)."""

    kernel_init: Callable = trunc_normal_init()
    bias_init: Callable = nn.initializers.zeros_init()


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng=None) -> jnp.ndarray:
    """Stochastic depth per sample (reference: timm DropPath used throughout,
    e.g. /root/reference/GA/ga_convnext.py:96)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        return drop_path(x, self.rate, deterministic=False, rng=rng)


class LayerNorm(nn.LayerNorm):
    """LayerNorm over the trailing (channel) axis, eps matching torch models (1e-6)."""

    epsilon: float = 1e-6


# --split-bn (timm convert_splitbn_model, /root/reference/GA/train.py:439-441):
# under --aug-splits each BN normalizes every split with that split's OWN
# batch statistics, and only the clean split's statistics feed the running
# stats the eval path consumes (timm routes split 0 through the "main" BN and
# the rest through aux BNs whose running stats eval never reads). Trace-time
# global, set by the engine before jit (the aug-splits batch layout here is
# sample-major interleaved — split j = rows j mod s — see
# train/losses.py:jsd_cross_entropy's layout note; timm chunks block-major,
# the math is layout-invariant). Documented deviation: timm's aux BNs also
# carry their own affine scale/bias (trained separately per split); here the
# affine is shared across splits — aux affines are never consumed at eval and
# keeping the param tree split-invariant preserves checkpoint interchange.
_BN_SPLITS = 1


def set_bn_splits(n: int) -> None:
    global _BN_SPLITS
    _BN_SPLITS = max(int(n), 1)


def bn_splits() -> int:
    return _BN_SPLITS


_SPLIT_FALLBACK_WARNED: set = set()


def _warn_split_fallback(batch: int, splits: int) -> None:
    """Trace-time warning when --split-bn silently falls back to whole-batch
    statistics because the batch is not divisible by the split count (e.g.
    an unexpected tail batch). Trace-time is the right place: the shape is
    static per compilation, so each bad geometry warns exactly once with no
    in-graph cost."""
    if (batch, splits) not in _SPLIT_FALLBACK_WARNED:
        _SPLIT_FALLBACK_WARNED.add((batch, splits))
        import logging

        logging.getLogger(__name__).warning(
            "--split-bn: batch %d not divisible by %d aug-splits; BatchNorm "
            "falls back to whole-batch statistics for this shape (timm "
            "convert_splitbn_model would have rejected the layout).",
            batch, splits)


class BatchNorm(nn.Module):
    """BatchNorm over all axes but the last, torch-compatible semantics.

    torch BatchNorm2d: eps 1e-5, running stats with momentum 0.1 (new = 0.9*old
    + 0.1*batch), affine. Uses the 'batch_stats' collection. If `axis_name` is
    set and we are in training mode, batch statistics are psum-averaged across
    that mesh axis (SyncBN, reference --sync-bn /root/reference/GA/train.py:448-459).
    In training with `set_bn_splits(s>1)` (--split-bn + --aug-splits), batch
    statistics are computed per interleaved split (see _BN_SPLITS note above).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((features,), jnp.float32))

        splits = bn_splits() if not use_running_average else 1
        if splits > 1 and (self.is_initializing() or x.shape[0] % splits):
            if not self.is_initializing():
                _warn_split_fallback(x.shape[0], splits)
            splits = 1

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif splits > 1:
            # per-split statistics (--split-bn): rows are sample-major
            # interleaved, split j = rows j mod s, clean split j=0
            xf = x.astype(jnp.float32)
            xr = xf.reshape(x.shape[0] // splits, splits, *x.shape[1:])
            axes = (0,) + tuple(range(2, xr.ndim - 1))
            mean = jnp.mean(xr, axis=axes)                      # (s, C)
            mean2 = jnp.mean(jnp.square(xr), axis=axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = math.prod([xr.shape[i] for i in axes])
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                unbiased0 = var[0] * (n / max(n - 1, 1))
                # only the clean split feeds the running stats eval reads
                # (timm main-BN semantics)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean[0]
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased0
            bshape = (1, splits) + (1,) * (xr.ndim - 3) + (x.shape[-1],)
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            y = (xr - mean.reshape(bshape)) * inv.reshape(bshape) + bias
            return y.reshape(x.shape).astype(self.dtype or x.dtype)
        elif self.axis_name is None and not self.is_initializing() \
                and _use_fused_bn(x):
            # fused Pallas statistics (fwd sums + bwd reduces in one pass
            # each, ops/batch_norm.py) — the XLA convert_reduce BN-stat
            # fusions run far off the HBM roofline (round-4 profile receipts
            # in the module docstring); math identical to the branch below
            from imagenet_models_tpu.ops.batch_norm import bn_train_apply

            y, mean, var = bn_train_apply(x, scale, bias, self.epsilon,
                                          out_dtype=self.dtype or x.dtype)
            n = math.prod(x.shape[:-1])
            unbiased = var * (n / max(n - 1, 1))
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
            return y
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = math.prod([x.shape[i] for i in axes])
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                # torch tracks the *unbiased* variance in running stats.
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased

        dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(dtype)


class Mlp(nn.Module):
    """Token MLP: fc1 -> act -> drop -> fc2 -> drop
    (reference: /root/reference/MAP/models/map.py:9-28)."""

    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    act: Callable = gelu
    drop: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_f = x.shape[-1]
        hidden = self.hidden_features or in_f
        out = self.out_features or in_f
        x = Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = resolve_act(self.act, deterministic)(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = Dense(out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Channel shuffle on the trailing axis.

    torch variant operates on NCHW by splitting C into (C//g, g) and swapping
    (/root/reference/MAP/models/map.py:31-40); identical index permutation here
    on the channels-last axis.
    """
    *lead, c = x.shape
    assert c % groups == 0
    x = x.reshape(*lead, c // groups, groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(*lead, c)


class GroupedDense(nn.Module):
    """Grouped pointwise projection == torch grouped 1x1 Conv2d, as one einsum.

    Input (..., in_features); group g of the input maps to group g of the
    output (torch grouped-conv semantics). Runs as a single batched matmul on
    the MXU instead of a grouped convolution.
    """

    features: int
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Callable = trunc_normal_init()

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        g = self.groups
        assert in_f % g == 0 and self.features % g == 0, (in_f, self.features, g)
        kernel = self.param("kernel", self.kernel_init, (g, in_f // g, self.features // g), jnp.float32)
        dtype = self.dtype or x.dtype
        lead = x.shape[:-1]
        xg = x.reshape(*lead, g, in_f // g)
        y = jnp.einsum("...gi,gio->...go", xg.astype(dtype), kernel.astype(dtype))
        y = y.reshape(*lead, self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class GroupConvMlp(nn.Module):
    """Grouped-MLP over tokens with a channel shuffle between the two layers.

    Reference: /root/reference/MAP/models/map.py:43-66 (and the GA twin at
    /root/reference/GA/ga_convnext.py:190-222). The torch version routes
    (B, N, C) tokens through grouped 1x1 convs on (B, C, N, 1); here both
    layers are grouped einsum denses, channels-last.
    """

    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    act: Callable = nn.relu
    drop: float = 0.0
    groups: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_f = x.shape[-1]
        hidden = self.hidden_features or in_f
        out = self.out_features or in_f
        x = GroupedDense(hidden, groups=self.groups, dtype=self.dtype, name="fc1")(x)
        x = resolve_act(self.act, deterministic)(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = channel_shuffle(x, self.groups)
        x = GroupedDense(out, groups=self.groups, dtype=self.dtype, name="fc2")(x)
        return x


class ConvNormAct(nn.Module):
    """Conv (no bias) + BatchNorm + activation
    (reference: /root/reference/MAP/models/map.py:281-288)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: Any = 0
    groups: int = 1
    act: Optional[Callable] = nn.relu
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(),
            name="conv",
        )(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, use_running_average=use_running_average)
        if self.act is not None:
            # training-mode fast GELU (the same measured swap as Mlp /
            # GroupConvMlp); eval keeps exact erf — checkpoint contract
            x = resolve_act(self.act, use_running_average)(x)
        return x


class SEUnit(nn.Module):
    """Squeeze-excitation: GAP -> conv1x1+BN+act -> conv1x1 -> sigmoid -> scale
    (reference: /root/reference/MAP/models/map_resnet.py:33-42)."""

    reduction: int = 16
    act: Callable = gelu
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = ConvNormAct(c // self.reduction, 1, act=self.act, dtype=self.dtype, name="fc1")(
            s, use_running_average=use_running_average)
        s = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="fc2")(s)
        return x * jax.nn.sigmoid(s)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.adaptive_avg_pool2d semantics in NHWC.

    Bin i covers [floor(i*in/out), ceil((i+1)*in/out)). When in % out == 0 this
    is a plain uniform average pool, which XLA lowers to a reduce-window.
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h == oh and w == ow:
        return x
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        x = x.reshape(b, oh, kh, ow, kw, c)
        return x.mean(axis=(2, 4))
    # General case: matmul with the (sparse) averaging matrix per axis.
    def pool_matrix(n_in: int, n_out: int) -> jnp.ndarray:
        m = jnp.zeros((n_out, n_in), jnp.float32)
        for i in range(n_out):
            lo = (i * n_in) // n_out
            hi = -(-((i + 1) * n_in) // n_out)
            m = m.at[i, lo:hi].set(1.0 / (hi - lo))
        return m

    mh = pool_matrix(h, oh).astype(x.dtype)
    mw = pool_matrix(w, ow).astype(x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    x = jnp.einsum("ow,bhwc->bhoc", mw, x)
    return x


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize, NHWC, half-pixel centers, NO antialiasing — exactly
    torch F.interpolate(mode='bilinear', align_corners=False). Note torch
    never antialiases here, even when downsampling."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    return jax.image.resize(x, (b, oh, ow, c), method="bilinear", antialias=False).astype(x.dtype)


def scale_features(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Reference MultiScale resize rule (/root/reference/MAP/models/map.py:326-330).

    Counter-intuitive but load-bearing for checkpoint parity: features
    *smaller* than the target are upsampled with adaptive_avg_pool2d (which
    for out>in duplicates rows/cols), features *larger* than the target are
    downsampled with plain bilinear interpolation (no antialias).
    """
    h = x.shape[1]
    if h < out_hw[0]:
        return adaptive_avg_pool(x, out_hw)
    if h > out_hw[0]:
        return resize_bilinear(x, out_hw)
    return x
