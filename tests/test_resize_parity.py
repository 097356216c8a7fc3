"""Resize/pool op parity vs torch — these ops gate top-1 parity (SURVEY hard
part #1): bilinear (no antialias, half-pixel), adaptive average pooling in
both directions, and the reference MultiScale routing rule."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from imagenet_models_tpu.nn.layers import adaptive_avg_pool, resize_bilinear, scale_features  # noqa: E402


def _nchw(a):
    return torch.from_numpy(a.transpose(0, 3, 1, 2))


@pytest.mark.parametrize("src,dst", [(4, 8), (7, 14), (4, 6), (16, 4), (14, 7)])
def test_bilinear_matches_torch(src, dst):
    a = np.random.default_rng(0).standard_normal((2, src, src, 5)).astype(np.float32)
    ref = F.interpolate(_nchw(a), size=(dst, dst), mode="bilinear").numpy()
    out = np.asarray(resize_bilinear(jnp.asarray(a), (dst, dst))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-6)


@pytest.mark.parametrize("src,dst", [(56, 14), (28, 14), (13, 4), (2, 4), (3, 7)])
def test_adaptive_pool_matches_torch(src, dst):
    a = np.random.default_rng(1).standard_normal((2, src, src, 3)).astype(np.float32)
    ref = F.adaptive_avg_pool2d(_nchw(a), (dst, dst)).numpy()
    out = np.asarray(adaptive_avg_pool(jnp.asarray(a), (dst, dst))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_scale_features_reference_routing():
    """map.py:326-330: smaller-than-target -> adaptive pool (duplication),
    larger -> bilinear interpolate."""
    target = 4
    small = np.random.default_rng(2).standard_normal((1, 2, 2, 3)).astype(np.float32)
    big = np.random.default_rng(3).standard_normal((1, 16, 16, 3)).astype(np.float32)
    out_s = np.asarray(scale_features(jnp.asarray(small), (target, target)))
    ref_s = F.adaptive_avg_pool2d(_nchw(small), (target, target)).numpy()
    np.testing.assert_allclose(out_s.transpose(0, 3, 1, 2), ref_s, atol=2e-6)
    out_b = np.asarray(scale_features(jnp.asarray(big), (target, target)))
    ref_b = F.interpolate(_nchw(big), size=(target, target), mode="bilinear").numpy()
    np.testing.assert_allclose(out_b.transpose(0, 3, 1, 2), ref_b, atol=2e-6)
