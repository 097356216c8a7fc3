"""Aug-splits + JSD loss (reference: GA/train.py:433-441,554,560-561,613-615
via timm AugMixDataset / JsdCrossEntropy).

- Loss parity: jsd_cross_entropy vs the exact timm formula in torch
  (CE(clean) + alpha * mean_s KL(mixture ‖ split), batchmean), accounting for
  the layout difference (timm collates splits block-major; our loader
  interleaves sample-major so DP shards hold whole samples).
- Loader: batch carries batch_size*aug_splits rows, targets repeated, all
  splits of a sample share the primary crop, clean split skips secondary augs
  (and erasing under --resplit).
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from imagenet_models_tpu.data.dataset import SyntheticClassDataset
from imagenet_models_tpu.data.loader import DataLoader
from imagenet_models_tpu.data.transforms import TrainTransform
from imagenet_models_tpu.train import losses as L


def test_jsd_matches_timm_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    b, s, c = 6, 3, 11
    rng = np.random.default_rng(0)
    logits_bsc = rng.standard_normal((b, s, c)).astype(np.float32) * 2
    t = rng.integers(0, c, (b,))

    # ours: interleaved (sample-major) layout, targets repeated per split
    mine = float(L.jsd_cross_entropy(
        jnp.asarray(logits_bsc.reshape(b * s, c)),
        jnp.asarray(np.repeat(t, s)), num_splits=s, alpha=12.0, smoothing=0.1))

    # timm: block-major splits [clean_B; aug1_B; aug2_B]
    out = torch.from_numpy(
        np.transpose(logits_bsc, (1, 0, 2)).reshape(s * b, c))
    tt = torch.from_numpy(t)
    split = torch.split(out, b)
    ref = F.cross_entropy(split[0], tt, label_smoothing=0.1)
    probs = [F.softmax(lg, dim=1) for lg in split]
    logp_mixture = torch.clamp(torch.stack(probs).mean(axis=0), 1e-7, 1).log()
    ref = ref + 12.0 * sum(
        F.kl_div(logp_mixture, p, reduction="batchmean") for p in probs) / s
    assert abs(mine - float(ref)) < 1e-4


def test_jsd_smoothing_zero_uses_plain_ce():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    b, s, c = 4, 2, 7
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((b, s, c)).astype(np.float32)
    t = rng.integers(0, c, (b,))
    mine = float(L.jsd_cross_entropy(
        jnp.asarray(logits.reshape(b * s, c)), jnp.asarray(np.repeat(t, s)),
        num_splits=s, alpha=0.0, smoothing=0.0))
    ref = F.cross_entropy(torch.from_numpy(logits[:, 0]), torch.from_numpy(t))
    # 1e-4: TPU log_softmax accumulates ~1.6e-5 vs torch CPU fp32
    assert abs(mine - float(ref)) < 1e-4


def test_create_loss_fn_selects_jsd():
    fn = L.create_loss_fn(smoothing=0.1, jsd_splits=3)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((12, 5)), jnp.float32)
    t = jnp.asarray(np.repeat(np.arange(4) % 5, 3))
    v = float(fn(x, t))
    ref = float(L.jsd_cross_entropy(x, t, 3, 12.0, 0.1))
    assert abs(v - ref) < 1e-6


def _make_loader(aug_splits, resplit=False, reprob=0.0, aa=None):
    ds = SyntheticClassDataset(length=16, num_classes=4, image_size=48)
    tf = TrainTransform(32, interpolation="bilinear", hflip=0.5,
                        auto_augment=aa, reprob=reprob)
    return DataLoader(ds, 8, tf, is_training=True, num_workers=1,
                      aug_splits=aug_splits, resplit=resplit)


def test_loader_split_batch_layout():
    dl = _make_loader(aug_splits=3, aa="rand-m9-mstd0.5-inc1")
    images, targets = next(iter(dl))
    assert images.shape == (24, 32, 32, 3)
    assert targets.shape == (24,)
    # interleaved sample-major: each sample's 3 rows carry the same label
    t = targets.reshape(8, 3)
    assert (t == t[:, :1]).all()
    assert len(dl) == 2  # batch_size counts samples, not rows


def test_loader_splits_share_primary_crop():
    # no secondary augs at all -> every split must be pixel-identical to the
    # clean one (same RRC crop + flip), proving the primary is shared
    dl = _make_loader(aug_splits=3)
    images, _ = next(iter(dl))
    per = images.reshape(8, 3, 32, 32, 3)
    assert np.array_equal(per[:, 0], per[:, 1])
    assert np.array_equal(per[:, 0], per[:, 2])


def test_loader_aug_splits_differ_with_secondary_augs():
    dl = _make_loader(aug_splits=3, aa="rand-m9-mstd0.5-inc1")
    images, _ = next(iter(dl))
    per = images.reshape(8, 3, 32, 32, 3)
    # augmented splits differ from clean for most samples (RandAugment can
    # no-op occasionally, so assert on the batch, not per sample)
    # (each RandAugment op applies with prob 0.5, so some splits no-op)
    diff1 = np.abs(per[:, 1] - per[:, 0]).max(axis=(1, 2, 3))
    diff2 = np.abs(per[:, 2] - per[:, 1]).max(axis=(1, 2, 3))
    assert (diff1 > 1e-4).sum() >= 3
    assert (diff2 > 1e-4).sum() >= 3  # independent secondary draws


def test_resplit_skips_clean_erasing():
    random.seed(0)
    dl = _make_loader(aug_splits=2, resplit=True, reprob=1.0)
    images, _ = next(iter(dl))
    per = images.reshape(8, 2, 32, 32, 3)
    # reprob=1: every augmented split is erased somewhere -> differs from
    # clean; clean must remain smooth (erasing writes gaussian pixels, so an
    # erased clean would differ from its twin run without erasing — instead
    # verify clean==primary by rebuilding without erasing)
    dl2 = _make_loader(aug_splits=2, resplit=True, reprob=0.0)
    images2, _ = next(iter(dl2))
    per2 = images2.reshape(8, 2, 32, 32, 3)
    assert np.array_equal(per[:, 0], per2[:, 0])  # clean untouched by reprob
    assert not np.array_equal(per[:, 1], per2[:, 1])  # aug split got erased


def test_mixup_conflict_raises():
    ds = SyntheticClassDataset(length=8, num_classes=4, image_size=48)
    tf = TrainTransform(32)
    with pytest.raises(ValueError):
        DataLoader(ds, 4, tf, is_training=True, mixup_fn=lambda *a: a,
                   aug_splits=2)
