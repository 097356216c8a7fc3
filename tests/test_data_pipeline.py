"""Host data pipeline tests: transforms, RandAugment, mixup/cutmix targets,
random erasing, loader scheduling (repeat-aug), determinism."""

import numpy as np
import pytest
from PIL import Image

from imagenet_models_tpu.data.auto_augment import rand_augment_transform
from imagenet_models_tpu.data.dataset import SyntheticDataset, create_dataset
from imagenet_models_tpu.data.loader import DataLoader, create_loader, epoch_indices
from imagenet_models_tpu.data.mixup import Mixup
from imagenet_models_tpu.data.random_erasing import RandomErasing
from imagenet_models_tpu.data.transforms import EvalTransform, TrainTransform

import random


def test_train_transform_shape_and_determinism():
    tf = TrainTransform(64, auto_augment="rand-m9-mstd0.5-inc1", reprob=0.25)
    img = Image.fromarray(np.random.default_rng(0).integers(0, 256, (100, 80, 3), dtype=np.uint8))
    a = tf(img, random.Random(7))
    b = tf(img, random.Random(7))
    c = tf(img, random.Random(8))
    assert a.shape == (64, 64, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_eval_transform_crop_pct():
    tf = EvalTransform(224, crop_pct=0.875)
    img = Image.fromarray(np.zeros((300, 400, 3), dtype=np.uint8))
    assert tf(img).shape == (224, 224, 3)


def test_eval_crop_modes():
    """timm crop_mode semantics (transforms_factory): 'squash' resizes both
    dims to floor(size/crop_pct) discarding aspect — at crop_pct 1.0 the
    center crop is a no-op, so a gradient along the long axis must span the
    full output. 'border' pads to square with the mean fill."""
    from imagenet_models_tpu.data.transforms import resize_center_crop

    # 100x400 horizontal gradient 0..255
    arr = np.tile(np.linspace(0, 255, 400, dtype=np.uint8), (100, 1))
    img = Image.fromarray(np.stack([arr] * 3, -1))

    sq = resize_center_crop(img, 64, crop_pct=1.0, interpolation="bilinear",
                            crop_mode="squash")
    a = np.asarray(sq, np.float32)
    assert sq.size == (64, 64)
    assert a[:, 0].mean() < 16 and a[:, -1].mean() > 239  # full range kept

    ce = resize_center_crop(img, 64, crop_pct=1.0, interpolation="bilinear",
                            crop_mode="center")
    c = np.asarray(ce, np.float32)
    # center mode keeps aspect: the crop sees only the middle 64/256 of the
    # gradient -> much narrower value range
    assert c.max() - c.min() < 96

    bo = resize_center_crop(img, 64, crop_pct=1.0, interpolation="bilinear",
                            crop_mode="border", fill=(0.5, 0.5, 0.5))
    b = np.asarray(bo, np.float32)
    assert bo.size == (64, 64)
    # top rows are padding at the mean fill (128)
    assert abs(b[0].mean() - 128) < 2 and abs(b[-1].mean() - 128) < 2


def test_tf_maxvit_fastervit_data_cfgs():
    """Reference default_cfgs rows (map_maxvit.py:1720-1784,
    map_fastervit.py:43-46): tf-224 in1k uses ImageNet mean/std + 0.95;
    384/512 keep 0.5 norm with crop_pct 1.0 + squash; fastervit-3 defaults
    to crop_pct 1.0 center."""
    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu.core.registry import default_cfg

    for n in ("maxvit_tiny_tf_224", "map_maxvit_tiny_tf_224",
              "maxvit_small_tf_224", "maxvit_base_tf_224",
              "maxvit_large_tf_224"):
        cfg = default_cfg(n)
        assert cfg["mean"] == (0.485, 0.456, 0.406) and cfg["crop_pct"] == 0.95
        assert cfg["crop_mode"] == "center"
    for n in ("maxvit_tiny_tf_384", "maxvit_small_tf_512",
              "maxvit_xlarge_tf_384"):
        cfg = default_cfg(n)
        assert cfg["mean"] == (0.5, 0.5, 0.5) and cfg["crop_pct"] == 1.0
        assert cfg["crop_mode"] == "squash"
        assert cfg["input_size"][0] == int(n.rsplit("_", 1)[1])
    xl = default_cfg("maxvit_xlarge_tf_224")
    assert xl["num_classes"] == 21843 and xl["mean"] == (0.5, 0.5, 0.5)
    fv = default_cfg("map_faster_vit_3_224")
    assert fv["crop_pct"] == 1.0 and fv["crop_mode"] == "center"


def test_randaugment_all_ops_run():
    img = Image.fromarray(np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8))
    from imagenet_models_tpu.data.auto_augment import _RAND_INCREASING

    rng = random.Random(0)
    for op in _RAND_INCREASING:
        out = op(img, 9.0, rng)
        assert out.size == img.size


def test_randaugment_non_inc_refused():
    # Only the increasing op set is implemented; a non-inc config must fail
    # loudly instead of silently swapping posterize/solarize math (timm
    # semantics differ between the two sets).
    import pytest

    r = rand_augment_transform("rand-m9-mstd0.5-inc1")
    assert r.magnitude == 9.0 and r.mstd == 0.5
    # timm's parser does bool(val) on the value STRING, so ANY digit-carrying
    # -inc value — including -inc0 — selects the increasing set there.
    r0 = rand_augment_transform("rand-m9-mstd0.5-inc0")
    assert r0.magnitude == 9.0 and r0.mstd == 0.5
    for cfg in ("rand-m9-mstd0.5",
                # timm skips digit-less parts, so bare -inc / -incTrue are
                # NON-increasing there and must refuse here too
                "rand-m9-mstd0.5-inc", "rand-m9-mstd0.5-incTrue"):
        with pytest.raises(NotImplementedError, match="inc1"):
            rand_augment_transform(cfg)


def test_mixup_targets_sum_to_one():
    mix = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, label_smoothing=0.1, num_classes=10)
    rng = np.random.default_rng(0)
    images = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    targets = rng.integers(0, 10, (8,))
    for _ in range(5):
        mi, mt = mix(images, targets, rng)
        assert mi.shape == images.shape and mt.shape == (8, 10)
        np.testing.assert_allclose(mt.sum(-1), 1.0, atol=1e-5)


def test_mixup_modes_targets_and_consistency():
    """'pair'/'elem' modes (timm Mixup mode=): targets stay distributions and
    reflect the actual pixel mix. For pair mode, sample i and n-1-i share a
    lambda (timm _mix_pair); for elem, lambdas are per-sample."""
    rng = np.random.default_rng(1)
    images = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    targets = np.arange(8) % 4
    for mode in ("pair", "elem"):
        mix = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, label_smoothing=0.0,
                    num_classes=4, mode=mode)
        for _ in range(5):
            mi, mt = mix(images, targets, rng)
            assert mi.shape == images.shape and mt.shape == (8, 4)
            np.testing.assert_allclose(mt.sum(-1), 1.0, atol=1e-5)
        # mixup-only: the target mix weight equals the recoverable pixel lam
        mix2 = Mixup(mixup_alpha=0.8, cutmix_alpha=0.0, label_smoothing=0.0,
                     num_classes=4, mode=mode)
        mi, mt = mix2(images, targets, rng)
        for i in range(8):
            j = 8 - 1 - i
            lam_t = mt[i, targets[i]] if targets[i] != targets[j] else 1.0
            expect = images[i] * lam_t + images[j] * (1.0 - lam_t)
            np.testing.assert_allclose(mi[i], expect, atol=1e-4)


def test_mixup_pair_mode_shares_lambda():
    rng = np.random.default_rng(3)
    images = rng.standard_normal((6, 16, 16, 3)).astype(np.float32)
    targets = np.arange(6)
    mix = Mixup(mixup_alpha=0.8, cutmix_alpha=0.0, label_smoothing=0.0,
                num_classes=6, mode="pair", prob=1.0)
    _, mt = mix(images, targets, rng)
    for i in range(3):
        j = 5 - i
        np.testing.assert_allclose(mt[i, targets[i]], mt[j, targets[j]], atol=1e-6)
        np.testing.assert_allclose(mt[i, targets[j]], mt[j, targets[i]], atol=1e-6)


def test_cutmix_minmax_bbox_and_lambda():
    """--cutmix-minmax (timm rand_bbox_minmax): bbox sides uniform in
    [lo*dim, hi*dim), fully inside; lambda corrected to kept-area fraction
    and reflected exactly in the targets."""
    rng = np.random.default_rng(7)
    images = np.zeros((4, 32, 32, 3), np.float32)
    for i in range(4):
        images[i] = i + 1  # constant per-image planes make the mix countable
    targets = np.arange(4)
    mix = Mixup(mixup_alpha=0.0, cutmix_alpha=0.0, cutmix_minmax=(0.25, 0.5),
                label_smoothing=0.0, num_classes=4, mode="batch", prob=1.0)
    assert mix.cutmix_alpha == 1.0  # timm forces alpha=1 under minmax
    mi, mt = mix(images, targets, rng)
    for i in range(4):
        j = 3 - i
        own = (mi[i, :, :, 0] == i + 1).mean()
        area = 1.0 - own if i != j else 0.0
        side_frac = np.sqrt(area)
        assert 0.2499 <= side_frac <= 0.51 or area == 0.0
        np.testing.assert_allclose(mt[i, targets[i]], own, atol=1e-5)


def test_random_erasing_pixel_mode():
    re_ = RandomErasing(probability=1.0, mode="pixel")
    img = np.zeros((64, 64, 3), np.float32)
    out = re_(img, random.Random(3))
    assert (out != 0).any() and out.shape == img.shape
    assert (img == 0).all()  # input not mutated


def test_repeat_aug_indices():
    idx = epoch_indices(12, epoch=0, seed=0, shuffle=True, repeats=3)
    assert len(idx) == 12
    vals, counts = np.unique(idx, return_counts=True)
    assert len(vals) == 4 and (counts == 3).all()


def test_loader_end_to_end_synthetic():
    ds = SyntheticDataset(length=20, num_classes=5, image_size=48)
    mix = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, label_smoothing=0.1, num_classes=5)
    loader = create_loader(ds, 32, 8, is_training=True, auto_augment="rand-m9-mstd0.5-inc1",
                           reprob=0.25, mixup_fn=mix, num_workers=2, repeats=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 2  # drop_last
    for images, targets in batches:
        assert images.shape == (8, 32, 32, 3)
        assert targets.shape == (8, 5)  # soft targets from mixup
    # eval loader keeps the tail batch and integer targets
    ev = create_loader(ds, 48, 8, is_training=False)
    evb = list(ev)
    assert len(evb) == 3 and evb[-1][0].shape[0] == 4
    assert evb[0][1].dtype == np.int64


def test_synthetic_cls_learnable_and_disjoint():
    """synthetic-cls: val images use unseen noise but the same class
    templates — nearest-template classification on raw val images must be
    perfect (the convergence run's task is learnable by construction)."""
    import numpy as np

    from imagenet_models_tpu.data.dataset import create_dataset

    tr = create_dataset("synthetic-cls:400", "train", num_classes=10, image_size=32)
    va = create_dataset("synthetic-cls:400", "validation", num_classes=10, image_size=32)
    # same index, same label, different pixels (disjoint noise seeds)
    im_t, lab_t = tr.load(7)
    im_v, lab_v = va.load(7)
    assert lab_t == lab_v
    assert np.abs(np.asarray(im_t, np.float32) - np.asarray(im_v, np.float32)).mean() > 1

    tmpls = []
    for c in range(10):
        acc = np.zeros((32, 32, 3), np.float64)
        for j in range(5):
            img, lab = tr.load(c + 10 * j)
            assert lab == c
            acc += np.asarray(img, np.float64)
        tmpls.append(acc / 5)
    tmpls = np.stack(tmpls)
    hits = 0
    for i in range(100):
        img, lab = va.load(i)
        d = ((tmpls - np.asarray(img, np.float64)) ** 2).sum(axis=(1, 2, 3))
        hits += int(np.argmin(d) == lab)
    assert hits >= 98, hits


def test_synthetic_cls_epoch_varying_noise():
    """Train-split noise is re-drawn every epoch (memorizing one epoch's
    pixels cannot minimize later epochs' loss); val noise is epoch-fixed.
    The loader forwards set_epoch to the dataset, and the
    synthetic-cls:train:val spec sizes the splits independently."""
    import numpy as np

    from imagenet_models_tpu.data.dataset import create_dataset
    from imagenet_models_tpu.data.loader import DataLoader

    tr = create_dataset("synthetic-cls:300:40", "train", num_classes=10, image_size=32)
    va = create_dataset("synthetic-cls:300:40", "validation", num_classes=10, image_size=32)
    assert len(tr) == 300 and len(va) == 40

    im0, lab0 = tr.load(7)
    tr.set_epoch(1)
    im1, lab1 = tr.load(7)
    assert lab0 == lab1
    assert np.abs(np.asarray(im0, np.float32) - np.asarray(im1, np.float32)).mean() > 1
    tr.set_epoch(0)
    im0b, _ = tr.load(7)
    assert np.array_equal(np.asarray(im0), np.asarray(im0b))  # deterministic per epoch

    va.set_epoch(3)  # val split ignores epoch (epoch_varying=False)
    assert np.array_equal(np.asarray(va.load(5)[0]), np.asarray(va.load(5)[0]))
    v0 = np.asarray(va.load(5)[0])
    va.set_epoch(0)
    assert np.array_equal(v0, np.asarray(va.load(5)[0]))

    dl = DataLoader(tr, 4, lambda img, rng: np.asarray(img, np.float32),
                    is_training=True, num_workers=1)
    dl.set_epoch(2)
    assert tr._epoch == 2


def test_sharded_loader_empty_tail_shard():
    """Multi-host eval: a tail batch too short to reach the last shard must
    yield an empty (0, H, W, C) batch (the engine pads + masks), not crash
    or hang the worker thread."""
    ds = SyntheticDataset(length=10, num_classes=5, image_size=32)
    tf = EvalTransform(32, crop_pct=1.0)
    # global batch 8, 2 shards x 4 local rows: batch 1 has only 2 rows left,
    # all of which land in shard 0 -> shard 1 sees an empty slice
    l0 = DataLoader(ds, 8, tf, is_training=False, num_workers=2,
                    num_shards=2, shard_id=0)
    l1 = DataLoader(ds, 8, tf, is_training=False, num_workers=2,
                    num_shards=2, shard_id=1)
    b0 = [b for b in l0]
    b1 = [b for b in l1]
    assert len(b0) == len(b1) == 2
    assert b0[1][0].shape == (2, 32, 32, 3)
    assert b1[1][0].shape == (0, 32, 32, 3)
    assert b1[1][1].shape == (0,)
