"""Native (C++) decode pipeline: builds, decodes correctly vs PIL, seeds are
deterministic, and the DataLoader integration produces training batches."""

import os

import numpy as np
import pytest
from PIL import Image

from imagenet_models_tpu.data.native import decode_batch, get_native_lib

pytestmark = pytest.mark.skipif(get_native_lib() is None,
                                reason="native loader did not build")


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        (root / cls).mkdir()
        for i in range(6):
            arr = rng.integers(0, 256, (80 + 16 * i, 100, 3), dtype=np.uint8)
            Image.fromarray(arr).save(root / cls / f"{i}.jpg", quality=90)
    return root


def test_eval_decode_close_to_pil(tmp_path):
    # smooth gradient: resamplers should agree closely (noise would not)
    yy, xx = np.mgrid[0:160, 0:200]
    arr = np.stack([(xx * 255 / 200), (yy * 255 / 160), (xx + yy) % 256], -1).astype(np.uint8)
    path = str(tmp_path / "grad.jpg")
    Image.fromarray(arr).save(path, quality=95)
    out = decode_batch([path], [0], 64, "eval", crop_pct=0.875)
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    from imagenet_models_tpu.data.transforms import resize_center_crop

    with Image.open(path) as img:
        ref = np.asarray(resize_center_crop(img.convert("RGB"), 64, 0.875, "bilinear"))
    diff = np.abs(out[0].astype(np.int32) - ref.astype(np.int32)).mean()
    assert diff < 6, diff


def test_train_decode_deterministic(jpeg_dir):
    paths = [str(jpeg_dir / "a" / f"{i}.jpg") for i in range(4)]
    a = decode_batch(paths, [1, 2, 3, 4], 48, "train", interpolation="random")
    b = decode_batch(paths, [1, 2, 3, 4], 48, "train", interpolation="random")
    c = decode_batch(paths, [5, 6, 7, 8], 48, "train", interpolation="random")
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (4, 48, 48, 3)


@pytest.mark.parametrize("interp", ["bilinear", "bicubic"])
def test_train_resample_matches_pil(tmp_path, interp):
    """PIL-antialiased resampler parity: degenerate RRC (scale=ratio=1 on a
    square image selects the full frame) isolates the resize kernel; native
    output must match PIL's Image.resize within quantization noise."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (160, 160, 3), dtype=np.uint8)
    p = str(tmp_path / "sq.jpg")
    PILImage.fromarray(arr).save(p, quality=98)
    with PILImage.open(p) as im:
        src = np.asarray(im.convert("RGB"))

    out = decode_batch([p], [7], 48, "train", interpolation=interp,
                       hflip=0.0, vflip=0.0, scale=(1.0, 1.0), ratio=(1.0, 1.0))[0]
    filt = {"bilinear": PILImage.BILINEAR, "bicubic": PILImage.BICUBIC}[interp]
    ref = np.asarray(PILImage.fromarray(src).resize((48, 48), filt))
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1 and diff.mean() < 0.5, (diff.max(), diff.mean())


def test_train_decode_flip_probabilities(tmp_path):
    from PIL import Image as PILImage

    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    p = str(tmp_path / "f.jpg")
    PILImage.fromarray(arr).save(p, quality=98)
    kw = dict(interpolation="bilinear", scale=(1.0, 1.0), ratio=(1.0, 1.0))
    base = decode_batch([p], [9], 48, "train", hflip=0.0, vflip=0.0, **kw)[0]
    v = decode_batch([p], [9], 48, "train", hflip=0.0, vflip=1.0, **kw)[0]
    h = decode_batch([p], [9], 48, "train", hflip=1.0, vflip=0.0, **kw)[0]
    np.testing.assert_array_equal(v, base[::-1])
    np.testing.assert_array_equal(h, base[:, ::-1])
    # hflip=0.5 flips roughly half the seeds
    flips = 0
    for s in range(40):
        x = decode_batch([p], [s], 48, "train", hflip=0.5, vflip=0.0, **kw)[0]
        flips += int(np.array_equal(x, base[:, ::-1]))
    assert 8 <= flips <= 32, flips


def test_train_decode_scale_ratio_respected(tmp_path):
    """scale=(lo,hi) near zero produces tiny crops (heavy upscale -> blur);
    the parameter must actually reach the crop sampler."""
    from PIL import Image as PILImage

    yy, xx = np.mgrid[0:128, 0:128]
    arr = ((xx // 4 + yy // 4) % 2 * 255).astype(np.uint8)  # checkerboard
    arr = np.stack([arr] * 3, -1)
    p = str(tmp_path / "cb.jpg")
    PILImage.fromarray(arr).save(p, quality=98)
    full = decode_batch([p], [11], 64, "train", interpolation="bilinear",
                        hflip=0.0, scale=(1.0, 1.0), ratio=(1.0, 1.0))[0]
    tiny = decode_batch([p], [11], 64, "train", interpolation="bilinear",
                        hflip=0.0, scale=(0.02, 0.03), ratio=(1.0, 1.0))[0]
    # the tiny crop upscales ~6x: variance within local windows collapses
    assert float(np.var(np.diff(tiny.astype(int), axis=1))) < \
        float(np.var(np.diff(full.astype(int), axis=1)))


def test_loader_uses_native_path(jpeg_dir):
    from imagenet_models_tpu.data.dataset import ImageFolder
    from imagenet_models_tpu.data.loader import create_loader

    ds = ImageFolder(str(jpeg_dir))
    loader = create_loader(ds, 48, 4, is_training=True,
                           auto_augment="rand-m9-mstd0.5-inc1", reprob=0.25,
                           num_workers=2)
    assert loader.native
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    images, targets = batches[0]
    assert images.shape == (4, 48, 48, 3) and images.dtype == np.float32
    assert targets.shape == (4,)
    assert np.isfinite(images).all()
