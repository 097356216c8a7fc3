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
    a = decode_batch(paths, [1, 2, 3, 4], 48, "train")
    b = decode_batch(paths, [1, 2, 3, 4], 48, "train")
    c = decode_batch(paths, [5, 6, 7, 8], 48, "train")
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (4, 48, 48, 3)


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
