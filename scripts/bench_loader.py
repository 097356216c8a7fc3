#!/usr/bin/env python3
"""Host input-pipeline throughput bench: can the host feed the chip?

Generates an ImageNet-shaped JPEG corpus (or points at a real --data-dir),
then measures decode+augment throughput (img/s) through the production
DataLoader for:
  - the native C++ path (libjpeg + thread pool, imagenet_models_tpu/native)
  - the PIL fallback path
  - train (full recipe: RandomResizedCrop + RandAugment + erasing) and eval
    (resize + center crop) transforms

Reports per-core throughput and the host cores needed to sustain a given
per-chip train rate (default: the measured map_convnext_tiny full train step,
~1250 img/s/chip on v5e — bench.py). The reference delegates this entirely to
torch DataLoader workers + the timm prefetcher (GA/train.py:567-610); here the
host pipeline is the C++ decode core under threaded Python workers
(imagenet_models_tpu/data/{native,loader}.py).

Pure host benchmark — never touches the TPU. Prints one JSON line per
configuration plus a summary line.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHIP_DEMAND_DEFAULT = 1250.0  # img/s, measured full train step (bench.py, v5e)


def make_corpus(root: str, n: int, seed: int = 0) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "cls0"), exist_ok=True)
    for i in range(n):
        # ImageNet-ish: ~500x400 JPEG, quality 90 (train-set median is
        # ~500x375); smooth content plus noise for realistic entropy
        h, w = int(rng.integers(350, 450)), int(rng.integers(450, 550))
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack([xx * 255 / w, yy * 255 / h, (xx + yy) % 256], -1)
        img = (base + rng.integers(0, 64, (h, w, 3))).clip(0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "cls0", f"{i:05d}.jpg"),
                                  quality=90)


def run_one(dataset, is_training: bool, use_native: bool, workers: int,
            batch_size: int, img_size: int, batches: int):
    """Returns (img/s, native_engaged).

    Streams across epoch boundaries so `batches` is honored regardless of
    corpus size; never forces the native path on — it reports whether the
    loader's own fidelity gate engaged it (loader.py:80-89)."""
    from imagenet_models_tpu.data.loader import create_loader

    loader = create_loader(
        dataset, img_size, batch_size, is_training=is_training,
        interpolation="random" if is_training else "bicubic",
        auto_augment="rand-m9-mstd0.5-inc1" if is_training else None,
        reprob=0.25 if is_training else 0.0,
        num_workers=workers)
    if not use_native:
        loader.native = False
    native_engaged = bool(loader.native)

    # Walk whole epochs (draining each one fully so no producer thread is
    # abandoned mid-epoch to race the tempdir cleanup); batch 1 is warmup,
    # timing covers the next `batches`.
    n_img, seen, t0, dt = 0, 0, 0.0, None
    for epoch in range(10000):
        loader.set_epoch(epoch)
        for imgs, _ in loader:
            seen += 1
            if seen == 1:
                t0 = time.perf_counter()
                continue
            if dt is None:
                n_img += imgs.shape[0]
                if seen - 1 >= batches:
                    dt = time.perf_counter() - t0
        if dt is not None:
            break
    return n_img / dt, native_engaged


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="", help="existing ImageFolder root "
                   "(default: generate a synthetic JPEG corpus)")
    p.add_argument("--corpus-size", type=int, default=512)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("-b", "--batch-size", type=int, default=64)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--workers", type=int, default=0,
                   help="worker threads (0 = one per host core)")
    p.add_argument("--chip-demand", type=float, default=CHIP_DEMAND_DEFAULT,
                   help="train img/s per chip to size the host against")
    args = p.parse_args()

    from imagenet_models_tpu.data.dataset import ImageFolder

    cores = len(os.sched_getaffinity(0))
    workers = args.workers or cores
    tmp = None
    root = args.data_dir
    if not root:
        tmp = tempfile.TemporaryDirectory(prefix="imtpu_loaderbench_")
        root = tmp.name
        make_corpus(root, args.corpus_size)
    dataset = ImageFolder(root)

    results = {}
    for name, is_training, native in (
            ("train_native", True, True),
            ("train_pil", True, False),
            ("eval_pil", False, False)):
        ips, engaged = run_one(dataset, is_training, native, workers,
                               args.batch_size, args.img_size, args.batches)
        results[name] = round(ips, 1)
        print(json.dumps({"config": name, "img_per_sec": round(ips, 1),
                          "native_engaged": engaged,
                          "workers": workers, "host_cores": cores,
                          "img_per_sec_per_core": round(ips / cores, 1)}))

    best = max(results["train_native"], results["train_pil"])
    print(json.dumps({
        "summary": "host cores to feed one chip",
        "chip_demand_img_s": args.chip_demand,
        "train_img_s_per_core": round(best / cores, 1),
        "cores_per_chip": round(args.chip_demand / (best / cores), 2),
        "native_speedup_vs_pil": round(
            results["train_native"] / max(results["train_pil"], 1e-9), 2),
    }))
    if tmp:
        tmp.cleanup()


if __name__ == "__main__":
    main()
