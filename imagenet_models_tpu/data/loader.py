"""Host input pipeline: threaded decode+augment workers feeding a bounded
queue, with batch-level mixup/cutmix and repeat-augmentation scheduling.

TPU-native replacement for timm create_loader + prefetcher
(/root/reference/GA/train.py:567-610): decode and augmentation are fused per
worker thread; the training engine overlaps host batching with device compute
by keeping one batch in flight (double buffering via jax async dispatch).
Repeat-aug reproduces timm RepeatAugSampler: each selected sample appears
`repeats` times per epoch (with independent augmentations), epoch length
preserved (recipes use --aug-repeats 3).
"""

from __future__ import annotations

import math
import queue
import random
import threading
from typing import Callable, Iterator, Optional, Tuple

import numpy as np


def epoch_indices(n: int, epoch: int, seed: int, shuffle: bool, repeats: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed + epoch) if shuffle else None
    idx = np.arange(n)
    if shuffle:
        rng.shuffle(idx)
    if repeats and repeats > 1:
        unique = idx[: math.ceil(n / repeats)]
        idx = np.repeat(unique, repeats)[:n]
    return idx


class DataLoader:
    """Iterable over (images NHWC f32, targets) numpy batches."""

    def __init__(self, dataset, batch_size: int, transform: Callable,
                 is_training: bool = False, mixup_fn=None, num_workers: int = 4,
                 seed: int = 42, repeats: int = 0, drop_last: Optional[bool] = None):
        self.dataset, self.batch_size, self.transform = dataset, batch_size, transform
        self.is_training, self.mixup_fn = is_training, mixup_fn
        self.num_workers = max(1, num_workers)
        self.seed, self.repeats = seed, repeats
        self.drop_last = is_training if drop_last is None else drop_last
        self.epoch = 0
        self.mixup_enabled = mixup_fn is not None

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def _load_one(self, index: int, aug_seed: int) -> Tuple[np.ndarray, int]:
        img, label = self.dataset.load(int(index))
        rng = random.Random(aug_seed)
        return self.transform(img, rng), label

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = epoch_indices(len(self.dataset), self.epoch, self.seed,
                            shuffle=self.is_training, repeats=self.repeats if self.is_training else 0)
        nb = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)]
        out_q: "queue.Queue" = queue.Queue(maxsize=4)
        mix_rng = np.random.default_rng(self.seed * 1000003 + self.epoch)

        def produce():
            for bi, binds in enumerate(batches):
                imgs, labels = [], []
                for pos, i in enumerate(binds):
                    a, lb = self._load_one(i, (self.seed, self.epoch, bi, pos).__hash__() & 0x7FFFFFFF)
                    imgs.append(a)
                    labels.append(lb)
                images = np.stack(imgs)
                targets = np.asarray(labels, np.int64)
                if self.is_training and self.mixup_fn is not None and self.mixup_enabled:
                    images, targets = self.mixup_fn(images, targets, mix_rng)
                out_q.put((images, targets))
            out_q.put(None)

        if self.num_workers > 1:
            # shard batch production across threads, preserving order
            qs = [queue.Queue(maxsize=2) for _ in range(self.num_workers)]

            def worker(w):
                for bi in range(w, nb, self.num_workers):
                    binds = batches[bi]
                    imgs, labels = [], []
                    for pos, i in enumerate(binds):
                        a, lb = self._load_one(i, (self.seed, self.epoch, bi, pos).__hash__() & 0x7FFFFFFF)
                        imgs.append(a)
                        labels.append(lb)
                    qs[w].put((bi, np.stack(imgs), np.asarray(labels, np.int64)))
                qs[w].put(None)

            threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                       for w in range(self.num_workers)]
            for t in threads:
                t.start()
            for bi in range(nb):
                item = qs[bi % self.num_workers].get()
                assert item is not None and item[0] == bi
                _, images, targets = item
                if self.is_training and self.mixup_fn is not None and self.mixup_enabled:
                    images, targets = self.mixup_fn(images, targets, mix_rng)
                yield images, targets
            return

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = out_q.get()
            if item is None:
                return
            yield item


def create_loader(dataset, input_size: int, batch_size: int, is_training: bool,
                  interpolation: str = "bicubic", crop_pct: float = 0.875,
                  mean=None, std=None, auto_augment: Optional[str] = None,
                  hflip: float = 0.5, reprob: float = 0.0, remode: str = "pixel",
                  recount: int = 1, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                  mixup_fn=None, num_workers: int = 4, seed: int = 42,
                  repeats: int = 0) -> DataLoader:
    from imagenet_models_tpu.data.transforms import (
        EvalTransform,
        IMAGENET_DEFAULT_MEAN,
        IMAGENET_DEFAULT_STD,
        TrainTransform,
    )

    mean = mean or IMAGENET_DEFAULT_MEAN
    std = std or IMAGENET_DEFAULT_STD
    if is_training:
        tf = TrainTransform(input_size, interpolation=interpolation, hflip=hflip,
                            auto_augment=auto_augment, mean=mean, std=std,
                            reprob=reprob, remode=remode, recount=recount,
                            scale=scale, ratio=ratio)
    else:
        tf = EvalTransform(input_size, crop_pct=crop_pct,
                           interpolation=interpolation, mean=mean, std=std)
    return DataLoader(dataset, batch_size, tf, is_training=is_training,
                      mixup_fn=mixup_fn, num_workers=num_workers, seed=seed,
                      repeats=repeats)
