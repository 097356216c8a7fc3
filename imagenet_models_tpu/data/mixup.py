"""Mixup/CutMix with timm `Mixup`/`FastCollateMixup` semantics (batch mode):
one lambda per batch, 50/50 switch between mixup and cutmix when both are
enabled, targets become smoothed soft labels mixed with (lam, 1-lam) against
the batch reversed. Reference recipes: `--mixup .8/.1 --cutmix 1.0`
(/root/reference/MAP/train_with_script.py:13-19)."""

from __future__ import annotations

import numpy as np


def one_hot_np(targets: np.ndarray, num_classes: int, on: float, off: float) -> np.ndarray:
    out = np.full((targets.shape[0], num_classes), off, dtype=np.float32)
    out[np.arange(targets.shape[0]), targets] = on
    return out


def rand_bbox(h: int, w: int, lam: float, rng: np.random.Generator):
    """timm cutmix bbox: cut ratio sqrt(1-lam), clipped at borders."""
    ratio = np.sqrt(1.0 - lam)
    cut_h, cut_w = int(h * ratio), int(w * ratio)
    cy = int(rng.integers(0, h))
    cx = int(rng.integers(0, w))
    y1, y2 = np.clip(cy - cut_h // 2, 0, h), np.clip(cy + cut_h // 2, 0, h)
    x1, x2 = np.clip(cx - cut_w // 2, 0, w), np.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


class Mixup:
    def __init__(self, mixup_alpha: float = 1.0, cutmix_alpha: float = 0.0,
                 prob: float = 1.0, switch_prob: float = 0.5,
                 label_smoothing: float = 0.1, num_classes: int = 1000,
                 mode: str = "batch"):
        self.mixup_alpha, self.cutmix_alpha = mixup_alpha, cutmix_alpha
        self.prob, self.switch_prob = prob, switch_prob
        self.label_smoothing, self.num_classes = label_smoothing, num_classes
        self.mixup_enabled = True

    def _params(self, rng: np.random.Generator):
        lam, use_cutmix = 1.0, False
        if not self.mixup_enabled or rng.random() >= self.prob:
            return 1.0, False
        if self.mixup_alpha > 0 and self.cutmix_alpha > 0:
            use_cutmix = rng.random() < self.switch_prob
            alpha = self.cutmix_alpha if use_cutmix else self.mixup_alpha
            lam = float(rng.beta(alpha, alpha))
        elif self.mixup_alpha > 0:
            lam = float(rng.beta(self.mixup_alpha, self.mixup_alpha))
        elif self.cutmix_alpha > 0:
            use_cutmix = True
            lam = float(rng.beta(self.cutmix_alpha, self.cutmix_alpha))
        return lam, use_cutmix

    def __call__(self, images: np.ndarray, targets: np.ndarray,
                 rng: np.random.Generator):
        """images: NHWC float; targets: int class ids. Returns mixed images +
        soft targets (always dense, smoothing baked in)."""
        off = self.label_smoothing / self.num_classes
        on = 1.0 - self.label_smoothing + off
        y = one_hot_np(targets, self.num_classes, on, off)

        lam, use_cutmix = self._params(rng)
        if lam != 1.0:
            if use_cutmix:
                h, w = images.shape[1:3]
                y1, y2, x1, x2 = rand_bbox(h, w, lam, rng)
                images = images.copy()
                images[:, y1:y2, x1:x2] = images[::-1, y1:y2, x1:x2]
                lam = 1.0 - ((y2 - y1) * (x2 - x1) / (h * w))
            else:
                images = images * lam + images[::-1] * (1.0 - lam)
            y = y * lam + y[::-1] * (1.0 - lam)
        return images.astype(np.float32), y
