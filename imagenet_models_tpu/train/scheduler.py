"""LR schedules with timm semantics (epoch-granular cosine + linear warmup,
reference: timm CosineLRScheduler created at /root/reference/GA/train.py:518).

timm defaults reproduced: warmup is linear from warmup_lr to lr over
warmup_epochs; afterwards cosine over the FULL t_initial horizon (timm's
warmup_prefix=False — the cosine argument is the raw epoch, not
epoch - warmup). Cosine restarts (--lr-cycle-mul/-decay/-limit), k-decay
(--lr-k-decay) and bounded per-epoch LR noise (--lr-noise*) follow timm's
CosineLRScheduler/Scheduler closed forms; the noise stream is a NumPy
Generator seeded per-epoch like timm's torch.Generator(seed + t) (same
rejection-sampled bounded-normal distribution, different RNG bits).

Schedules are written with jnp so they can be passed straight to optax as a
step->lr callable and traced inside the jitted train step; the noise factors
are precomputed host-side into a table indexed by the traced epoch.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def lr_noise_table(total_epochs: int, noise_range: Optional[Sequence[float]],
                   noise_pct: float = 0.67, noise_std: float = 1.0,
                   seed: int = 42) -> Optional[np.ndarray]:
    """Per-epoch multiplicative noise factors (timm Scheduler._add_noise:
    lr <- lr + lr*noise for epochs inside the noise range). noise_range is in
    epochs: scalar start (open-ended) or [start, end)."""
    if not noise_range:
        return None
    lo = float(noise_range[0])
    hi = float(noise_range[1]) if len(noise_range) > 1 else float("inf")
    table = np.zeros(max(total_epochs, 1), np.float32)
    for t in range(len(table)):
        if lo <= t < hi:
            rng = np.random.default_rng(seed + t)
            while True:  # bounded normal, timm's rejection loop
                n = float(rng.standard_normal()) * noise_std
                if abs(n) < noise_pct:
                    table[t] = n
                    break
    return table


def cosine_schedule(base_lr: float, epochs: int, warmup_epochs: float = 5,
                    warmup_lr: float = 1e-6, min_lr: float = 1e-5,
                    cooldown_epochs: int = 0, cycle_mul: float = 1.0,
                    cycle_decay: float = 1.0, cycle_limit: int = 1,
                    k_decay: float = 1.0,
                    noise_table: Optional[np.ndarray] = None) -> Callable:
    """timm CosineLRScheduler. With the defaults (one cycle) epochs past the
    horizon hold min_lr — that is the --cooldown-epochs tail (timm keeps
    stepping the finished schedule during cooldown)."""
    noise = jnp.asarray(noise_table) if noise_table is not None else None

    def lr_at(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        warm = warmup_lr + (base_lr - warmup_lr) * e / max(warmup_epochs, 1e-8)
        if cycle_mul == 1.0:
            i = jnp.floor(e / epochs)
            t_curr = e - i * epochs
            t_i = jnp.asarray(float(epochs))
        else:
            # timm CosineLRScheduler.get_lr cycle index for geometric cycles
            arg = jnp.maximum(1.0 - e / epochs * (1.0 - cycle_mul), 1e-8)
            i = jnp.floor(jnp.log(arg) / math.log(cycle_mul))
            t_curr = e - epochs * (cycle_mul ** i - 1.0) / (cycle_mul - 1.0)
            t_i = epochs * cycle_mul ** i
        lr_max = base_lr * cycle_decay ** i
        frac = (t_curr ** k_decay) / (t_i ** k_decay)
        cos = min_lr + 0.5 * (lr_max - min_lr) * (1 + jnp.cos(jnp.pi * frac))
        cos = jnp.where(i < cycle_limit, cos, min_lr)
        lr = jnp.where(e < warmup_epochs, warm, cos)
        if noise is not None:
            idx = jnp.clip(jnp.asarray(epoch, jnp.int32), 0, noise.shape[0] - 1)
            lr = lr * (1.0 + noise[idx])
        return lr

    return lr_at


def step_schedule(base_lr: float, decay_epochs: int = 30, decay_rate: float = 0.1,
                  warmup_epochs: float = 0, warmup_lr: float = 1e-6) -> Callable:
    def lr_at(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        warm = warmup_lr + (base_lr - warmup_lr) * epoch / max(warmup_epochs, 1e-8)
        dec = base_lr * (decay_rate ** (epoch // decay_epochs))
        return jnp.where(epoch < warmup_epochs, warm, dec)

    return lr_at


def create_scheduler(sched: str = "cosine", **kwargs) -> Callable:
    if sched == "cosine":
        kwargs.pop("decay_epochs", None), kwargs.pop("decay_rate", None)
        return cosine_schedule(**kwargs)
    if sched == "step":
        for k in ("epochs", "min_lr", "cooldown_epochs", "cycle_mul",
                  "cycle_decay", "cycle_limit", "k_decay", "noise_table"):
            kwargs.pop(k, None)
        return step_schedule(**kwargs)
    raise ValueError(f"unknown scheduler {sched} (cosine/step; timm's plateau "
                     "scheduler is metric-driven and not supported — reference "
                     "recipes all use cosine)")
