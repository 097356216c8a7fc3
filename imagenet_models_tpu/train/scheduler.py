"""LR schedules with timm semantics (epoch-granular cosine + linear warmup,
reference: timm CosineLRScheduler created at /root/reference/GA/train.py:518).

timm defaults reproduced: warmup is linear from warmup_lr to lr over
warmup_epochs; afterwards cosine over the FULL t_initial horizon (timm's
warmup_prefix=False — the cosine argument is the raw epoch, not
epoch - warmup).

Schedules are written with jnp so they can be passed straight to optax as a
step->lr callable and traced inside the jitted train step.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def cosine_schedule(base_lr: float, epochs: int, warmup_epochs: float = 5,
                    warmup_lr: float = 1e-6, min_lr: float = 1e-5,
                    cooldown_epochs: int = 0) -> Callable:
    def lr_at(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        warm = warmup_lr + (base_lr - warmup_lr) * epoch / max(warmup_epochs, 1e-8)
        t = jnp.minimum(epoch, epochs)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * t / epochs))
        return jnp.where(epoch < warmup_epochs, warm, cos)

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
        kwargs.pop("epochs", None), kwargs.pop("min_lr", None), kwargs.pop("cooldown_epochs", None)
        return step_schedule(**kwargs)
    raise ValueError(f"unknown scheduler {sched}")
