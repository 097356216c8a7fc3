"""Optimizer factory (optax) mirroring timm create_optimizer_v2 behaviour
(/root/reference/GA/train.py:466, MAP recipes use lamb/adamw).

Weight decay is masked off for 1-D parameters and biases (timm param-group
rule) — in our pytrees that means: any leaf of rank <= 1 except conv/dense
kernels (which are never rank <= 1), i.e. biases, norm scales, layer-scale
gammas; plus learned tokens (x_cls, pos_embed) which timm excludes via
model.no_weight_decay().
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def wd_mask(params) -> Any:
    """True where weight decay applies.

    Exclusions mirror timm: rank<=1 leaves (biases, norm scales, layer-scale
    gammas), learned tokens (x_cls, pos_embed — timm no_weight_decay() of
    PiT/CSWin, map_pit.py:160-161, ga_cswin.py:608-609), and rel-pos bias
    tables (rank 2/3 here) which MaxViT's no_weight_decay() excludes by name
    (/root/reference/MAP/models/map_maxvit.py:1271-1274). FasterViT's
    'rpb' keyword is intentionally NOT excluded: it is declared via
    no_weight_decay_keywords(), which timm's create_optimizer_v2 never
    consults, so the reference decays those parameters."""
    def leaf_mask(path, p):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if p.ndim <= 1:
            return False
        if name in ("x_cls", "pos_embed", "relative_position_bias_table"):
            return False
        return True

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def set_schedule_count(opt_state, count: int):
    """Point the LR-schedule step counter at `count` steps.

    timm steps its LR scheduler by epoch, independently of the optimizer
    (MAP/train.py:552-553 drops only optimizer/scaler state under
    --no-resume-opt). Here the schedule is keyed on the counter inside
    `optax`'s ScaleByScheduleState, so a rebuilt (`--no-resume-opt`) or
    epoch-overridden (`--start-epoch`) optimizer state must have that
    counter re-pointed or the warmup/cosine would silently rewind to step 0
    while the logs display the epoch-based LR. Only ScaleByScheduleState is
    touched: Adam/LAMB bias-correction counts stay fresh, as with a fresh
    torch optimizer."""
    is_sched = lambda x: isinstance(x, optax.ScaleByScheduleState)  # noqa: E731
    return jax.tree_util.tree_map(
        lambda x: optax.ScaleByScheduleState(
            count=jnp.asarray(count, jnp.int32)) if is_sched(x) else x,
        opt_state, is_leaf=is_sched)


def create_optimizer(
    opt: str = "lamb",
    learning_rate: Any = 1e-3,
    weight_decay: float = 0.0,
    eps: float = 1e-8,
    betas=(0.9, 0.999),
    momentum: float = 0.9,
    clip_grad: Optional[float] = None,
    clip_mode: str = "norm",
) -> optax.GradientTransformation:
    opt = opt.lower()
    mask = wd_mask
    if opt == "lamb":
        tx = optax.lamb(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                        weight_decay=weight_decay, mask=mask)
    elif opt == "adamw":
        tx = optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                         weight_decay=weight_decay, mask=mask)
    elif opt in ("sgd", "nesterov", "momentum"):
        # timm: 'sgd'/'nesterov' are Nesterov SGD, 'momentum' is plain SGD
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask),
            optax.sgd(learning_rate, momentum=momentum,
                      nesterov=opt != "momentum"),
        )
    elif opt == "adam":
        tx = optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
    else:
        raise ValueError(f"unknown optimizer {opt}")

    if clip_grad is not None:
        if clip_mode == "norm":
            clip = optax.clip_by_global_norm(clip_grad)
        elif clip_mode == "value":
            clip = optax.clip(clip_grad)
        else:  # 'agc' adaptive gradient clipping
            clip = optax.adaptive_grad_clip(clip_grad)
        tx = optax.chain(clip, tx)
    return tx
