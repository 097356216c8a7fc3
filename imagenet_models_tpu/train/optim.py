"""Optimizer factory (optax) mirroring timm create_optimizer_v2 behaviour
(/root/reference/GA/train.py:466, MAP recipes use lamb/adamw).

Weight decay is masked off for 1-D parameters and biases (timm param-group
rule) — in our pytrees that means: any leaf of rank <= 1 except conv/dense
kernels (which are never rank <= 1), i.e. biases, norm scales, layer-scale
gammas; plus learned tokens (x_cls, pos_embed) which timm excludes via
model.no_weight_decay().
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

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


class TimmLambState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_timm_lamb(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    mask: Any = None,
    max_grad_norm: Optional[float] = 1.0,
    trust_clip: bool = False,
    always_adapt: bool = False,
    bias_correction: bool = True,
    grad_averaging: bool = True,
) -> optax.GradientTransformation:
    """timm 0.9.2 `Lamb` semantics (the pin at /root/reference/MAP/README.MD:15;
    instantiated via create_optimizer_v2 at GA/train.py:466, MAP/train.py:505),
    which `optax.lamb` does NOT match:

    1. ALL gradients are pre-divided by ``max(1, global_grad_norm /
       max_grad_norm)`` (``max_grad_norm=1.0`` default) before the Adam
       update — an implicit global-norm clip baked into every reference LAMB
       recipe.
    2. ``eps`` defaults to 1e-6 (optax/Adam convention is 1e-8) and is added
       OUTSIDE the bias-corrected sqrt: ``denom = sqrt(v)/sqrt(bc2) + eps``.
    3. The layer-wise trust ratio ``||p|| / ||update||`` is applied ONLY to
       parameters whose group has ``weight_decay != 0`` (unless
       ``always_adapt``): timm's no-decay group (1-D params +
       no_weight_decay()) gets a plain Adam update, where optax.lamb adapts
       every leaf.

    Emits the *positive* update (chain with scale_by_learning_rate which
    flips the sign), matching ``p.add_(update, alpha=-lr)``.
    """

    def init(params):
        return TimmLambState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("timm-lamb requires params")
        if max_grad_norm is not None:
            gnorm = optax.global_norm(grads)
            clip = jnp.maximum(gnorm / max_grad_norm, 1.0)
            grads = jax.tree.map(lambda g: g / clip, grads)
        count = state.count + 1
        beta3 = (1.0 - b1) if grad_averaging else 1.0
        mu = jax.tree.map(lambda m, g: b1 * m + beta3 * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, grads)
        if bias_correction:
            c = count.astype(jnp.float32)
            bc1 = 1.0 - jnp.power(b1, c)
            bc2_sqrt = jnp.sqrt(1.0 - jnp.power(b2, c))
        else:
            bc1 = 1.0
            bc2_sqrt = 1.0
        decay_mask = mask(params) if callable(mask) else mask

        def leaf_update(m, v, p, use_wd):
            upd = (m / bc1) / (jnp.sqrt(v) / bc2_sqrt + eps)
            wd = weight_decay if use_wd else 0.0
            if wd:
                upd = upd + wd * p
            if wd or always_adapt:
                w_norm = jnp.sqrt(jnp.sum(jnp.square(p)))
                g_norm = jnp.sqrt(jnp.sum(jnp.square(upd)))
                trust = jnp.where(
                    w_norm > 0, jnp.where(g_norm > 0, w_norm / g_norm, 1.0), 1.0)
                if trust_clip:
                    trust = jnp.minimum(trust, 1.0)
                upd = upd * trust
            return upd

        if decay_mask is None:
            decay_mask = jax.tree.map(lambda _: True, params)
        updates = jax.tree.map(leaf_update, mu, nu, params, decay_mask)
        return updates, TimmLambState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def timm_lamb(learning_rate: Any, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-6, weight_decay: float = 0.0, mask: Any = None,
              max_grad_norm: Optional[float] = 1.0, trust_clip: bool = False,
              always_adapt: bool = False) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_timm_lamb(b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
                           mask=mask, max_grad_norm=max_grad_norm,
                           trust_clip=trust_clip, always_adapt=always_adapt),
        optax.scale_by_learning_rate(learning_rate),
    )


# the reference parser's --opt-eps default is None -> each optimizer's own
# default (GA/train.py:128): timm Lamb 1e-6, torch AdamW/Adam 1e-8. The
# headline LAMB recipes pass no --opt-eps, so they train at 1e-6.
_OPT_DEFAULT_EPS = {"lamb": 1e-6, "adamw": 1e-8, "adam": 1e-8}


def create_optimizer(
    opt: str = "lamb",
    learning_rate: Any = 1e-3,
    weight_decay: float = 0.0,
    eps: Optional[float] = None,
    betas=(0.9, 0.999),
    momentum: float = 0.9,
    clip_grad: Optional[float] = None,
    clip_mode: str = "norm",
) -> optax.GradientTransformation:
    opt = opt.lower()
    mask = wd_mask
    if eps is None:
        eps = _OPT_DEFAULT_EPS.get(opt, 1e-8)
    if opt == "lamb":
        tx = timm_lamb(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
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
