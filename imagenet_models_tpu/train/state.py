"""Train state + SPMD train/eval steps.

The DDP training loop of the reference (/root/reference/GA/train.py:701-823,
MAP/train.py:842-977) maps onto a single jitted SPMD step:

- params/opt_state/EMA replicated over the mesh, batch sharded on 'data'
- gradient accumulation (`--grad-accumulation`, GA/train.py:750-758) becomes
  a lax.scan over microbatch chunks *inside* the step — one optimizer update
  per step, identical math, zero Python overhead
- the DDP bucketed allreduce becomes one `lax.pmean` over 'data' (ICI)
- BatchNorm batch stats are pmean-synced every update (a strictly stronger
  version of the reference's per-epoch `--dist-bn reduce`, GA/train.py:665-668;
  stats tensors are tiny so the collective is noise)
- EMA (ModelEmaV2, decay 0.9999) updates params+batch_stats after the
  optimizer step
- bf16 compute happens inside the model (dtype policy); no loss scaling is
  needed on TPU (replaces the reference's AMP GradScaler)
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from imagenet_models_tpu.nn.heads import average_head_logits
from imagenet_models_tpu.parallel.mesh import DATA_AXIS, zero1_spec
from imagenet_models_tpu.train.losses import multi_head_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None
    ema_batch_stats: Any = None


def create_train_state(variables, tx: optax.GradientTransformation,
                       ema_decay: float = 0.0) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema_decay else None,
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats) if ema_decay else None,
    )


def zero1_state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """Sharding tree for ZeRO-1 placement: params/batch_stats replicated,
    optimizer state and EMA shadows sharded over the data axis.

    The reference's DDP keeps a full optimizer-state replica per GPU; here
    the m/v moments (2x params in fp32 for LAMB/AdamW) and the EMA copy live
    sharded in HBM and XLA inserts the gather/scatter collectives around the
    (cheap, elementwise) optimizer update — the jit-and-annotate recipe, no
    manual collectives."""
    rep = NamedSharding(mesh, P())
    n = int(np_size(mesh))

    def z(x):
        return NamedSharding(mesh, zero1_spec(jnp.shape(x), n))

    def ztree(t):
        return None if t is None else jax.tree.map(z, t)

    return TrainState(
        step=rep,
        params=jax.tree.map(lambda _: rep, state.params),
        batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
        opt_state=jax.tree.map(z, state.opt_state),
        ema_params=ztree(state.ema_params),
        ema_batch_stats=ztree(state.ema_batch_stats),
    )


def np_size(mesh: Mesh) -> int:
    return mesh.devices.size


def place_state(state: TrainState, mesh: Mesh, zero1: bool = False) -> TrainState:
    """Place a TrainState on the mesh: fully replicated (DDP semantics) or
    with ZeRO-1 optimizer/EMA sharding."""
    if not zero1 or np_size(mesh) == 1:
        from imagenet_models_tpu.parallel.mesh import replicate

        return replicate(state, mesh)
    sh = zero1_state_shardings(state, mesh)
    return jax.tree.map(jax.device_put, state, sh)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    base_loss: Callable,
    dec_lam: float = 0.0,
    ema_decay: float = 0.0,
    grad_accum: int = 1,
    mesh: Optional[Mesh] = None,
    token_distillation: bool = True,
    zero1: bool = False,
):
    """Build the jitted SPMD train step.

    Returns step(state, images, targets, rng) -> (state, metrics). images are
    the *global* batch (grad_accum * global_microbatch, H, W, C), sharded on
    axis 0 over the mesh.

    zero1=True switches from the shard_map/pmean formulation to a global jit
    whose in/out shardings keep optimizer+EMA state ZeRO-1-sharded over the
    data axis (see zero1_state_shardings); the state must have been placed
    with place_state(..., zero1=True). Gradient math is identical (global
    batch mean == pmean of per-shard means); BatchNorm stats become exact
    global-batch stats (vs pmean of per-shard stats), a strictly-stronger
    SyncBN.
    """

    def loss_fn(params, batch_stats, images, targets, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mutated = model.apply(
            variables, images, training=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        if isinstance(out, (tuple, list)):
            loss = multi_head_loss(out, targets, base_loss, dec_lam,
                                   token_distillation=token_distillation)
        else:
            loss = base_loss(out, targets)
        return loss, mutated.get("batch_stats", {})

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def local_step(state: TrainState, images, targets, rng, reduce=None,
                   n_shards: int = 1):
        if grad_accum == 1:
            # no microbatching: skip the scan (and its zero-init + add pass
            # over the full gradient tree)
            (loss, batch_stats), grads = grad_fn(
                state.params, state.batch_stats, images, targets, rng)
        else:
            # per-shard microbatching
            b = images.shape[0]
            mb = b // grad_accum
            if n_shards > 1 and mb % n_shards == 0:
                # global-jit (zero1) path: a plain contiguous reshape would
                # make microbatch a = global rows [a*mb, (a+1)*mb), held by
                # only n_shards/grad_accum devices — GSPMD would all-to-all
                # every scan step. Regroup so each microbatch takes rows
                # *within every device shard* (exactly the shard_map path's
                # per-device grouping): (B,)->(D, A, per) is shard-local, and
                # so are the (D,A) swap and the in-scan (D,per) flatten.
                per = mb // n_shards
                batch_sh = NamedSharding(mesh, P(DATA_AXIS))

                def regroup(x):
                    x = x.reshape(n_shards, grad_accum, per, *x.shape[1:])
                    x = jax.lax.with_sharding_constraint(x, batch_sh)
                    return jnp.swapaxes(x, 0, 1)

                def flat_mb(x):
                    return jax.lax.with_sharding_constraint(
                        x.reshape(x.shape[0] * x.shape[1], *x.shape[2:]), batch_sh)

                images, targets = regroup(images), regroup(targets)
            else:
                def flat_mb(x):
                    return x

                images = images.reshape(grad_accum, mb, *images.shape[1:])
                targets = targets.reshape(grad_accum, mb, *targets.shape[1:])
            rngs = jax.random.split(rng, grad_accum)

            def micro(carry, xs):
                gsum, _, bstats = carry
                im, tg, r = xs
                (loss, new_bs), grads = grad_fn(
                    state.params, bstats, flat_mb(im), flat_mb(tg), r)
                gsum = jax.tree.map(jnp.add, gsum, grads)
                return (gsum, loss, new_bs if new_bs else bstats), loss

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (gsum, _, batch_stats), losses = jax.lax.scan(
                micro, (zero_grads, 0.0, state.batch_stats), (images, targets, rngs))
            grads = jax.tree.map(lambda g: g / grad_accum, gsum)
            loss = losses.mean()

        # cross-replica reductions (the DDP allreduce analog); in the zero1
        # global-jit formulation the batch is already global so reduce=None
        if reduce is not None:
            grads = reduce(grads)
            loss = reduce(loss)
            if batch_stats:
                batch_stats = reduce(batch_stats)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        ema_params, ema_bs = state.ema_params, state.ema_batch_stats
        if ema_decay and ema_params is not None:
            d = ema_decay
            ema_params = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema_params, params)
            if ema_bs is not None and batch_stats:
                ema_bs = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema_bs, batch_stats)

        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=batch_stats, opt_state=opt_state,
                                  ema_params=ema_params, ema_batch_stats=ema_bs)
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    if mesh is None:
        # a 1-device mesh makes the named axis available uniformly
        from imagenet_models_tpu.parallel.mesh import data_mesh

        mesh = data_mesh(jax.devices()[:1])

    if zero1:
        # global-jit formulation: the step body sees the global batch; the
        # in/out sharding annotations (taken from the concrete input state at
        # first call, so a place_state(zero1=True) placement is preserved)
        # make XLA slice the optimizer update per device and all-gather the
        # fresh params — the ZeRO-1 dance, with zero manual collectives.
        cache = {}

        def step(state, images, targets, rng):
            if "fn" not in cache:
                st_sh = jax.tree.map(lambda x: x.sharding, state)
                batch_sh = NamedSharding(mesh, P(DATA_AXIS))
                rep = NamedSharding(mesh, P())
                cache["fn"] = jax.jit(
                    lambda st, im, tg, r: local_step(
                        st, im, tg, r, reduce=None, n_shards=np_size(mesh)),
                    in_shardings=(st_sh, batch_sh, batch_sh, rep),
                    out_shardings=(st_sh, rep),
                    donate_argnums=(0,),
                )
            return cache["fn"](state, images, targets, rng)

        return step

    pmean = functools.partial(jax.lax.pmean, axis_name=DATA_AXIS)
    sharded = shard_map(
        lambda st, im, tg, r: local_step(st, im, tg, jax.random.fold_in(
            r, jax.lax.axis_index(DATA_AXIS)), reduce=pmean),
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(model, mesh: Optional[Mesh] = None, use_ema: bool = False,
                   tta: int = 0):
    """Eval step: forward, average multi-head logits (the reference's
    mean-over-heads, /root/reference/MAP/validate.py:275-279), return top1/5
    correctness flags per example.

    tta>1 additionally averages logits over groups of `tta` consecutive
    samples and strides the targets (MAP/train.py:1009-1012 `output.unfold`);
    the returned flags then have B//tta entries (remainder dropped, as the
    reference's unfold does)."""

    def fwd(params, batch_stats, images, targets):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, images, training=False)
        logits = average_head_logits(out)
        if tta and tta > 1:
            g = logits.shape[0] // tta
            logits = logits[: g * tta].reshape(g, tta, -1).mean(axis=1)
            targets = targets[: g * tta : tta]
        top5 = jax.lax.top_k(logits, 5)[1]
        correct1 = (top5[:, 0] == targets).astype(jnp.float32)
        correct5 = (top5 == targets[:, None]).any(axis=1).astype(jnp.float32)
        return logits, correct1, correct5

    def step(state: TrainState, images, targets):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        bs = state.ema_batch_stats if (use_ema and state.ema_batch_stats is not None) else state.batch_stats
        return fwd(params, bs, images, targets)

    if mesh is None:
        return jax.jit(step)
    # state sharding is inferred from the argument (None): a replicated state
    # passes through untouched, a zero1-sharded state (EMA shadow sharded over
    # 'data') gets its gathers inserted by XLA inside the compiled step
    return jax.jit(step, in_shardings=(None,
                                       NamedSharding(mesh, P(DATA_AXIS)),
                                       NamedSharding(mesh, P(DATA_AXIS))),
                   out_shardings=NamedSharding(mesh, P(DATA_AXIS)))
