"""SPMD train/eval step tests on an 8-device virtual CPU mesh (SURVEY §4c):
gradient pmean, grad accumulation, EMA, batch-stat sync, multi-head loss,
and seed determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagenet_models_tpu.models.convnext import ConvNeXt
from imagenet_models_tpu.parallel.mesh import data_mesh, replicate, shard_batch
from imagenet_models_tpu.train.losses import create_loss_fn
from imagenet_models_tpu.train.optim import create_optimizer
from imagenet_models_tpu.train.scheduler import cosine_schedule
from imagenet_models_tpu.train.state import TrainState, create_train_state, make_eval_step, make_train_step

from conftest import cpu_devices


def tiny_model(mmcap=False):
    if mmcap:
        return ConvNeXt(depths=(1, 1, 1, 1), dims=(8, 8, 16, 16), num_classes=13,
                        global_pool="mmcap", last_dim=16, n_groups=2, n_tokens=2,
                        gram_group=2, bp_dim=16, ca_dim=16, num_heads=2)
    return ConvNeXt(depths=(1, 1, 1, 1), dims=(8, 8, 16, 16), num_classes=13)


def _setup(mmcap, grad_accum=1, n_dev=8, ema=0.0):
    mesh = data_mesh(cpu_devices(n_dev))
    model = tiny_model(mmcap)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, training=False)
    lr = cosine_schedule(1e-3, epochs=10, warmup_epochs=1)
    tx = create_optimizer("lamb", learning_rate=lambda s: lr(s / 10.0), weight_decay=0.05)
    state = create_train_state(variables, tx, ema_decay=ema)
    state = replicate(state, mesh)
    base_loss = create_loss_fn(bce_loss=False, smoothing=0.1)
    step = make_train_step(model, tx, base_loss, dec_lam=-0.8, ema_decay=ema,
                           grad_accum=grad_accum, mesh=mesh)
    return mesh, model, state, step


def _batch(mesh, n=16, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.standard_normal((n, 32, 32, 3)).astype(np.float32)
    targets = rng.integers(0, 13, (n,))
    return shard_batch((jnp.asarray(images), jnp.asarray(targets)), mesh)


def test_train_step_runs_and_learns():
    mesh, model, state, step = _setup(mmcap=True, grad_accum=2, ema=0.999)
    images, targets = _batch(mesh)
    losses = []
    for i in range(3):
        state, metrics = step(state, images, targets, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses  # overfits a fixed batch
    assert int(state.step) == 3
    # EMA drifted from init but not equal to params
    pl = jax.tree.leaves(state.params)[0]
    el = jax.tree.leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(pl), np.asarray(el))


def test_determinism_same_seed():
    losses = {}
    for run in range(2):
        mesh, model, state, step = _setup(mmcap=False)
        images, targets = _batch(mesh, seed=7)
        state, metrics = step(state, images, targets, jax.random.PRNGKey(42))
        losses[run] = float(metrics["loss"])
    assert losses[0] == losses[1]


def test_grad_accum_equivalence():
    """2 microbatches of 8 == 1 batch of 16 (same total, averaged grads)."""
    out = {}
    for accum in (1, 2):
        mesh, model, state, step = _setup(mmcap=False, grad_accum=accum)
        images, targets = _batch(mesh, n=16, seed=3)
        state, metrics = step(state, images, targets, jax.random.PRNGKey(0))
        out[accum] = np.asarray(jax.tree.leaves(state.params)[0])
    np.testing.assert_allclose(out[1], out[2], rtol=2e-2, atol=2e-4)


def test_eval_step_multihead_mean():
    mesh, model, state, step = _setup(mmcap=True)
    eval_step = make_eval_step(model, mesh=mesh)
    images, targets = _batch(mesh)
    logits, c1, c5 = eval_step(state, images, targets)
    assert logits.shape == (16, 13)
    assert c1.shape == (16,) and c5.shape == (16,)
    assert float(c5.sum()) >= float(c1.sum())
