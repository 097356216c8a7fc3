"""ZeRO-1 optimizer/EMA-state sharding tests (8-device virtual CPU mesh).

The reference's DDP replicates optimizer state per GPU; the TPU-native
extension shards the LAMB/AdamW moments and the EMA shadow over the data
axis via jit in/out sharding annotations (train/state.py zero1 path).
These tests pin (a) the spec-picking rule, (b) numerical equivalence with
the replicated shard_map step, (c) that the state actually comes back
sharded, and (d) that eval/EMA paths consume a zero1-placed state.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from imagenet_models_tpu.models.convnext import ConvNeXt
from imagenet_models_tpu.parallel.mesh import data_mesh, shard_batch, zero1_spec
from imagenet_models_tpu.train.losses import create_loss_fn
from imagenet_models_tpu.train.optim import create_optimizer
from imagenet_models_tpu.train.state import (
    create_train_state,
    make_eval_step,
    make_train_step,
    place_state,
)

from conftest import cpu_devices


def test_zero1_spec_rule():
    assert zero1_spec((), 8) == P()
    assert zero1_spec((7,), 8) == P()          # indivisible -> replicated
    assert zero1_spec((16,), 8) == P("data")
    assert zero1_spec((7, 7, 96), 8) == P(None, None, "data")
    assert zero1_spec((128, 4, 96), 8) == P("data", None, None)  # largest wins
    assert zero1_spec((8, 8), 8) == P("data", None)  # tie -> first largest


def _setup(mmcap, zero1, ema=0.999, n_dev=8, grad_accum=1):
    mesh = data_mesh(cpu_devices(n_dev))
    if mmcap:
        model = ConvNeXt(depths=(1, 1, 1, 1), dims=(8, 8, 16, 16), num_classes=13,
                         global_pool="mmcap", last_dim=16, n_groups=2, n_tokens=2,
                         gram_group=2, bp_dim=16, ca_dim=16, num_heads=2)
    else:
        model = ConvNeXt(depths=(1, 1, 1, 1), dims=(8, 8, 16, 16), num_classes=13)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), training=False)
    tx = create_optimizer("lamb", learning_rate=1e-3, weight_decay=0.05)
    state = place_state(create_train_state(variables, tx, ema_decay=ema), mesh, zero1=zero1)
    loss = create_loss_fn(bce_loss=False, smoothing=0.1)
    step = make_train_step(model, tx, loss, dec_lam=-0.8, ema_decay=ema,
                           grad_accum=grad_accum, mesh=mesh, zero1=zero1)
    return mesh, model, state, step


def _batch(mesh, n=16, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.standard_normal((n, 32, 32, 3)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 13, (n,)))
    return shard_batch((images, targets), mesh)


def test_zero1_matches_replicated():
    # no-BN model: gradient math must match the shard_map path bit-for-noise
    mesh, _, s_rep, step_rep = _setup(mmcap=False, zero1=False)
    _, _, s_z1, step_z1 = _setup(mmcap=False, zero1=True)
    images, targets = _batch(mesh)
    for i in range(3):
        s_rep, m_rep = step_rep(s_rep, images, targets, jax.random.PRNGKey(i))
        s_z1, m_z1 = step_z1(s_z1, images, targets, jax.random.PRNGKey(i))
        assert abs(float(m_rep["loss"]) - float(m_z1["loss"])) < 1e-4
    flat_r = jax.tree.leaves(s_rep.params)
    flat_z = jax.tree.leaves(s_z1.params)
    for a, b in zip(flat_r, flat_z):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_zero1_state_actually_sharded():
    _, _, state, step = _setup(mmcap=False, zero1=True)
    big = [x for x in jax.tree.leaves(state.opt_state)
           if hasattr(x, "sharding") and x.ndim >= 2]
    assert big and any(not x.sharding.is_fully_replicated for x in big)
    assert any(not x.sharding.is_fully_replicated
               for x in jax.tree.leaves(state.ema_params) if x.ndim >= 2)
    # params stay replicated (they feed the forward pass every microstep)
    assert all(x.sharding.is_fully_replicated for x in jax.tree.leaves(state.params))
    # and the step preserves the placement
    mesh = data_mesh(cpu_devices(8))
    images, targets = _batch(mesh)
    state, _ = step(state, images, targets, jax.random.PRNGKey(0))
    assert any(not x.sharding.is_fully_replicated
               for x in jax.tree.leaves(state.opt_state) if x.ndim >= 2)
    assert all(x.sharding.is_fully_replicated for x in jax.tree.leaves(state.params))


def test_zero1_grad_accum_matches_replicated():
    """Pins the microbatch regrouping in the global-jit (zero1) grad-accum
    path (train/state.py local_step n_shards>1): microbatch a must take rows
    *within every device shard* — exactly the shard_map path's per-device
    grouping — so the two paths see identical microbatch compositions and
    produce identical losses/params, and GSPMD never reshuffles rows across
    devices between scan steps."""
    mesh, _, s_rep, step_rep = _setup(mmcap=False, zero1=False, grad_accum=2)
    _, _, s_z1, step_z1 = _setup(mmcap=False, zero1=True, grad_accum=2)
    images, targets = _batch(mesh)
    for i in range(3):
        s_rep, m_rep = step_rep(s_rep, images, targets, jax.random.PRNGKey(i))
        s_z1, m_z1 = step_z1(s_z1, images, targets, jax.random.PRNGKey(i))
        assert abs(float(m_rep["loss"]) - float(m_z1["loss"])) < 1e-4
    for a, b in zip(jax.tree.leaves(s_rep.params), jax.tree.leaves(s_z1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_zero1_mmcap_trains_and_evals():
    # BN-bearing mmcap head: global-batch stats (exact SyncBN); loss falls,
    # EMA eval path consumes the sharded EMA shadow
    mesh, model, state, step = _setup(mmcap=True, zero1=True, grad_accum=2)
    images, targets = _batch(mesh)
    losses = []
    for i in range(3):
        state, metrics = step(state, images, targets, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    eval_step = make_eval_step(model, mesh=mesh, use_ema=True)
    logits, c1, c5 = eval_step(state, images, targets)
    assert np.isfinite(np.asarray(logits)).all()
