"""timm-Lamb semantics: our optax transformation vs a torch twin implementing
the reference's optimizer math (timm 0.9.2 Lamb — global-grad-norm
pre-division, eps=1e-6 outside the corrected sqrt, trust ratio only on
weight-decay groups). See tests/torch_optim_twin.py for the spec."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from torch_optim_twin import RefLamb  # noqa: E402

from imagenet_models_tpu.train.optim import (  # noqa: E402
    create_optimizer, timm_lamb, wd_mask)


def _toy_tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "conv": {"kernel": rng.normal(size=(3, 3, 4, 8)).astype(np.float32),
                 "bias": rng.normal(size=(8,)).astype(np.float32)},
        "dense": {"kernel": rng.normal(size=(16, 10)).astype(np.float32)},
        "norm": {"scale": rng.normal(size=(16,)).astype(np.float32) + 1.0},
    }


def _grads_for(tree, rng, scale=1.0):
    return jax.tree.map(
        lambda p: rng.normal(size=p.shape).astype(np.float32) * scale, tree)


@pytest.mark.parametrize("gscale", [1.0, 0.01, 40.0])
def test_timm_lamb_matches_torch_twin(gscale):
    """10 steps on a toy tree: jax and torch twins agree leaf-for-leaf.

    gscale sweeps the global grad norm below and above 1.0, exercising both
    branches of the max(1, gnorm) pre-division."""
    params = _toy_tree()
    lr, wd, eps = 3e-3, 0.05, 1e-6
    mask = wd_mask(params)

    # torch side: one group per decay class
    tparams = jax.tree.map(
        lambda p: torch.nn.Parameter(torch.from_numpy(np.array(p))), params)
    leaves, _ = jax.tree.flatten(tparams)
    mleaves = jax.tree.flatten(mask)[0]
    groups = [
        {"params": [p for p, m in zip(leaves, mleaves) if not m],
         "weight_decay": 0.0},
        {"params": [p for p, m in zip(leaves, mleaves) if m],
         "weight_decay": wd},
    ]
    topt = RefLamb(groups, lr=lr, eps=eps, weight_decay=wd)

    tx = timm_lamb(lr, eps=eps, weight_decay=wd, mask=wd_mask)
    jparams = jax.tree.map(jnp.asarray, params)
    opt_state = tx.init(jparams)

    rng = np.random.default_rng(7)
    for step in range(10):
        grads = _grads_for(params, rng, gscale)
        # torch
        for p, g in zip(leaves, jax.tree.flatten(grads)[0]):
            p.grad = torch.from_numpy(np.array(g))
        topt.step()
        # jax
        jgrads = jax.tree.map(jnp.asarray, grads)
        updates, opt_state = tx.update(jgrads, opt_state, jparams)
        jparams = optax.apply_updates(jparams, updates)

    for (path, j), t in zip(jax.tree_util.tree_flatten_with_path(jparams)[0],
                            leaves):
        np.testing.assert_allclose(np.asarray(j), t.detach().numpy(),
                                   rtol=2e-5, atol=2e-6, err_msg=str(path))


def test_timm_lamb_differs_from_optax_lamb():
    """Sensitivity check: with a large-gradient step, plain optax.lamb and the
    timm semantics diverge (pre-division + no-trust-on-no-decay)."""
    params = jax.tree.map(jnp.asarray, _toy_tree())
    rng = np.random.default_rng(3)
    grads = jax.tree.map(jnp.asarray, _grads_for(params, rng, 10.0))

    tx1 = timm_lamb(1e-2, eps=1e-6, weight_decay=0.05, mask=wd_mask)
    tx2 = optax.lamb(1e-2, eps=1e-6, weight_decay=0.05, mask=wd_mask)
    u1, _ = tx1.update(grads, tx1.init(params), params)
    u2, _ = tx2.update(grads, tx2.init(params), params)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), u1, u2)
    assert max(jax.tree.flatten(diffs)[0]) > 1e-4


def test_create_optimizer_eps_defaults():
    """eps=None resolves to the per-optimizer reference defaults (lamb 1e-6,
    adamw 1e-8) and an explicit eps overrides."""
    p = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    g = {"w": jnp.full((4, 4), 1e-4), "b": jnp.full((4,), 1e-4)}

    def one_step(tx):
        st = tx.init(p)
        u, _ = tx.update(g, st, p)
        return u

    # tiny grads make the eps term dominate the denom: 1e-6 vs 1e-8 visible
    u_default = one_step(create_optimizer("lamb", learning_rate=1.0,
                                          weight_decay=0.0))
    u_1e6 = one_step(create_optimizer("lamb", learning_rate=1.0,
                                      weight_decay=0.0, eps=1e-6))
    u_1e8 = one_step(create_optimizer("lamb", learning_rate=1.0,
                                      weight_decay=0.0, eps=1e-8))
    np.testing.assert_allclose(np.asarray(u_default["w"]),
                               np.asarray(u_1e6["w"]), rtol=0, atol=0)
    assert float(jnp.abs(u_1e6["w"] - u_1e8["w"]).max()) > 1e-9
