"""Fused two-branch stripe attention ≡ the reference-shaped two-call path.

The fused path (ops/cswin_attention.py:_fused_branches) batches the H- and
V-stripe half-channel branches into one attention einsum. It must be
numerically equivalent (up to fp reduction order) and share the exact same
param tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import imagenet_models_tpu.ops.cswin_attention as ca

CPU = jax.devices("cpu")[0]


@pytest.mark.parametrize("hw,split,heads", [(28, 2, 4), (14, 7, 8)])
def test_fused_matches_two_call_path(monkeypatch, hw, split, heads):
    dim = 64
    with jax.default_device(CPU):
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, hw, hw, dim)), jnp.float32)
        blk = ca.CSWinBlock(dim, heads, split_size=split)

        monkeypatch.setattr(ca, "_CSWIN_FUSED", False)
        v_ref = blk.init(jax.random.PRNGKey(0), x, True)
        y_ref = blk.apply(v_ref, x, True,
                          rngs={"dropout": jax.random.PRNGKey(1)})

        monkeypatch.setattr(ca, "_CSWIN_FUSED", True)
        v_fused = blk.init(jax.random.PRNGKey(0), x, True)
        assert (jax.tree_util.tree_structure(v_ref)
                == jax.tree_util.tree_structure(v_fused))
        y_fused = blk.apply(v_ref, x, True,
                            rngs={"dropout": jax.random.PRNGKey(1)})

        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)

        # gradients agree too (the fused path must be exactly as trainable)
        def loss(fused):
            monkeypatch.setattr(ca, "_CSWIN_FUSED", fused)
            def f(p):
                y = blk.apply(p, x, True, rngs={"dropout": jax.random.PRNGKey(1)})
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return jax.grad(f)(v_ref)

        g_ref, g_fused = loss(False), loss(True)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_fused)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
