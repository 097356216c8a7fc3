"""Gradient-checkpointing parity (reference: ga_cswin.py:640-657 use_chk via
torch.utils.checkpoint; map_maxvit.py:1040-1044 checkpoint_seq).

nn.remat is a lifted transform: the param tree, forward values, and gradients
must be identical with and without it — only activation memory/FLOPs differ.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import imagenet_models_tpu.models  # noqa: F401
from imagenet_models_tpu.models.ga_cswin import GA_CSWinTransformer
from imagenet_models_tpu.models.maxvit import MaxxVit

CPU = jax.devices("cpu")[0]


def _tiny_cswin(**kw):
    return GA_CSWinTransformer(
        embed_dim=16, depth=(1, 1, 5, 1), dims=(16, 32, 64, 128),
        num_heads=(2, 2, 2, 2, 2), split_size=(1, 2, 7, 7, 7),
        # gram_dim: half-channel branches get 3 of the gram block's 6 heads
        # (48/2=24 -> d=8) and triu(48)=1176 divides the g=8 grouped convs
        num_classes=11, stage3_naggre=4, branches=2, gram_dim=48, **kw)


def _tiny_maxvit(**kw):
    # embed dims must be multiples of dim_head=32 (AttentionCl head split)
    return MaxxVit(embed_dim=(32, 64, 96, 128), depths=(1, 1, 1, 1),
                   stem_width=16, num_classes=11, head_hidden_size=32,
                   global_pool="avg", **kw)


@pytest.mark.parametrize("family", ["cswin", "maxvit"])
def test_remat_is_a_noop_numerically(family):
    with jax.default_device(CPU):
        if family == "cswin":
            base, chk = _tiny_cswin(), _tiny_cswin(use_chk=True)
            # stem /4 then /2 per stage: 56,28,14,7 — split (1,2,7,7,7) divides
            x = jnp.ones((2, 224, 224, 3), jnp.float32)
        else:
            base, chk = _tiny_maxvit(), _tiny_maxvit(grad_checkpointing=True)
            x = jnp.ones((2, 64, 64, 3), jnp.float32)

        v_base = base.init(jax.random.PRNGKey(0), x, training=True)
        v_chk = chk.init(jax.random.PRNGKey(0), x, training=True)
        assert (jax.tree_util.tree_structure(v_base)
                == jax.tree_util.tree_structure(v_chk))

        def loss(model, variables):
            def f(params):
                out = model.apply(
                    {**variables, "params": params}, x, training=True,
                    rngs={"dropout": jax.random.PRNGKey(1)},
                    mutable=["batch_stats"])[0]
                leaves = jax.tree_util.tree_leaves(out)
                return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in leaves)
            return f

        params = v_base["params"]
        l0, g0 = jax.value_and_grad(loss(base, v_base))(params)
        l1, g1 = jax.value_and_grad(loss(chk, v_base))(params)
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
