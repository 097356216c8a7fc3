"""The transformer norm2+Mlp fused-kernel route (IMTPU_TLNMLP=1) must keep
the param tree byte-identical to the module path and reproduce its outputs
and gradients (CPU: the op dispatches to plain_ln_mlp, so this pins the
ParamHolder wiring + numerics contract; TPU parity rides the existing
fused_ln_mlp parity/trajectory tests)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagenet_models_tpu.models.maxvit import PartitionAttention
from imagenet_models_tpu.nn.vit import ViTBlock
from imagenet_models_tpu.ops.cswin_attention import CSWinBlock


def _trees(m, x):
    # all three block classes default to eval mode with no kwargs
    os.environ["IMTPU_TLNMLP"] = "1"
    try:
        v_fused = m.init(jax.random.PRNGKey(0), x)
    finally:
        os.environ.pop("IMTPU_TLNMLP", None)
    v_plain = m.init(jax.random.PRNGKey(0), x)
    return v_fused, v_plain


def _cases():
    c = 64
    return [
        ("maxvit", PartitionAttention(c, "block", (7, 7)),
         0.5 * jax.random.normal(jax.random.PRNGKey(3), (2, 14, 14, c))),
        ("pit", ViTBlock(c, num_heads=2),
         0.5 * jax.random.normal(jax.random.PRNGKey(4), (2, 49, c))),
        ("cswin", CSWinBlock(c, num_heads=2, split_size=2),
         0.5 * jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, c))),
    ]


@pytest.mark.parametrize("name,m,x", _cases(), ids=[c[0] for c in _cases()])
def test_param_tree_and_outputs_match(name, m, x):
    v_fused, v_plain = _trees(m, x)
    pf = jax.tree_util.tree_leaves_with_path(v_fused["params"])
    pp = jax.tree_util.tree_leaves_with_path(v_plain["params"])
    assert [str(p) for p, _ in pf] == [str(p) for p, _ in pp]
    assert [l.shape for _, l in pf] == [l.shape for _, l in pp]

    def run(vs, flag):
        if flag:
            os.environ["IMTPU_TLNMLP"] = "1"
        try:
            return m.apply(vs, x)
        finally:
            os.environ.pop("IMTPU_TLNMLP", None)

    out_f = run(v_plain, True)
    out_p = run(v_plain, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-2, atol=2e-2)  # CPU bf16 matmuls

    def loss(vs, flag):
        return jnp.sum(run(vs, flag).astype(jnp.float32) ** 2)

    g_f = jax.grad(lambda vs: loss(vs, True))(v_plain)
    g_p = jax.grad(lambda vs: loss(vs, False))(v_plain)
    for (pa, ga), (_, gb) in zip(
            jax.tree_util.tree_leaves_with_path(g_f),
            jax.tree_util.tree_leaves_with_path(g_p)):
        scale = max(1.0, float(np.max(np.abs(np.asarray(gb)))))
        np.testing.assert_allclose(np.asarray(ga) / scale,
                                   np.asarray(gb) / scale,
                                   rtol=3e-2, atol=3e-2, err_msg=str(pa))
