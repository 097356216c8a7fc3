"""Numerical parity of the MAP head library vs the reference torch module.

The reference `MAP/models/map.py` is framework-free torch (no timm), so we can
import it directly, randomly initialise a torch MAPHead, convert its
state_dict through imagenet_models_tpu.ckpt, and require matching outputs.
This validates modules AND the checkpoint converter in one shot — the
de-facto acceptance test given the reference ships no test suite (SURVEY §4).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/MAP/models")
import map as ref_map  # noqa: E402  (the reference's map.py)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from torch import nn as tnn  # noqa: E402

from imagenet_models_tpu.ckpt import RuleTranslator, convert_torch_state_dict  # noqa: E402
from imagenet_models_tpu.ckpt.torch_convert import MAP_HEAD_RULES  # noqa: E402
from imagenet_models_tpu.nn import heads as jheads  # noqa: E402
from flax import linen as fnn  # noqa: E402


def _rand_pyramid(rng, shapes):
    """NCHW torch tensors + NHWC jnp arrays of the same values."""
    torch_feats, jax_feats = [], []
    for (c, h, w) in shapes:
        a = rng.standard_normal((2, c, h, w)).astype(np.float32)
        torch_feats.append(torch.from_numpy(a))
        jax_feats.append(jnp.asarray(a.transpose(0, 2, 3, 1)))
    return torch_feats, jax_feats


def _convert(tmodel, jmodel, jax_feats):
    variables = jmodel.init(jax.random.PRNGKey(0), jax_feats, training=False)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    translate = RuleTranslator(MAP_HEAD_RULES, drop=[r"bp_index$"])
    return convert_torch_state_dict(sd, variables, translate, strict=True)


CASES = {
    # mirrors map_convnext_tiny head cfg (/root/reference/MAP/models/map_convnext.py:199-205)
    "convnext_tiny_style": dict(
        channels=[96, 96, 192, 384, 768], last_dim=384, multi_scale_level=3,
        n_tokens=2, n_groups=2, gram_group=24, bp_dim=384, ca_dim=384,
        num_heads=12, gram=True, self_distill_token=True,
        shapes=[(96, 16, 16), (96, 16, 16), (192, 8, 8), (384, 4, 4), (768, 2, 2)],
    ),
    # mirrors map_mobilenet_v1 head cfg (/root/reference/MAP/models/map_mobilenet.py:71-83)
    "mobilenet_style": dict(
        channels=[64, 128, 256, 512, 1024], last_dim=192, multi_scale_level=-1,
        n_tokens=4, n_groups=1, gram_group=32, bp_dim=192, gram_dim=192,
        ca_dim=192, num_heads=6, mlp_ratio=1, mlp_groups=1, gram=True,
        self_distill_token=False, interactive=True, head_fn="linear",
        shapes=[(64, 16, 16), (128, 8, 8), (256, 8, 8), (512, 4, 4), (1024, 2, 2)],
    ),
}


@pytest.mark.parametrize("case", list(CASES))
def test_maphead_parity_eval(case, parity_tol):
    cfg = dict(CASES[case])
    shapes = cfg.pop("shapes")
    head_fn = cfg.pop("head_fn", "norm")
    num_classes = 37

    tcfg = dict(cfg)
    tcfg.pop("mlp_ratio", None) and None
    torch_head_fn = {"norm": ref_map.NormHead, "linear": tnn.Linear}[head_fn]
    tmodel = ref_map.MAPHead(
        channels=cfg["channels"], last_dim=cfg["last_dim"],
        multi_scale_level=cfg["multi_scale_level"], n_tokens=cfg["n_tokens"],
        n_groups=cfg["n_groups"], self_distill_token=cfg["self_distill_token"],
        gram=cfg["gram"], gram_group=cfg["gram_group"], bp_dim=cfg["bp_dim"],
        gram_dim=cfg.get("gram_dim"), ca_dim=cfg["ca_dim"], num_heads=cfg["num_heads"],
        mlp_ratio=cfg.get("mlp_ratio", 4), mlp_groups=cfg.get("mlp_groups", 2),
        interactive=cfg.get("interactive", False), head_fn=torch_head_fn,
        fc_drop=0, num_classes=num_classes, non_linearity=tnn.GELU,
        gram_blk=tnn.Identity, concat_blk=None,
    )
    tmodel.eval()
    # randomise BN running stats + all params so the test is non-trivial
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)

    jmodel = jheads.MAPHead(
        channels=cfg["channels"], last_dim=cfg["last_dim"],
        multi_scale_level=cfg["multi_scale_level"], n_tokens=cfg["n_tokens"],
        n_groups=cfg["n_groups"], self_distill_token=cfg["self_distill_token"],
        gram=cfg["gram"], gram_group=cfg["gram_group"], bp_dim=cfg["bp_dim"],
        gram_dim=cfg.get("gram_dim"), ca_dim=cfg["ca_dim"], num_heads=cfg["num_heads"],
        mlp_ratio=cfg.get("mlp_ratio", 4), mlp_groups=cfg.get("mlp_groups", 2),
        interactive=cfg.get("interactive", False), head_fn=head_fn,
        fc_drop=0.0, num_classes=num_classes, non_linearity=jheads.gelu,
    )

    rng = np.random.default_rng(3)
    torch_feats, jax_feats = _rand_pyramid(rng, shapes)
    variables = _convert(tmodel, jmodel, jax_feats)

    with torch.no_grad():
        t_out = tmodel(torch_feats)
    j_out = jmodel.apply(variables, jax_feats, training=False)

    assert len(t_out) == len(j_out)
    for t, j in zip(t_out, j_out):
        np.testing.assert_allclose(np.asarray(j), t.numpy(), **parity_tol)


def test_maphead_train_output_structure():
    cfg = dict(CASES["convnext_tiny_style"])
    shapes = cfg.pop("shapes")
    jmodel = jheads.MAPHead(
        channels=cfg["channels"], last_dim=cfg["last_dim"],
        multi_scale_level=cfg["multi_scale_level"], n_tokens=cfg["n_tokens"],
        n_groups=cfg["n_groups"], self_distill_token=True, gram=True,
        gram_group=cfg["gram_group"], bp_dim=cfg["bp_dim"], ca_dim=cfg["ca_dim"],
        num_heads=cfg["num_heads"], num_classes=11,
    )
    _, jax_feats = _rand_pyramid(np.random.default_rng(0), shapes)
    variables = jmodel.init(jax.random.PRNGKey(0), jax_feats, training=False)
    out, mutated = jmodel.apply(
        variables, jax_feats, training=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert len(out) == cfg["n_groups"]
    for org, avg in out:
        assert org.shape == (2, 11) and avg.shape == (2, 11)
    assert "batch_stats" in mutated


def test_normhead_pre_logits_parity(parity_tol):
    """Per-token pre_logits path vs the torch formula (map.py:402-412):
    (B, nt, classes) partial logits, no bias; summing over tokens and adding
    the fc bias reconstructs the full logits exactly."""
    nt, ch, num_classes, b = 3, 48, 17, 4
    tmodel = ref_map.NormHead(ch, num_classes, drop=0.0, nt=nt)
    tmodel.eval()
    gen = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)

    jmodel = jheads.NormHead(num_classes, drop=0.0, nt=nt)
    x = np.random.default_rng(6).standard_normal((b, ch)).astype(np.float32)
    variables = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    translate = RuleTranslator(MAP_HEAD_RULES)
    variables = convert_torch_state_dict(sd, variables, translate, strict=True)

    with torch.no_grad():
        t_full = tmodel(torch.from_numpy(x)).numpy()
        t_pre = tmodel(torch.from_numpy(x), pre_logits=True).numpy()
    j_full = np.asarray(jmodel.apply(variables, jnp.asarray(x)))
    j_pre = np.asarray(jmodel.apply(variables, jnp.asarray(x), pre_logits=True))

    assert j_pre.shape == (b, nt, num_classes)
    np.testing.assert_allclose(j_full, t_full, **parity_tol)
    np.testing.assert_allclose(j_pre, t_pre, **parity_tol)
    bias = sd["head.bias"]
    np.testing.assert_allclose(j_pre.sum(axis=1) + bias, j_full,
                               rtol=1e-4, atol=1e-4)
