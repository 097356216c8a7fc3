"""Reference init-scheme parity (core/reinit.py): the non-ConvNeXt families
leave convs (and for pit/mobilenet, Linears) at torch defaults, resnet uses
kaiming fan_out + zero_init_last (see reinit.py module docstring for the
reference file:line map)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import imagenet_models_tpu.models  # noqa: F401
from imagenet_models_tpu import create_model
from imagenet_models_tpu.core.reinit import reference_init


def _init(name, size=64):
    m = create_model(name, num_classes=10)
    with jax.default_device(jax.devices("cpu")[0]):
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
                   training=False)
    return v


def _leaves_with_path(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [("/".join(str(getattr(k, "key", k)) for k in path), leaf)
            for path, leaf in flat]


def test_resnet_kaiming_and_zero_init_last():
    v = reference_init("map_resnet50", _init("map_resnet50"))
    saw_conv3 = saw_other_bn = saw_conv = False
    for p, leaf in _leaves_with_path(v["params"]):
        if p.endswith("conv3/bn/scale"):
            assert float(jnp.abs(leaf).max()) == 0.0, p
            saw_conv3 = True
        elif p.endswith("bn/scale"):
            assert float(leaf.min()) == 1.0, p
            saw_other_bn = True
        elif p.endswith("conv/kernel") and leaf.ndim == 4:
            fan_out = leaf.shape[-1] * np.prod(leaf.shape[:2])
            std = float(jnp.std(leaf))
            assert 0.5 * np.sqrt(2 / fan_out) < std < 2.0 * np.sqrt(2 / fan_out), p
            saw_conv = True
    assert saw_conv3 and saw_other_bn and saw_conv


def test_cswin_convs_torch_default_linears_trunc():
    v0 = _init("ga_cswin_tiny", 224)
    v = reference_init("ga_cswin_tiny", v0)
    stem = None
    for p, leaf in _leaves_with_path(v["params"]):
        if "stem_conv0" in p and p.endswith("kernel"):
            stem = leaf
    assert stem is not None
    bound = 1.0 / np.sqrt(np.prod(stem.shape[:3]))
    assert float(jnp.abs(stem).max()) <= bound + 1e-7
    # roughly uniform: max close to the bound, not gaussian-tailed
    assert float(jnp.abs(stem).max()) > 0.9 * bound
    # Linears untouched (reference trunc-normals them): std ~.02
    dense = [leaf for p, leaf in _leaves_with_path(v["params"])
             if leaf.ndim == 2 and p.endswith("kernel")]
    assert dense and all(0.01 < float(jnp.std(d)) < 0.03 for d in dense[:5])


def test_pit_linears_torch_default_pos_embed_kept():
    v = reference_init("map_pit_s", _init("map_pit_s", 224), seed=3)
    for p, leaf in _leaves_with_path(v["params"]):
        if leaf.ndim == 2 and p.endswith("kernel") and "pos_embed" not in p:
            bound = 1.0 / np.sqrt(leaf.shape[0])
            assert float(jnp.abs(leaf).max()) <= bound + 1e-7, p
        if "pos_embed" in p:
            assert 0.01 < float(jnp.std(leaf)) < 0.03, p  # trunc_normal kept


def test_convnext_untouched():
    v0 = _init("map_convnext_tiny", 64)
    v = reference_init("map_convnext_tiny", v0)
    l0 = jax.tree_util.tree_leaves(v0["params"])
    l1 = jax.tree_util.tree_leaves(v["params"])
    assert all(a is b for a, b in zip(l0, l1))
