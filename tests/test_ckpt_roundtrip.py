"""Checkpoint interchangeability: flax -> torch .pth.tar export must
round-trip key- and value-identically through the forward converter
(BASELINE.md hard requirement)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagenet_models_tpu.ckpt.pretrained import translator_for
from imagenet_models_tpu.ckpt.reverse_rules import reverse_translator
from imagenet_models_tpu.ckpt.torch_convert import (
    convert_torch_state_dict,
    export_torch_state_dict,
    flatten_dict,
)
from imagenet_models_tpu.models.convnext import ConvNeXt


@pytest.mark.parametrize("mmcap", [False, True])
def test_convnext_export_roundtrip(mmcap):
    model = ConvNeXt(depths=(1, 1, 2, 1), dims=(8, 8, 16, 16), num_classes=7,
                     global_pool="mmcap" if mmcap else "avg", last_dim=16,
                     n_groups=2, n_tokens=2, gram_group=2, bp_dim=16, ca_dim=16,
                     num_heads=2)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x, training=False)

    name = "map_convnext_tiny" if mmcap else "convnext_tiny"
    sd = export_torch_state_dict(variables, reverse_translator(name))
    assert sd, "empty export"
    # import it back through the forward converter
    variables2 = convert_torch_state_dict(sd, variables, translator_for(name), strict=True)
    for col in ("params", "batch_stats"):
        a, b = flatten_dict(variables.get(col, {})), flatten_dict(variables2.get(col, {}))
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)

    # and the torch-side key names follow the reference layout
    keys = set(sd)
    assert "downsample_layers.0.0.weight" in keys
    assert "stages.0.0.dwconv.weight" in keys
    if mmcap:
        assert any(k.startswith("head.mmcap.mmcap.0.gram_token_extraction.ch_reduction.0.") for k in keys)
        assert "head.self_dt_heads.0.norm.weight" in keys
