"""Serving-artifact tests: jax.export round-trip through bytes on disk.

The artifact must be hermetic — deserialize + call with no model code — and
numerically identical to the live model (same program, same constants).
"""

import numpy as np

import jax
import jax.numpy as jnp

from imagenet_models_tpu.models.convnext import ConvNeXt
from imagenet_models_tpu.serving import export_serving, load_artifact, write_artifact


def test_serving_roundtrip(tmp_path):
    model = ConvNeXt(depths=(1, 1, 1, 1), dims=(8, 8, 16, 16), num_classes=13,
                     global_pool="mmcap", last_dim=16, n_groups=2, n_tokens=2,
                     gram_group=2, bp_dim=16, ca_dim=16, num_heads=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           training=False)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    exported = export_serving(model, variables, batch_size=2, img_size=32,
                              mean=mean, std=std)
    path = str(tmp_path / "tiny.stablehlo")
    write_artifact(exported, path, {"model": "tiny", "img_size": 32})

    reloaded, sidecar = load_artifact(path)
    assert sidecar["model"] == "tiny"

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8))
    got = np.asarray(reloaded.call(u8))
    assert got.shape == (2, 13) and np.isfinite(got).all()

    x = (u8.astype(jnp.float32) / 255.0 - jnp.asarray(mean)) / jnp.asarray(std)
    out = model.apply(variables, x, training=False)
    ref = sum(o.astype(jnp.float32) for o in out) / len(out)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-5)
