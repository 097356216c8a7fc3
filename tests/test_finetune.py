"""Fine-tune checkpoint surgery (reference MAP/train.py:459-481): the
in21k->in1k fc remap through the class-map JSON, the missing-class-850 mean
init, and the drop-fc path (fresh classifier, backbone loaded)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagenet_models_tpu.ckpt.finetune import apply_finetune_checkpoint
from imagenet_models_tpu.ckpt.reverse_rules import reverse_translator
from imagenet_models_tpu.ckpt.torch_convert import export_torch_state_dict, flatten_dict
from imagenet_models_tpu.models.convnext import ConvNeXt

N21K = 64  # stand-in for 21843 — only the index mechanics matter


def _tiny_model():
    return ConvNeXt(depths=(1, 1, 1, 1), dims=(8, 8, 8, 16), num_classes=1000)


def _fixture(tmp_path, variables, drop_to_21k: bool):
    """Export the tiny model to reference .pth.tar; optionally blow the fc up
    to a 21k-style class count."""
    import torch

    sd = export_torch_state_dict(variables, reverse_translator("convnext_tiny"))
    assert "head.weight" in sd and "head.bias" in sd
    if drop_to_21k:
        rng = np.random.default_rng(0)
        sd["head.weight"] = rng.standard_normal(
            (N21K,) + sd["head.weight"].shape[1:]).astype(np.float32)
        sd["head.bias"] = rng.standard_normal((N21K,)).astype(np.float32)
    path = tmp_path / "ft.pth.tar"
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v).copy())
                               for k, v in sd.items()}}, str(path))
    return str(path), sd


def test_in21k_remap(tmp_path):
    model = _tiny_model()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           training=False)
    path, sd = _fixture(tmp_path, variables, drop_to_21k=True)

    # class map: in1k class i <- 21k row (i * 7) % N21K, skipping 850
    in1k_idx = [i for i in range(1000) if i != 850]
    in21k_idx = [(i * 7) % N21K for i in in1k_idx]
    map_path = tmp_path / "map.json"
    map_path.write_text(json.dumps({"in1k_idx": in1k_idx, "in21k_idx": in21k_idx}))

    out, n_fc = apply_finetune_checkpoint(
        variables, "convnext_tiny", path, in21k_to_in1k=True,
        map_path=str(map_path))
    assert n_fc == 2

    w = np.asarray(flatten_dict(out["params"])["head/kernel"])  # (in, 1000)
    b = np.asarray(flatten_dict(out["params"])["head/bias"])
    for i in (0, 1, 851, 999):
        row = (i * 7) % N21K
        np.testing.assert_array_equal(w[:, i], sd["head.weight"][row])
        np.testing.assert_array_equal(b[i], sd["head.bias"][row])
    # class 850: mean over the 21k rows (MAP/train.py:471)
    np.testing.assert_allclose(w[:, 850], sd["head.weight"].mean(0),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(b[850], sd["head.bias"].mean(0),
                               rtol=1e-6, atol=1e-6)


def test_drop_fc(tmp_path):
    model = _tiny_model()
    v_src = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                       training=False)
    v_dst = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)),
                       training=False)
    path, _ = _fixture(tmp_path, v_src, drop_to_21k=False)

    out, n_fc = apply_finetune_checkpoint(v_dst, "convnext_tiny", path,
                                          in21k_to_in1k=False)
    assert n_fc == 2
    src, dst, got = (flatten_dict(v["params"])
                     for v in (v_src, v_dst, out))
    # backbone came from the checkpoint ...
    stem = "downsample_layers_0_conv/kernel"
    np.testing.assert_array_equal(np.asarray(got[stem]), np.asarray(src[stem]))
    # ... but the classifier fc stayed fresh-init (keys were dropped)
    np.testing.assert_array_equal(np.asarray(got["head/kernel"]),
                                  np.asarray(dst["head/kernel"]))
