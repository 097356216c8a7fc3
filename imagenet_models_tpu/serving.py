"""AOT serving export — freeze an eval forward into a hermetic StableHLO artifact.

The reference is a research repo with no deployment path (its inference story
is `validate.py` + torch eager, /root/reference/MAP/validate.py:131-357).
This module is the TPU-native production extension: `jax.export` AOT-lowers
the full eval forward — uint8 decode-normalize, bf16 backbone, multi-head
logit averaging (the validate.py:275-279 semantics) — into one serialized
StableHLO module with the weights baked in as constants. The artifact is
hermetic: it reloads and runs with `jax.export.deserialize` alone, no model
code, no checkpoint machinery, and can be lowered for several platforms at
once (e.g. tpu+cpu) so the same artifact serves on either.

A JSON sidecar records the host-side preprocessing contract (resize/crop
happen on the host exactly as in the eval pipeline): input size, crop_pct,
crop_mode, interpolation, mean/std (already applied inside the artifact),
batch size, and output arity.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from imagenet_models_tpu.nn.heads import average_head_logits

SIDECAR_SUFFIX = ".json"


def make_serving_fn(model, variables):
    """Eval forward over a uint8 NHWC batch -> fp32 averaged logits.

    Input contract: uint8 images already resized/center-cropped to the model's
    eval geometry (host side, see sidecar). Normalization (x/255 - mean)/std
    is folded into the artifact so the serving host does no float math.
    """
    def fn(images_u8, mean, std):
        x = images_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        out = model.apply(variables, x, training=False)
        return average_head_logits(out)

    return fn


def export_serving(
    model,
    variables,
    batch_size: int,
    img_size: int,
    mean: Sequence[float],
    std: Sequence[float],
    platforms: Optional[Sequence[str]] = None,
):
    """AOT-export the serving forward. Returns a jax.export.Exported."""
    from jax import export as jexport

    base = make_serving_fn(model, variables)
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)

    def fn(images_u8):
        return base(images_u8, m, s)

    spec = jax.ShapeDtypeStruct((batch_size, img_size, img_size, 3), jnp.uint8)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    return jexport.export(jax.jit(fn), **kwargs)(spec)


def write_artifact(exported, path: str, sidecar: dict) -> None:
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    with open(path + SIDECAR_SUFFIX, "w") as f:
        json.dump(sidecar, f, indent=2, sort_keys=True)


def load_artifact(path: str) -> Tuple["jax.export.Exported", dict]:
    """Reload a serialized artifact + sidecar; call via `exported.call(u8)`."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    sidecar = {}
    try:
        with open(path + SIDECAR_SUFFIX) as f:
            sidecar = json.load(f)
    except FileNotFoundError:
        pass
    return exported, sidecar
