#!/usr/bin/env python3
"""Export a model to a hermetic StableHLO serving artifact (+ JSON sidecar).

Usage:
  python scripts/export_serving.py --model map_convnext_tiny \
      --checkpoint weights.pth.tar --batch-size 8 --output out/model.stablehlo
  python scripts/export_serving.py --model map_convnext_tiny --selftest ...

The artifact takes uint8 NHWC images (resized/center-cropped per the sidecar)
and returns fp32 head-averaged logits; it reloads with jax.export.deserialize
alone — no model code needed on the serving host. --selftest deserializes the
written artifact and checks it against the live model on a random batch.
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_logger = logging.getLogger("export_serving")

parser = argparse.ArgumentParser(description="StableHLO serving export")
parser.add_argument("--model", "-m", default="map_convnext_tiny", type=str)
parser.add_argument("--checkpoint", default="", type=str,
                    help=".pth.tar / orbax dir (same resolution as validate.py)")
parser.add_argument("--pretrained", action="store_true",
                    help="resolve released weights from the local pretrained dirs")
parser.add_argument("--use-ema", action="store_true")
parser.add_argument("--batch-size", "-b", default=8, type=int)
parser.add_argument("--img-size", default=None, type=int)
parser.add_argument("--num-classes", type=int, default=None)
parser.add_argument("--amp", action="store_true", default=True,
                    help="bf16 compute inside the artifact (default)")
parser.add_argument("--no-amp", dest="amp", action="store_false")
parser.add_argument("--platforms", nargs="+", default=None,
                    help="lowering platforms, e.g. --platforms tpu cpu "
                         "(default: current backend only)")
parser.add_argument("--output", "-o", default="", type=str,
                    help="artifact path (default output/serving/<model>.stablehlo)")
parser.add_argument("--selftest", action="store_true",
                    help="reload the artifact and compare vs the live model")


def main():
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagenet_models_tpu.core.setup import setup_jax

    setup_jax()

    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu import create_model
    from imagenet_models_tpu.core.registry import default_cfg
    from imagenet_models_tpu.core.setup import jit_init
    from imagenet_models_tpu.ckpt.pretrained import (
        find_local_pretrained, load_variables_from_torch, require_local_pretrained)
    from imagenet_models_tpu.ckpt.saver import resume_checkpoint
    from imagenet_models_tpu.serving import export_serving, load_artifact, write_artifact

    cfg = default_cfg(args.model)
    img_size = args.img_size or cfg["input_size"][0]
    num_classes = args.num_classes or cfg["num_classes"]
    dtype = jnp.bfloat16 if args.amp else None
    model = create_model(args.model, num_classes=num_classes, dtype=dtype)

    x0 = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), x0, training=False)
    if args.checkpoint:
        if args.checkpoint.endswith((".pth", ".pth.tar", ".pt")):
            variables = load_variables_from_torch(args.model, variables,
                                                  args.checkpoint, use_ema=args.use_ema)
        else:
            variables, _ = resume_checkpoint(args.checkpoint, variables,
                                             use_ema=args.use_ema)
        _logger.info("loaded %s", args.checkpoint)
    else:
        pre = (require_local_pretrained(args.model) if args.pretrained
               else find_local_pretrained(args.model))
        if pre:
            variables = load_variables_from_torch(args.model, variables, pre,
                                                  use_ema=args.use_ema)
            _logger.info("loaded pretrained weights %s", pre)
        else:
            _logger.warning("exporting RANDOM-INIT weights (no checkpoint given)")

    exported = export_serving(model, variables, args.batch_size, img_size,
                              mean=cfg["mean"], std=cfg["std"],
                              platforms=args.platforms)
    out = args.output or os.path.join("output", "serving", f"{args.model}.stablehlo")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    sidecar = {
        "model": args.model,
        "batch_size": args.batch_size,
        "input": f"uint8[{args.batch_size},{img_size},{img_size},3] NHWC",
        "output": f"float32[{args.batch_size},{num_classes}] head-averaged logits",
        "img_size": img_size,
        "crop_pct": cfg["crop_pct"],
        "crop_mode": cfg.get("crop_mode", "center"),
        "interpolation": cfg["interpolation"],
        "mean": list(cfg["mean"]),
        "std": list(cfg["std"]),
        "normalization": "inside artifact: (x/255 - mean)/std",
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    write_artifact(exported, out, sidecar)
    _logger.info("wrote %s (%.1f MB) + sidecar", out, os.path.getsize(out) / 1e6)
    print(json.dumps({"artifact": out, **{k: sidecar[k] for k in ("input", "output", "platforms")}}))

    if args.selftest:
        reloaded, _ = load_artifact(out)
        rng = np.random.default_rng(0)
        u8 = jnp.asarray(rng.integers(0, 256, (args.batch_size, img_size, img_size, 3),
                                      dtype=np.uint8))
        got = np.asarray(reloaded.call(u8))
        mean = jnp.asarray(cfg["mean"], jnp.float32)
        std = jnp.asarray(cfg["std"], jnp.float32)
        x = (u8.astype(jnp.float32) / 255.0 - mean) / std
        from imagenet_models_tpu.nn.heads import average_head_logits

        ref = np.asarray(average_head_logits(model.apply(variables, x, training=False)))
        err = float(np.abs(got - ref).max())
        assert np.isfinite(got).all() and err < 1e-3, err
        _logger.info("selftest ok: max |artifact - live| = %.2e", err)


if __name__ == "__main__":
    main()
