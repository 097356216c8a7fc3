#!/usr/bin/env python3
"""Export a training checkpoint (orbax dir) to a reference-format .pth.tar.

The inverse of `validate.py --checkpoint foo.pth.tar`: a model trained here
becomes loadable by the reference's torch code (its own loaders use
load_state_dict(strict=False), MAP/train.py:480).

Usage:
  python scripts/export_checkpoint.py <orbax_dir_or_last> --model map_convnext_tiny \
      -o model.pth.tar [--use-ema]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("checkpoint", help="orbax checkpoint dir (e.g. .../last)")
parser.add_argument("--model", required=True)
parser.add_argument("-o", "--output", required=True, help=".pth.tar path")
parser.add_argument("--use-ema", action="store_true")


def main():
    args = parser.parse_args()
    from imagenet_models_tpu.core.setup import setup_jax

    setup_jax(platform=os.environ.get("IMTPU_PLATFORM", "cpu"))

    import orbax.checkpoint as ocp

    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu.ckpt.saver import export_pth_tar

    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.checkpoint))
    export_pth_tar(raw, args.model, args.output, use_ema=args.use_ema)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
