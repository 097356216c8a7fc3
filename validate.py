#!/usr/bin/env python3
"""ImageNet validation CLI — the reference's validate.py surface
(/root/reference/MAP/validate.py:49-128) on the TPU-native stack: multi-head
logit averaging (:275-279), OOM batch-halving retry (:360-378), result
JSON/CSV output (:411-443)."""

import argparse
import csv
import json
import logging
import os
import time

_logger = logging.getLogger("validate")

parser = argparse.ArgumentParser(description="ImageNet validation (TPU-native)")
parser.add_argument("data", metavar="DIR", help="dataset path (or 'synthetic')")
parser.add_argument("--dataset", "-d", default="", type=str)
parser.add_argument("--split", default="validation", type=str)
parser.add_argument("--model", "-m", default="map_convnext_tiny", type=str)
parser.add_argument("-b", "--batch-size", default=256, type=int)
parser.add_argument("--img-size", default=None, type=int)
parser.add_argument("--input-size", default=None, nargs=3, type=int)
parser.add_argument("--crop-pct", default=None, type=float)
parser.add_argument("--mean", type=float, nargs="+", default=None)
parser.add_argument("--std", type=float, nargs="+", default=None)
parser.add_argument("--interpolation", default="", type=str)
parser.add_argument("--num-classes", type=int, default=None)
parser.add_argument("--checkpoint", default="", type=str,
                    help=".pth.tar (torch) or orbax dir")
parser.add_argument("--pretrained", action="store_true")
parser.add_argument("--use-ema", action="store_true")
parser.add_argument("--amp", action="store_true", help="bf16 compute")
parser.add_argument("--num-gpu", type=int, default=1, help="accepted no-op")
parser.add_argument("-j", "--workers", type=int, default=4)
parser.add_argument("--log-freq", default=50, type=int)
parser.add_argument("--results-file", default="", type=str)
parser.add_argument("--max-batches", default=None, type=int,
                    help="truncate (subset evals, BASELINE config #1)")
parser.add_argument("--n-devices", type=int, default=None)


def validate_once(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu import create_model
    from imagenet_models_tpu.core.registry import default_cfg
    from imagenet_models_tpu.ckpt.pretrained import load_variables_from_torch
    from imagenet_models_tpu.ckpt.saver import resume_checkpoint
    from imagenet_models_tpu.data.dataset import create_dataset
    from imagenet_models_tpu.data.loader import create_loader
    from imagenet_models_tpu.parallel.mesh import data_mesh, replicate
    from imagenet_models_tpu.train.engine import validate as run_validate
    from imagenet_models_tpu.train.state import TrainState, make_eval_step

    devices = jax.devices()
    if args.n_devices:
        devices = devices[: args.n_devices]
    mesh = data_mesh(devices)
    n_dev = len(devices)

    cfg = default_cfg(args.model)
    num_classes = args.num_classes or cfg["num_classes"]
    img_size = args.input_size[1] if args.input_size else (args.img_size or cfg["input_size"][0])
    crop_pct = args.crop_pct or cfg["crop_pct"]
    interpolation = args.interpolation or cfg["interpolation"]
    mean = tuple(args.mean) if args.mean else cfg["mean"]
    std = tuple(args.std) if args.std else cfg["std"]

    dtype = jnp.bfloat16 if args.amp else None
    model = create_model(args.model, num_classes=num_classes, dtype=dtype)

    from imagenet_models_tpu.core.setup import jit_init, setup_jax

    setup_jax()
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    variables = jit_init(model, rng, x0, training=False)
    if args.checkpoint:
        if args.checkpoint.endswith((".pth", ".pth.tar", ".pt")):
            variables = load_variables_from_torch(args.model, variables,
                                                  args.checkpoint, use_ema=args.use_ema)
        else:
            variables, _ = resume_checkpoint(args.checkpoint, variables)
        _logger.info("loaded %s", args.checkpoint)
    param_count = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    _logger.info("Model %s created, param count: %d", args.model, param_count)

    import optax

    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}), opt_state=())
    state = replicate(state, mesh)
    eval_step = make_eval_step(model, mesh=mesh)

    dataset = create_dataset(args.data, args.split, num_classes=num_classes,
                             image_size=img_size)
    batch = max(n_dev, args.batch_size // n_dev * n_dev)
    loader = create_loader(dataset, img_size, batch, is_training=False,
                           interpolation=interpolation, crop_pct=crop_pct,
                           mean=mean, std=std, num_workers=args.workers)
    if args.max_batches:
        from train import _truncate

        loader = _truncate(loader, args.max_batches)

    t0 = time.time()
    metrics = run_validate(state, eval_step, loader, mesh, log_interval=args.log_freq)
    dt = time.time() - t0
    n_images = len(loader) * batch
    results = {
        "model": args.model,
        "top1": round(metrics["top1"], 4), "top1_err": round(100 - metrics["top1"], 4),
        "top5": round(metrics["top5"], 4), "top5_err": round(100 - metrics["top5"], 4),
        "param_count": round(param_count / 1e6, 2),
        "img_size": img_size, "cropt_pct": crop_pct, "interpolation": interpolation,
        "images_per_sec": round(n_images / dt, 2),
    }
    return results


def _try_run(args):
    """OOM backoff: halve the batch and retry (MAP/validate.py:360-378)."""
    batch_size = args.batch_size
    while batch_size >= 1:
        args.batch_size = batch_size
        try:
            return validate_once(args)
        except Exception as e:  # noqa: BLE001
            if "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower():
                batch_size //= 2
                _logger.warning("OOM, retrying with batch size %d", batch_size)
                continue
            raise
    raise RuntimeError("validation failed even at batch size 1")


def main():
    logging.basicConfig(level=logging.INFO)
    args = parser.parse_args()
    results = _try_run(args)
    if args.results_file:
        with open(args.results_file, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(results.keys()))
            if f.tell() == 0:
                writer.writeheader()
            writer.writerow(results)
    print(f"--result\n{json.dumps(results, indent=4)}")


if __name__ == "__main__":
    main()
