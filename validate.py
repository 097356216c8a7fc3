#!/usr/bin/env python3
"""ImageNet validation CLI — the reference's validate.py surface
(/root/reference/MAP/validate.py:49-128) on the TPU-native stack: multi-head
logit averaging (:275-279), logit-extraction mode (:233-237,261-273,328-338),
real-labels / valid-labels modes (:200-210,300-305), bulk validation with OOM
batch-halving retry (:360-378), result JSON/CSV output (:411-443)."""

import argparse
import csv
import glob
import json
import logging
import os
import time

import numpy as np

_logger = logging.getLogger("validate")

parser = argparse.ArgumentParser(description="ImageNet validation (TPU-native)")
parser.add_argument("data", metavar="DIR", help="dataset path (or 'synthetic[:N]')")
parser.add_argument("--dataset", "-d", default="", type=str)
parser.add_argument("--split", default="validation", type=str)
parser.add_argument("--model", "-m", default="map_convnext_tiny", type=str,
                    help="model name; 'all' or a glob validates every match")
parser.add_argument("-b", "--batch-size", default=256, type=int)
parser.add_argument("--img-size", default=None, type=int)
parser.add_argument("--input-size", default=None, nargs=3, type=int)
parser.add_argument("--crop-pct", default=None, type=float)
parser.add_argument("--mean", type=float, nargs="+", default=None)
parser.add_argument("--std", type=float, nargs="+", default=None)
parser.add_argument("--interpolation", default="", type=str)
parser.add_argument("--num-classes", type=int, default=None)
parser.add_argument("--checkpoint", default="", type=str,
                    help=".pth.tar / orbax dir; a directory of .pth.tar enables bulk mode")
parser.add_argument("--pretrained", action="store_true",
                    help="load released weights for --model from a local dir "
                         "($IMTPU_PRETRAINED_DIR, ./pretrained, ~/.cache/imtpu/"
                         "checkpoints); the reference downloads them "
                         "(MAP/validate.py:133,157)")
parser.add_argument("--use-ema", action="store_true")
parser.add_argument("--amp", action="store_true", help="bf16 compute")
parser.add_argument("--num-gpu", type=int, default=1, help="accepted no-op")
parser.add_argument("-j", "--workers", type=int, default=4)
parser.add_argument("--log-freq", default=50, type=int)
parser.add_argument("--results-file", default="", type=str)
parser.add_argument("--max-batches", default=None, type=int,
                    help="truncate (subset evals, BASELINE config #1)")
parser.add_argument("--n-devices", type=int, default=None)
parser.add_argument("--extract-logits", default="", type=str,
                    help="save per-head logits + head fc biases to this .npz")
parser.add_argument("--logit-extract", action="store_true", default=False,
                    help="reference boolean form of --extract-logits: saves to "
                         "output/logit/<model>.npz (MAP/validate.py:328-338)")
parser.add_argument("--real-labels", default="", type=str,
                    help="JSON {filename: [valid class ids]} (ReaL labels)")
parser.add_argument("--valid-labels", default="", type=str,
                    help="text file of class indices restricting the label space")
parser.add_argument("--class-map", default="", type=str, metavar="FILENAME",
                    help="class-to-idx mapping file (one class name per line)")
parser.add_argument("--distill-tokens", "-dt", type=int, default=0,
                    help="build the model with N distill tokens per CAP")
parser.add_argument("--gp", default=None, type=str,
                    help="global pool override; fails loudly (factories fix pooling)")
parser.add_argument("--test-pool", action="store_true", default=False,
                    help="timm test-time pooling; unsupported (fails loudly)")
parser.add_argument("--tf-preprocessing", action="store_true", default=False,
                    help="TF preprocessing pipeline; unsupported (fails loudly)")
# torch-runtime flags accepted as no-ops for CLI parity
parser.add_argument("--apex-amp", action="store_true", default=False,
                    help="reference AMP selector; enables --amp (bf16) here")
parser.add_argument("--native-amp", action="store_true", default=False,
                    help="reference AMP selector; enables --amp (bf16) here")
parser.add_argument("--channels-last", action="store_true", default=False,
                    help="accepted no-op: NHWC is native")
parser.add_argument("--cuda", action="store_true", default=False,
                    help="accepted no-op: device selection is automatic")
parser.add_argument("--pin-mem", action="store_true", default=False,
                    help="accepted no-op")
parser.add_argument("--no-prefetcher", action="store_true", default=False,
                    help="accepted no-op: async dispatch is native")
parser.add_argument("--dataset-download", action="store_true", default=False,
                    help="accepted no-op: datasets are local directories")
parser.add_argument("--torchscript", action="store_true", default=False,
                    help="accepted no-op: jax.jit compiles everything")
parser.add_argument("--fuser", default="", type=str,
                    help="accepted no-op: XLA does the fusion")


class _Truncate:
    def __init__(self, loader, max_steps):
        self.loader, self.max_steps = loader, max_steps
        self.batch_size = getattr(loader, "batch_size", None)

    def __len__(self):
        n = len(self.loader)
        return min(n, self.max_steps) if self.max_steps else n

    def __iter__(self):
        for i, b in enumerate(self.loader):
            if self.max_steps and i >= self.max_steps:
                return
            yield b


def validate_once(args):
    import jax
    import jax.numpy as jnp

    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu import create_model
    from imagenet_models_tpu.core.registry import default_cfg
    from imagenet_models_tpu.core.setup import jit_init, setup_jax
    from imagenet_models_tpu.ckpt.pretrained import load_variables_from_torch
    from imagenet_models_tpu.ckpt.saver import resume_checkpoint
    from imagenet_models_tpu.data.dataset import create_dataset
    from imagenet_models_tpu.data.loader import create_loader
    from imagenet_models_tpu.parallel.mesh import batch_sharding, data_mesh, replicate, replicated
    from imagenet_models_tpu.utils.meters import AverageMeter

    setup_jax()
    if args.apex_amp or args.native_amp:
        args.amp = True
    if args.gp is not None:
        raise NotImplementedError(
            f"--gp {args.gp}: pooling is fixed by the model factory here")
    if args.test_pool or args.tf_preprocessing:
        raise NotImplementedError(
            "--test-pool/--tf-preprocessing are timm-substrate features the "
            "reference never exercises; not supported")
    if args.logit_extract and not args.extract_logits:
        # reference layout: output/logit/<model>.pth (MAP/validate.py:328-338)
        os.makedirs(os.path.join("output", "logit"), exist_ok=True)
        args.extract_logits = os.path.join("output", "logit", f"{args.model}.npz")
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
    crop_mode = cfg.get("crop_mode", "center")
    mean = tuple(args.mean) if args.mean else cfg["mean"]
    std = tuple(args.std) if args.std else cfg["std"]
    _logger.info(
        "Data processing configuration for current model + dataset:\n"
        "\tinput_size: (3, %d, %d)\n\tinterpolation: %s\n\tmean: %s\n"
        "\tstd: %s\n\tcrop_pct: %s\n\tcrop_mode: %s",
        img_size, img_size, interpolation, mean, std, crop_pct, crop_mode)

    dtype = jnp.bfloat16 if args.amp else None
    model_kwargs = {"distill_tokens": args.distill_tokens} if args.distill_tokens else {}
    model = create_model(args.model, num_classes=num_classes, dtype=dtype,
                         **model_kwargs)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    variables = jit_init(model, rng, x0, training=False)
    if args.checkpoint:
        if args.checkpoint.endswith((".pth", ".pth.tar", ".pt")):
            variables = load_variables_from_torch(args.model, variables,
                                                  args.checkpoint, use_ema=args.use_ema)
        else:
            variables, _ = resume_checkpoint(args.checkpoint, variables,
                                             use_ema=args.use_ema)
        _logger.info("loaded %s", args.checkpoint)
    else:
        # reference semantics: no --checkpoint implies pretrained=True and the
        # factory downloads released weights (MAP/validate.py:133,155-162). No
        # egress here: resolve locally; loud failure only on explicit
        # --pretrained (random-init eval stays available for smoke/tests).
        from imagenet_models_tpu.ckpt.pretrained import (
            find_local_pretrained, require_local_pretrained)

        pre_path = (require_local_pretrained(args.model) if args.pretrained
                    else find_local_pretrained(args.model))
        if pre_path:
            variables = load_variables_from_torch(args.model, variables, pre_path,
                                                  use_ema=args.use_ema)
            _logger.info("loaded pretrained weights %s", pre_path)
        else:
            _logger.warning("no checkpoint and no local pretrained weights for %s "
                            "— evaluating RANDOM INIT (the reference would "
                            "download released weights here)", args.model)
    param_count = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    _logger.info("Model %s created, param count: %d", args.model, param_count)
    variables = replicate(variables, mesh)

    # eval fn returns per-head logits stacked: (B, n_heads, classes).
    # In logit-extraction mode, heads that support the per-token pre_logits
    # path (NormHead, map.py:402-412) instead return (B, n_heads, nt, classes)
    # per-token partial logits WITHOUT bias; full logits are reconstructed as
    # sum-over-tokens + fc bias (the reference dump's layout,
    # MAP/validate.py:261-273,328-338).
    import inspect

    use_pre_logits = False
    if args.extract_logits:
        use_pre_logits = "pre_logits" in inspect.signature(
            type(model).__call__).parameters
        if use_pre_logits:
            probe = jax.eval_shape(
                lambda v, x: model.apply(v, x, training=False, pre_logits=True),
                variables, x0)
            use_pre_logits = (isinstance(probe, (tuple, list))
                              and all(getattr(p, "ndim", 0) == 3 for p in probe))

    def fwd(variables, images):
        if use_pre_logits:
            out = model.apply(variables, images, training=False, pre_logits=True)
            return jnp.stack([o.astype(jnp.float32) for o in out], axis=1)
        out = model.apply(variables, images, training=False)
        if not isinstance(out, (tuple, list)):
            out = (out,)
        return jnp.stack([o.astype(jnp.float32) for o in out], axis=1)

    eval_fn = jax.jit(fwd, in_shardings=(replicated(mesh), batch_sharding(mesh)),
                      out_shardings=batch_sharding(mesh))

    head_biases = None
    if use_pre_logits:
        # per-head fc biases in group order (reference `bias` list,
        # MAP/validate.py:233-237)
        import jax as _jax

        found = {}

        def _collect(path, leaf):
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            m = [seg for seg in p.split("/") if seg.startswith("heads_")]
            if m and p.endswith("head/bias"):
                found[int(m[0].split("_")[1])] = np.asarray(leaf, np.float32)

        _jax.tree_util.tree_map_with_path(_collect, variables["params"])
        head_biases = [found[k] for k in sorted(found)] if found else None

    from imagenet_models_tpu.data.dataset import check_dataset_name

    check_dataset_name(args.dataset)
    dataset = create_dataset(args.data, args.split, num_classes=num_classes,
                             image_size=img_size, class_map=args.class_map or None)
    batch = max(n_dev, args.batch_size // n_dev * n_dev)
    loader = create_loader(dataset, img_size, batch, is_training=False,
                           interpolation=interpolation, crop_pct=crop_pct,
                           crop_mode=crop_mode,
                           mean=mean, std=std, num_workers=args.workers)
    if args.max_batches:
        loader = _Truncate(loader, args.max_batches)

    valid_idx = None
    if args.valid_labels:
        with open(args.valid_labels) as f:
            valid_idx = np.asarray([int(line.strip()) for line in f if line.strip()])
    real = None
    if args.real_labels:
        with open(args.real_labels) as f:
            real_map = json.load(f)
        names = [os.path.basename(p) for p in dataset.filenames]
        real = [set(real_map.get(n, [])) for n in names]

    top1, top5 = AverageMeter(), AverageMeter()
    batch_time = AverageMeter()
    all_logits = [] if args.extract_logits else None
    seen = 0
    t_start = time.time()
    end = time.time()
    last_idx = len(loader) - 1
    for batch_idx, (images, targets) in enumerate(loader):
        n = images.shape[0]
        if n < batch:  # pad tail (static shapes), mask below
            pad = batch - n
            images = np.concatenate([images, np.zeros((pad,) + images.shape[1:], images.dtype)])
        heads = np.asarray(eval_fn(variables, jnp.asarray(images)))[:n]
        if use_pre_logits:
            # (B, G, nt, C) token partials -> full per-head logits
            per_head = heads.sum(axis=2)
            if head_biases is not None:
                per_head = per_head + np.stack(head_biases)
            logits = per_head.mean(axis=1)
        else:
            logits = heads.mean(axis=1)
        if all_logits is not None:
            all_logits.append(heads)
        if valid_idx is not None:
            masked = np.full_like(logits, -np.inf)
            masked[:, valid_idx] = logits[:, valid_idx]
            logits = masked
        order = np.argsort(-logits, axis=1)[:, :5]
        if real is not None:
            c1 = np.asarray([order[i, 0] in real[seen + i] if real[seen + i] else False
                             for i in range(n)], np.float32)
            c5 = np.asarray([bool(set(order[i]) & real[seen + i]) if real[seen + i] else False
                             for i in range(n)], np.float32)
        else:
            c1 = (order[:, 0] == targets).astype(np.float32)
            c5 = (order == targets[:, None]).any(axis=1).astype(np.float32)
        top1.update(float(c1.mean()) * 100.0, n)
        top5.update(float(c5.mean()) * 100.0, n)
        seen += n
        batch_time.update(time.time() - end)
        end = time.time()
        if batch_idx % args.log_freq == 0 or batch_idx == last_idx:
            _logger.info("Test: [%4d/%d]  Time: %.3f (%.3f, %7.2f/s)  "
                         "Acc@1: %.3f (%.3f)  Acc@5: %.3f (%.3f)",
                         batch_idx, len(loader), batch_time.val, batch_time.avg,
                         n / max(batch_time.avg, 1e-9), top1.val, top1.avg,
                         top5.val, top5.avg)

    if all_logits is not None:
        # per-head logits + per-head fc biases (reference logit-extraction
        # dump, MAP/validate.py:261-273,328-338)
        import jax as _jax

        biases = {}
        flat = {}

        def visit(path, leaf):
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            if p.endswith("bias") and ("heads_" in p or "fc_" in p or p.endswith("head/bias")):
                biases[p] = np.asarray(leaf)

        _jax.tree_util.tree_map_with_path(visit, variables["params"])
        extra = {f"bias::{k}": v for k, v in biases.items()}
        if head_biases is not None:
            # reference layout: ordered per-head fc bias list
            # (MAP/validate.py:328-338 {'logit':..., 'bias': [...]})
            extra["head_biases"] = np.stack(head_biases)
        np.savez(args.extract_logits, logits=np.concatenate(all_logits),
                 per_token=np.asarray(use_pre_logits), **extra)
        _logger.info("wrote logits for %d images to %s", seen, args.extract_logits)

    dt = time.time() - t_start
    return {
        "model": args.model,
        "top1": round(top1.avg, 4), "top1_err": round(100 - top1.avg, 4),
        "top5": round(top5.avg, 4), "top5_err": round(100 - top5.avg, 4),
        "param_count": round(param_count / 1e6, 2),
        "img_size": img_size, "cropt_pct": crop_pct, "interpolation": interpolation,
        "images_per_sec": round(seen / dt, 2),
    }


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
    logging.basicConfig(level=logging.INFO, force=True)
    logging.getLogger("absl").setLevel(logging.WARNING)
    args = parser.parse_args()

    # bulk mode (reference MAP/validate.py:387-409): model glob and/or a
    # directory of checkpoints
    runs = []
    if os.path.isdir(args.checkpoint):
        for ckpt in sorted(glob.glob(os.path.join(args.checkpoint, "*.pth.tar"))):
            name = os.path.basename(ckpt).rsplit(".pth.tar", 1)[0]
            runs.append((name, ckpt))
    elif args.model == "all" or any(ch in args.model for ch in "*?["):
        import imagenet_models_tpu.models  # noqa: F401
        from imagenet_models_tpu import list_models

        pattern = "*" if args.model == "all" else args.model
        runs = [(m, args.checkpoint) for m in list_models(pattern)]
    else:
        runs = [(args.model, args.checkpoint)]

    all_results = []
    for name, ckpt in runs:
        args.model, args.checkpoint = name, ckpt
        results = _try_run(args)
        all_results.append(results)
        if args.results_file:
            with open(args.results_file, "a", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=list(results.keys()))
                if f.tell() == 0:
                    writer.writeheader()
                writer.writerow(results)
        print(f"--result\n{json.dumps(results, indent=4)}")
    return all_results


if __name__ == "__main__":
    main()
