#!/usr/bin/env python
"""Diagnose a GA/MAP multi-head checkpoint: per-head val accuracy, averaged
accuracy, logit scale, and classification-vs-decorrelation loss decomposition.

Built to investigate the synthetic-cls convergence collapse (train loss
falling while head-averaged val top-1 sits at chance): distinguishes
(a) decorrelation-runaway — the unbounded negative dec_lam*KL term dominates
once the easy task's cls loss bottoms out, heads diverge, the eval average
dies — from (b) plain memorization / optimization divergence.

Usage:
  IMTPU_PLATFORM=cpu python scripts/diag_heads.py \
      artifacts/convergence/ga_convnext_t_in100_synth/checkpoint-7 [more ckpts]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoints", nargs="+")
    ap.add_argument("--model", default="ga_convnext_tiny_688")
    ap.add_argument("--num-classes", type=int, default=100)
    ap.add_argument("--img-size", type=int, default=128)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("-b", "--batch-size", type=int, default=128)
    ap.add_argument("--ga-lam", type=float, default=-0.8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import imagenet_models_tpu.models  # noqa: F401  (registry population)
    from imagenet_models_tpu import create_model
    from imagenet_models_tpu.ckpt.saver import resume_checkpoint
    from imagenet_models_tpu.data.dataset import create_dataset
    from imagenet_models_tpu.data.loader import create_loader
    from imagenet_models_tpu.train.losses import (
        binary_cross_entropy,
        kl_div_log_target,
    )

    model = create_model(args.model, num_classes=args.num_classes,
                         dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("training",))(
        rng, jnp.zeros((1, args.img_size, args.img_size, 3), jnp.float32),
        training=False)
    variables = {k: v for k, v in variables.items()}

    ds = create_dataset(f"synthetic-cls:20000:5000", split="validation",
                        num_classes=args.num_classes, image_size=args.img_size)
    loader = create_loader(ds, args.img_size, args.batch_size,
                           is_training=False, num_workers=2)

    fwd = jax.jit(lambda v, x: model.apply(v, x, training=False))

    batches = []
    for i, (images, targets) in enumerate(loader):
        if i >= args.batches:
            break
        batches.append((images, targets))

    for ckpt in args.checkpoints:
        restored, epoch = resume_checkpoint(ckpt, variables)
        n_heads = None
        head_correct = None
        avg_correct = 0
        total = 0
        cls_losses = None
        dec_total = 0.0
        logit_std = None
        for images, targets in batches:
            outs = fwd(restored, jnp.asarray(images))
            outs = [np.asarray(o, np.float32) for o in outs]
            if n_heads is None:
                n_heads = len(outs)
                head_correct = np.zeros(n_heads)
                cls_losses = np.zeros(n_heads)
                logit_std = np.zeros(n_heads)
            t = np.asarray(targets)
            total += len(t)
            mean_logits = np.mean(outs, axis=0)
            avg_correct += (mean_logits.argmax(-1) == t).sum()
            mean_logp = jax.nn.log_softmax(jnp.asarray(mean_logits), axis=1)
            for k, o in enumerate(outs):
                head_correct[k] += (o.argmax(-1) == t).sum()
                cls_losses[k] += float(binary_cross_entropy(
                    jnp.asarray(o), jnp.asarray(t), 0.1))
                logit_std[k] += o.std()
                logp = jax.nn.log_softmax(jnp.asarray(o), axis=1)
                dec_total += float(kl_div_log_target(logp, mean_logp, "mean")
                                   ) * args.ga_lam
        nb = len(batches)
        print(f"\n=== {ckpt} (epoch {epoch}) ===")
        print(f"  head-avg top1: {100*avg_correct/total:.2f}%")
        for k in range(n_heads):
            print(f"  head {k}: top1 {100*head_correct[k]/total:6.2f}%  "
                  f"bce {cls_losses[k]/nb:7.4f}  logit-std {logit_std[k]/nb:8.2f}")
        print(f"  sum cls loss: {cls_losses.sum()/nb:.4f}   "
              f"dec term (lam={args.ga_lam}): {dec_total/nb:+.4f}   "
              f"total: {cls_losses.sum()/nb + dec_total/nb:.4f}")


if __name__ == "__main__":
    main()
