#!/usr/bin/env python3
"""Per-family throughput for every released-checkpoint model config on one
chip, with the north-star comparison made auditable (VERDICT r3 next-#3):
each record carries the reference RTX-3090 number (MAP/README.MD §2 table),
the documented A100 estimate (bench.py convention: A100 ~ 2x 3090 on this
model class; train ~ eval/3), GMACs/img (README FLOPs(G) column, MAC
convention), achieved TFLOP/s and %-of-v5e-bf16-peak.

Usage:
  python scripts/bench_zoo.py            # eval sweep
  python scripts/bench_zoo.py --train    # train-step sweep (fwd+bwd+update)
  python scripts/bench_zoo.py --models a,b -b 128
Prints one JSON line per model; tee into artifacts/bench/zoo_{eval,train}_*.jsonl.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bench.py's documented convention, applied zoo-wide (see bench.py:26-41):
A100_OVER_3090_EST = 2.0
TRAIN_OVER_EVAL = 3.0          # fwd+bwd+update ~ 3x a forward pass
V5E_PEAK_BF16 = 197e12

# model -> (eval_batch, train_batch, reference RTX-3090 eval img/s
#           [MAP/README.MD §2 table], GMACs/img [README FLOPs(G), MAC
#           convention; GA models: GA/README.md:81,84]).
ZOO = {
    "map_mobilenet_v1": (256, 256, 3734.0, 0.6),
    "map_resnet50": (256, 128, 2127.0, 5.4),  # train B swept: 128=1210, 256=1192
    "map_pit_s": (256, 128, 2254.0, 2.6),  # train B swept: 64=1926, 128=2199, 256=2005
    "map_convnext_tiny": (256, 128, 1665.0, 4.9),
    "map_convnext_small": (256, 128, 1111.0, 9.2),
    "map_maxvit_tiny_tf_224": (128, 128, 907.0, 5.8),  # train B: 64=438, 128=452, >=192 OOM
    "map_faster_vit_3_224": (128, 128, 970.0, 18.8),   # train B: 64=602, 128=666
    "ga_convnext_tiny_688": (256, 128, None, 6.3),
    "ga_cswin_tiny": (256, 128, None, 6.1),
}


def bench_eval(name, bs, jax, jnp, create_model):
    model = create_model(name, dtype=jnp.bfloat16)
    x1 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    v = jax.jit(lambda k, x: model.init(k, x, training=False))(
        jax.random.PRNGKey(0), x1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (bs, 224, 224, 3)), jnp.float32)
    fwd = jax.jit(lambda v, x: sum(
        jnp.sum(o.astype(jnp.float32))
        for o in model.apply(v, x, training=False)))
    _ = float(np.asarray(fwd(v, x)))
    iters = 15
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fwd(v, x)
    _ = float(np.asarray(r))
    return bs * iters / (time.perf_counter() - t0)


def bench_train(name, bs, jax, jnp, create_model):
    """Same harness as scripts/bench_train.py: full fused train step (fwd +
    bwd + LAMB update + EMA) on the production recipe shapes (shared
    construction in utils/benchkit.py)."""
    from imagenet_models_tpu.utils.benchkit import build_bench_train_step

    step, tstate, timg, ttgt = build_bench_train_step(name, bs)
    tstate, m = step(tstate, timg, ttgt, jax.random.PRNGKey(0))
    _ = float(np.asarray(m["loss"]))
    iters = 15
    t0 = time.perf_counter()
    for i in range(iters):
        tstate, m = step(tstate, timg, ttgt, jax.random.PRNGKey(i))
    _ = float(np.asarray(m["loss"]))
    return bs * iters / (time.perf_counter() - t0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-b", "--batch-size", type=int, default=0,
                        help="override per-model batch")
    parser.add_argument("--models", default="",
                        help="comma list (default: full zoo)")
    parser.add_argument("--train", action="store_true",
                        help="bench the full train step instead of eval fwd")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from imagenet_models_tpu.core.setup import setup_jax

    setup_jax()
    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu import create_model

    names = [m for m in args.models.split(",") if m] or list(ZOO)
    for name in names:
        eval_bs, train_bs, ref3090, gmacs = ZOO.get(name, (128, 64, None, None))
        bs = args.batch_size or (train_bs if args.train else eval_bs)
        try:
            if args.train:
                ips = bench_train(name, bs, jax, jnp, create_model)
                rec = {"model": name, "train_b": bs,
                       "train_images_per_sec_per_chip": round(ips, 1)}
                flops_per_img = (gmacs or 0) * 2e9 * TRAIN_OVER_EVAL
            else:
                ips = bench_eval(name, bs, jax, jnp, create_model)
                rec = {"model": name, "batch": bs,
                       "eval_images_per_sec_per_chip": round(ips, 1)}
                flops_per_img = (gmacs or 0) * 2e9
            if gmacs:
                rec["gmacs_per_img"] = gmacs
                rec["tflops"] = round(ips * flops_per_img / 1e12, 2)
                rec["pct_of_v5e_peak"] = round(
                    100 * ips * flops_per_img / V5E_PEAK_BF16, 2)
            if ref3090:
                if args.train:
                    est = ref3090 / TRAIN_OVER_EVAL * A100_OVER_3090_EST
                    rec["ref_3090_eval_images_per_sec"] = ref3090
                    rec["a100_train_est"] = round(est, 1)
                    rec["train_vs_a100_est"] = round(ips / est, 2)
                else:
                    est = ref3090 * A100_OVER_3090_EST
                    rec["ref_3090_images_per_sec"] = ref3090
                    rec["vs_3090"] = round(ips / ref3090, 2)
                    rec["a100_eval_est"] = round(est, 1)
                    rec["eval_vs_a100_est"] = round(ips / est, 2)
            print(json.dumps(rec), flush=True)
        except Exception as e:  # keep the sweep alive
            print(json.dumps({"model": name, "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    from imagenet_models_tpu.core.setup import run_with_cache_recovery

    run_with_cache_recovery(main)
