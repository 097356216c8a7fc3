#!/usr/bin/env python3
"""Train-step-only throughput harness for kernel A/Bs (one compile instead
of bench.py's two). Same shapes/recipe as bench.py's train section; the step
construction is shared with bench_zoo --train and profile_step --full
(imagenet_models_tpu/utils/benchkit.py).

Usage: [IMTPU_* knobs] python scripts/bench_train.py [-b 128] [--iters 20]
Prints one line: train_img_per_s=<N>
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("-b", "--batch-size", type=int, default=128)
parser.add_argument("--iters", type=int, default=20)
parser.add_argument("--model", default="map_convnext_tiny")


def main():
    args = parser.parse_args()
    import jax
    import numpy as np

    from imagenet_models_tpu.core.setup import setup_jax

    setup_jax()

    from imagenet_models_tpu.utils.benchkit import build_bench_train_step

    step, tstate, timg, ttgt = build_bench_train_step(args.model, args.batch_size)
    tstate, m = step(tstate, timg, ttgt, jax.random.PRNGKey(0))
    _ = float(np.asarray(m["loss"]))  # host fetch = the only reliable sync
    t0 = time.perf_counter()
    for i in range(args.iters):
        tstate, m = step(tstate, timg, ttgt, jax.random.PRNGKey(i))
    _ = float(np.asarray(m["loss"]))
    ips = args.batch_size * args.iters / (time.perf_counter() - t0)
    print(f"train_img_per_s={ips:.1f}")


if __name__ == "__main__":
    from imagenet_models_tpu.core.setup import run_with_cache_recovery

    run_with_cache_recovery(main)
