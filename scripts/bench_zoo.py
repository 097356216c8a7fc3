#!/usr/bin/env python3
"""Eval throughput for every released-checkpoint model config on one chip.
Prints one JSON line per model (and a summary table to stderr).

Usage: python scripts/bench_zoo.py [-b 256] [--models a,b,c]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# model -> (batch, reference RTX-3090 img/s from MAP/README.MD §2, or None)
ZOO = {
    "map_mobilenet_v1": (256, 3734.0),
    "map_resnet50": (256, 2127.0),
    "map_pit_s": (256, 2254.0),
    "map_convnext_tiny": (256, 1665.0),
    "map_convnext_small": (256, 1111.0),
    "map_maxvit_tiny_tf_224": (128, 907.0),
    "map_faster_vit_3_224": (128, 970.0),
    "ga_convnext_tiny_688": (256, None),
    "ga_cswin_tiny": (256, None),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-b", "--batch-size", type=int, default=0,
                        help="override per-model batch")
    parser.add_argument("--models", default="",
                        help="comma list (default: full zoo)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from imagenet_models_tpu.core.setup import setup_jax

    setup_jax()
    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu import create_model

    names = [m for m in args.models.split(",") if m] or list(ZOO)
    for name in names:
        bs, ref = ZOO.get(name, (128, None))
        bs = args.batch_size or bs
        try:
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
            ips = bs * iters / (time.perf_counter() - t0)
            rec = {"model": name, "eval_images_per_sec_per_chip": round(ips, 1),
                   "batch": bs}
            if ref:
                rec["ref_3090_images_per_sec"] = ref
                rec["vs_3090"] = round(ips / ref, 2)
            print(json.dumps(rec), flush=True)
        except Exception as e:  # keep the sweep alive
            print(json.dumps({"model": name, "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    from imagenet_models_tpu.core.setup import run_with_cache_recovery

    run_with_cache_recovery(main)
