#!/usr/bin/env python3
"""A/B eval throughput for GA-CSWin-T: flash window-attention kernel vs the
plain XLA attention (IMTPU_FLASH_ATTN=0). One JSON line per run."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from imagenet_models_tpu.core.setup import setup_jax

    setup_jax()
    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu import create_model

    bs = int(os.environ.get("IMTPU_BENCH_BS", "256"))
    model = create_model("ga_cswin_tiny", dtype=jnp.bfloat16)
    x1 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, training=False))(
        jax.random.PRNGKey(0), x1)
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((bs, 224, 224, 3)), jnp.float32)

    fwd = jax.jit(lambda v, x: sum(
        jnp.sum(o.astype(jnp.float32)) for o in model.apply(v, x, training=False)))
    _ = float(np.asarray(fwd(variables, images)))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fwd(variables, images)
    _ = float(np.asarray(r))
    ips = bs * iters / (time.perf_counter() - t0)
    print(json.dumps({
        "model": "ga_cswin_tiny", "mode": "eval",
        # must mirror the opt-in gate in ops/cswin_attention.py
        "flash_attn": os.environ.get("IMTPU_FLASH_ATTN", "0") == "1",
        "images_per_sec_per_chip": round(ips, 2), "batch": bs,
    }))


if __name__ == "__main__":
    from imagenet_models_tpu.core.setup import run_with_cache_recovery

    run_with_cache_recovery(main)
