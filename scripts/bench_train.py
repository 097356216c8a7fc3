#!/usr/bin/env python3
"""Train-step-only throughput harness for kernel A/Bs (one compile instead
of bench.py's two). Same shapes/recipe as bench.py's train section.

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
    import jax.numpy as jnp
    import numpy as np

    from imagenet_models_tpu.core.setup import setup_jax

    setup_jax()

    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu import create_model
    from imagenet_models_tpu.parallel.mesh import data_mesh, replicate, shard_batch
    from imagenet_models_tpu.train.losses import create_loss_fn
    from imagenet_models_tpu.train.optim import create_optimizer
    from imagenet_models_tpu.train.state import create_train_state, make_train_step

    mesh = data_mesh([jax.devices()[0]])
    model = create_model(args.model, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    variables = jax.jit(lambda r, x: model.init(r, x, training=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32))

    tx = create_optimizer("lamb", learning_rate=5e-3, weight_decay=0.05)
    tstate = replicate(create_train_state(variables, tx, ema_decay=0.9999), mesh)
    loss_fn = create_loss_fn(bce_loss=True, smoothing=0.1, mixup_active=True)
    step = make_train_step(model, tx, loss_fn, dec_lam=-0.8, ema_decay=0.9999,
                           grad_accum=1, mesh=mesh)
    bs = args.batch_size
    timg = jnp.asarray(rng.standard_normal((bs, 224, 224, 3)), jnp.float32)
    ttgt = jnp.asarray(rng.random((bs, 1000)), jnp.float32)
    timg, ttgt = shard_batch((timg, ttgt), mesh)
    tstate, m = step(tstate, timg, ttgt, jax.random.PRNGKey(0))
    _ = float(np.asarray(m["loss"]))  # host fetch = the only reliable sync
    t0 = time.perf_counter()
    for i in range(args.iters):
        tstate, m = step(tstate, timg, ttgt, jax.random.PRNGKey(i))
    _ = float(np.asarray(m["loss"]))
    ips = bs * args.iters / (time.perf_counter() - t0)
    print(f"train_img_per_s={ips:.1f}")


if __name__ == "__main__":
    from imagenet_models_tpu.core.setup import run_with_cache_recovery

    run_with_cache_recovery(main)
