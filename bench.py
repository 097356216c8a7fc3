#!/usr/bin/env python3
"""Headline benchmark: map_convnext_tiny 224 images/sec on one TPU chip.

Baseline: the reference's published speed for ConvNeXt-T+MAP is 1665 img/s on
an RTX 3090 (MAP/README.MD §2 table; the repo publishes no A100 numbers).
We report eval (inference) throughput per chip against that number, and train
throughput as a secondary metric in the same JSON line.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N/1665, ...}
"""

import json
import time

BASELINE_3090_EVAL = 1665.0  # MAP/README.MD §2: ConvNeXt-T+MAP img/s on RTX 3090
# The reference publishes no training throughput anywhere (its README table is
# inference img/s; there is no benchmarks/ dir). For an explicit train-side
# yardstick we use eval/3 — fwd+bwd+update is canonically ~3x a forward pass
# (and our own measured train/eval step-time ratio is 3.1x) — i.e. an
# estimated ~555 img/s for the reference's 3090 on ConvNeXt-T+MAP.
BASELINE_3090_TRAIN_EST = BASELINE_3090_EVAL / 3.0

# --- auditability vs the BASELINE.md north star ("exceed A100 train
# img/s/chip"). The reference has no A100 numbers, so this is an explicit,
# documented estimate: on convnet-family models at 224^2 an 80GB A100
# typically measures ~2x an RTX 3090 (public timm benchmark tables; the
# bf16-tensor-core peak ratio 312/71 TFLOP/s is larger, but these models are
# partly memory-bound where the HBM ratio is 2039/936 GB/s ~ 2.2x — 2.0x is
# the conservative round number). Train estimate keeps the same /3 rule.
A100_OVER_3090_EST = 2.0
A100_EVAL_EST = BASELINE_3090_EVAL * A100_OVER_3090_EST        # ~3330 img/s
A100_TRAIN_EST = BASELINE_3090_TRAIN_EST * A100_OVER_3090_EST  # ~1110 img/s

# Model cost and chip peak, for achieved-TFLOP/s / %-of-peak reporting:
# ConvNeXt-T+MAP is 4.9 GMACs/img (MAP/README.MD §2 table "FLOPs(G)" counts
# MACs, timm convention) => 9.8 GFLOP forward. Train = fwd + bwd ~ 3x fwd.
GMACS_PER_IMG = 4.9
EVAL_FLOPS_PER_IMG = 2 * GMACS_PER_IMG * 1e9
TRAIN_FLOPS_PER_IMG = 3 * EVAL_FLOPS_PER_IMG
V5E_PEAK_BF16 = 197e12  # TPU v5e: 197 TFLOP/s bf16 per chip (public spec)


def main():
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
    from imagenet_models_tpu.train.state import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    dev = jax.devices()[0]
    mesh = data_mesh([dev])
    model = create_model("map_convnext_tiny", dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    eval_bs = 256
    train_bs = 128

    x1 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    # jit the init: unjitted it dispatches thousands of ops individually,
    # which is pathologically slow through the tunneled device (~2.4ms each)
    from imagenet_models_tpu.core.setup import jit_init

    variables = jit_init(model, jax.random.PRNGKey(0), x1, training=False)

    # ---- eval throughput ----
    from imagenet_models_tpu.train.state import TrainState

    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}), opt_state=())
    state = replicate(state, mesh)
    eval_step = make_eval_step(model, mesh=mesh)
    images = jnp.asarray(rng.standard_normal((eval_bs, 224, 224, 3)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 1000, (eval_bs,)))
    images, targets = shard_batch((images, targets), mesh)
    # warmup (compile); NOTE: on the tunneled device block_until_ready does
    # not reliably block, so a host fetch (device_get of a scalar) is the
    # sync point for all timing below.
    _ = float(np.asarray(eval_step(state, images, targets)[1]).sum())
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = eval_step(state, images, targets)
    _ = float(np.asarray(out[1]).sum())
    eval_ips = eval_bs * iters / (time.perf_counter() - t0)

    # ---- train throughput ----
    tx = create_optimizer("lamb", learning_rate=5e-3, weight_decay=0.05)
    tstate = replicate(create_train_state(variables, tx, ema_decay=0.9999), mesh)
    loss_fn = create_loss_fn(bce_loss=True, smoothing=0.1, mixup_active=True)
    step = make_train_step(model, tx, loss_fn, dec_lam=-0.8, ema_decay=0.9999,
                           grad_accum=1, mesh=mesh)
    timg = jnp.asarray(rng.standard_normal((train_bs, 224, 224, 3)), jnp.float32)
    ttgt = jnp.asarray(rng.random((train_bs, 1000)), jnp.float32)
    timg, ttgt = shard_batch((timg, ttgt), mesh)
    tstate, m = step(tstate, timg, ttgt, jax.random.PRNGKey(0))
    _ = float(np.asarray(m["loss"]))
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        tstate, m = step(tstate, timg, ttgt, jax.random.PRNGKey(i))
    _ = float(np.asarray(m["loss"]))
    train_ips = train_bs * iters / (time.perf_counter() - t0)

    result = {
        "metric": "map_convnext_tiny 224 eval images/sec/chip (bf16)",
        "value": round(eval_ips, 2),
        "unit": "img/s",
        "vs_baseline": round(eval_ips / BASELINE_3090_EVAL, 4),
        "train_images_per_sec_per_chip": round(train_ips, 2),
        "train_vs_baseline_est": round(train_ips / BASELINE_3090_TRAIN_EST, 4),
        "gmacs_per_img": GMACS_PER_IMG,
        "eval_tflops": round(eval_ips * EVAL_FLOPS_PER_IMG / 1e12, 2),
        "eval_pct_of_v5e_peak": round(
            100 * eval_ips * EVAL_FLOPS_PER_IMG / V5E_PEAK_BF16, 2),
        "train_tflops": round(train_ips * TRAIN_FLOPS_PER_IMG / 1e12, 2),
        "train_pct_of_v5e_peak": round(
            100 * train_ips * TRAIN_FLOPS_PER_IMG / V5E_PEAK_BF16, 2),
        "train_vs_a100_est": round(train_ips / A100_TRAIN_EST, 4),
        "eval_vs_a100_est": round(eval_ips / A100_EVAL_EST, 4),
        "device": str(dev),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    # jit_init (the first device work inside main) already routes through
    # run_with_cache_recovery; wrapping main here too would re-run the whole
    # benchmark after a second cache wipe (ADVICE r2) — no outer wrapper.
    main()
