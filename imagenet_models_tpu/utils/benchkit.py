"""Shared construction of the benchmark train step.

One definition of the "production recipe shapes" harness (LAMB lr 5e-3
wd .05, BCE+smoothing 0.1 w/ mixup targets, dec_lam -0.8, EMA 0.9999,
grad_accum 1, single-chip mesh) used by scripts/bench_train.py,
scripts/bench_zoo.py --train and scripts/profile_step.py --full — so a
recipe or signature change cannot silently diverge between the A/B
harnesses (this was three hand-synced copies before).
"""

from __future__ import annotations


def build_bench_train_step(model_name: str, batch_size: int,
                           image_size: int = 224):
    """Returns (step, state, images, targets): the fused train step (fwd +
    bwd + LAMB + EMA) on synthetic data, ready to call as
    ``state, metrics = step(state, images, targets, rng)``."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu import create_model
    from imagenet_models_tpu.parallel.mesh import data_mesh, replicate, shard_batch
    from imagenet_models_tpu.train.losses import create_loss_fn
    from imagenet_models_tpu.train.optim import create_optimizer
    from imagenet_models_tpu.train.state import create_train_state, make_train_step

    mesh = data_mesh([jax.devices()[0]])
    model = create_model(model_name, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    variables = jax.jit(lambda r, x: model.init(r, x, training=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3), jnp.float32))

    tx = create_optimizer("lamb", learning_rate=5e-3, weight_decay=0.05)
    state = replicate(create_train_state(variables, tx, ema_decay=0.9999), mesh)
    loss_fn = create_loss_fn(bce_loss=True, smoothing=0.1, mixup_active=True)
    step = make_train_step(model, tx, loss_fn, dec_lam=-0.8, ema_decay=0.9999,
                           grad_accum=1, mesh=mesh)
    images = jnp.asarray(rng.standard_normal(
        (batch_size, image_size, image_size, 3)), jnp.float32)
    targets = jnp.asarray(rng.random((batch_size, 1000)), jnp.float32)
    images, targets = shard_batch((images, targets), mesh)
    return step, state, images, targets
