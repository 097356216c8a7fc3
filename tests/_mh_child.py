"""Subprocess body for tests/test_multihost.py: one process of an
n-process CPU 'multi-host' run (2 virtual devices per process).

Runs one DP train step + one eval pass through engine.validate on a
deterministic global batch, then prints one JSON line with the results.
Invoked as: python _mh_child.py <pid> <nprocs> <port>

Import is side-effect-free: tests/test_multihost.py imports build() and
_OneBatchLoader to construct the single-process reference.
"""

import json
import os
import sys


def build():
    import jax
    import jax.numpy as jnp

    from imagenet_models_tpu.models.convnext import ConvNeXt

    model = ConvNeXt(depths=(1, 1, 1, 1), dims=(8, 8, 16, 16), num_classes=11,
                     global_pool="mmcap", last_dim=16, n_groups=2, n_tokens=2,
                     gram_group=2, bp_dim=16, ca_dim=16, num_heads=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           training=False)
    return model, variables


def uneven_eval_rows(nprocs):
    """Deterministic eval set whose LAST process shard holds half the rows of
    its peers (an uneven eval tail); shared with the single-process reference
    in test_multihost.py."""
    import numpy as np

    erng = np.random.default_rng(42)
    full = 2 * 2 * nprocs // 4  # rows per full process (stay tiny)
    rows = [full] * (nprocs - 1) + [full // 2]
    images = erng.standard_normal((sum(rows), 32, 32, 3)).astype(np.float32)
    targets = erng.integers(0, 11, (sum(rows),)).astype(np.int64)
    return images, targets, rows, full


class _OneBatchLoader:
    """Minimal loader protocol for engine.validate: yields this process's
    local rows once. batch_size may exceed the rows held (an uneven eval
    tail): engine.validate pads to batch_size and masks the metric."""

    def __init__(self, images, targets, repeats: int = 1, batch_size=None):
        self.images, self.targets = images, targets
        self.batch_size = batch_size or images.shape[0]
        self.repeats = repeats

    def __len__(self):
        return self.repeats

    def __iter__(self):
        for _ in range(self.repeats):
            yield self.images, self.targets


def main(pid: int, nprocs: int, port: str):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["IMTPU_PLATFORM"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nprocs,
                               process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    from imagenet_models_tpu.parallel.mesh import data_mesh, replicate, shard_batch
    from imagenet_models_tpu.train.engine import validate
    from imagenet_models_tpu.train.losses import create_loss_fn
    from imagenet_models_tpu.train.optim import create_optimizer
    from imagenet_models_tpu.train.state import (
        create_train_state, make_eval_step, make_train_step)

    assert jax.process_count() == nprocs
    mesh = data_mesh()  # all global devices, process-contiguous
    model, variables = build()

    rng = np.random.default_rng(0)
    gb = 4 * 2 * nprocs  # 4/dev * 2 dev/proc * nprocs
    g_images = rng.standard_normal((gb, 32, 32, 3)).astype(np.float32)
    g_targets = rng.integers(0, 11, (gb,)).astype(np.int64)
    lb = gb // nprocs
    l_images = g_images[pid * lb:(pid + 1) * lb]
    l_targets = g_targets[pid * lb:(pid + 1) * lb]

    tx = create_optimizer("lamb", learning_rate=1e-3, weight_decay=0.05)
    # the DP step donates its state, whose replicated leaves can alias the
    # first CPU shard of `variables` — copy BEFORE stepping for zero1 later
    fresh = jax.tree.map(jnp.copy, variables)
    state = replicate(create_train_state(variables, tx, ema_decay=0.999), mesh)
    loss_fn = create_loss_fn(bce_loss=True, smoothing=0.1)
    step = make_train_step(model, tx, loss_fn, dec_lam=-0.8, ema_decay=0.999,
                           grad_accum=1, mesh=mesh)
    images, targets = shard_batch((l_images, l_targets), mesh)
    state, metrics = step(state, images, targets, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])

    eval_step = make_eval_step(model, mesh=mesh)
    res = validate(state, eval_step, _OneBatchLoader(l_images, l_targets), mesh)

    # Uneven eval tail (world>2): the last process holds HALF the rows of its
    # peers; every process still yields the same batch count (padded batches,
    # static shapes), and validate's count-weighted allgather must produce the
    # exact global accuracy over the 7n/8-row set. Deterministic eval rows
    # shared by the single-process reference in test_multihost.py.
    res_uneven = None
    if nprocs >= 4:
        e_images, e_targets, rows, full = uneven_eval_rows(nprocs)
        lo = sum(rows[:pid])
        le_im, le_tg = e_images[lo:lo + rows[pid]], e_targets[lo:lo + rows[pid]]
        res_uneven = validate(
            state, eval_step,
            _OneBatchLoader(le_im, le_tg, batch_size=full), mesh)

    # ZeRO-1 sharded state through the multi-host saver: opt_state/EMA leaves
    # are not fully addressable, so _to_host must allgather (collective) and
    # only process 0 writes; the checkpoint on disk must round-trip.
    zdir = os.environ.get("IMTPU_MH_CKPT_DIR", "")
    zsig = 0.0
    if zdir:
        from imagenet_models_tpu.ckpt.saver import CheckpointSaver
        from imagenet_models_tpu.train.state import place_state

        zstate = place_state(create_train_state(fresh, tx, ema_decay=0.999),
                             mesh, zero1=True)
        zstep = make_train_step(model, tx, loss_fn, dec_lam=-0.8,
                                ema_decay=0.999, grad_accum=1, mesh=mesh,
                                zero1=True)
        zstate, zm = zstep(zstate, images, targets, jax.random.PRNGKey(1))
        assert any(not x.is_fully_addressable
                   for x in jax.tree.leaves(zstate.opt_state)), \
            "zero1 state unexpectedly replicated; allgather path not exercised"
        saver = CheckpointSaver(zdir, max_history=2)
        saver.save_checkpoint(zstate, epoch=0, metric=float(zm["loss"]))
        zsig = float(zm["loss"])

    # Preemption agreement: SIGTERM lands on ONE process only; every process
    # must act at the same deterministic batch boundary (engine._preempt_agreed
    # allgathers the flag) or the collective recovery save would interleave
    # with the peer's next train-step collectives (deadlock / mixed-step
    # checkpoint shards).
    pre_batch = -1
    if zdir:
        from imagenet_models_tpu.train import engine

        engine._PREEMPT["signaled"] = pid == nprocs - 1  # only ONE process is hit
        try:
            engine.train_one_epoch(
                3, state, step, _OneBatchLoader(l_images, l_targets, repeats=3),
                mesh, jax.random.PRNGKey(2), log_interval=1, saver=saver)
        except engine.Preempted as e:
            pre_batch = int(str(e).rsplit(" ", 1)[-1])
        finally:
            engine._PREEMPT["signaled"] = False

    out = {"pid": pid, "loss": loss, "zloss": zsig, "pre_batch": pre_batch,
           "top1": float(res["top1"]), "top5": float(res["top5"])}
    if res_uneven is not None:
        out["utop1"] = float(res_uneven["top1"])
        out["utop5"] = float(res_uneven["top5"])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
