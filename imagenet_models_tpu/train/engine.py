"""Training/eval engine: the host loop around the jitted SPMD steps.

Reproduces the reference loop behaviour (/root/reference/GA/train.py:701-890,
/root/reference/MAP/train.py:842-1047): phase meters (data/forward+backward),
NaN watchdog, recovery checkpoints, throughput logging — restructured for TPU:
the whole fwd+bwd+update is ONE jitted step; the host overlaps the next
batch's decode/augment with device compute via async dispatch (we only block
on the loss at log intervals, so steps pipeline back-to-back).

The NaN watchdog (MAP/train.py:886-891) is preserved but amortized: losses
are fetched asynchronously and checked at log-interval granularity instead of
forcing a device sync every step.
"""

from __future__ import annotations

import logging
import math
import os
import time
from collections import OrderedDict
from typing import Callable, Optional

import jax
import numpy as np

from imagenet_models_tpu.parallel.mesh import shard_batch
from imagenet_models_tpu.utils.meters import AverageMeter

_logger = logging.getLogger("imagenet_models_tpu")


class NaNWatchdog(Exception):
    pass


class Preempted(Exception):
    """Raised at a step boundary after SIGTERM (TPU maintenance/preemption)."""


_PREEMPT = {"signaled": False}


def install_preemption_handler():
    """Preemption-safe training (SURVEY §5.3): TPU maintenance events deliver
    SIGTERM; convert it into a recovery checkpoint + clean exit at a step
    boundary so `--resume` restarts without skipping data (the snapshot
    carries epoch-1 semantics: the interrupted epoch re-runs from its start,
    see CheckpointSaver.save_recovery). The reference's only story here is
    the operator restarting from the last recovery checkpoint
    (GA/train.py:810-812); this closes the window since the last one."""
    import signal

    def _handler(signum, frame):
        _PREEMPT["signaled"] = True
        _logger.warning("SIGTERM: saving recovery checkpoint at the next step boundary")

    try:
        signal.signal(signal.SIGTERM, _handler)
    except ValueError:  # not the main thread (e.g. under pytest plugins)
        pass


def _preempt_agreed(sync_point: bool) -> bool:
    """Whether to act on a SIGTERM now. Single-process: the local flag,
    checked every step. Multi-host: the signal can land on different hosts at
    different step boundaries, so acting on the local flag alone would leave
    peers dispatching the next step's collectives against this host's
    recovery-save collectives (deadlock / mixed-step checkpoint shards);
    instead ALL processes agree (allgather of the flag bit, any() wins) and
    only at deterministic batch indices so every host runs the same
    collective sequence."""
    if jax.process_count() == 1:
        return _PREEMPT["signaled"]
    if not sync_point:
        return False
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.array([1 if _PREEMPT["signaled"] else 0], np.int32))
    return bool(np.asarray(flags).max())


def save_image_grid(images: np.ndarray, path: str, cols: int = 8):
    """Debug dump of an input batch as one tiled image (reference:
    torchvision.utils.save_image with normalize=True at GA/train.py:803-808).
    Accepts NHWC float batches in any normalization; min-max rescales."""
    from PIL import Image

    arr = np.asarray(images, np.float32)
    lo, hi = float(arr.min()), float(arr.max())
    arr = (arr - lo) / max(hi - lo, 1e-8)
    n, h, w, c = arr.shape
    cols = min(cols, n)
    rows = math.ceil(n / cols)
    grid = np.zeros((rows * h, cols * w, c), np.float32)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = arr[i]
    Image.fromarray((grid * 255).astype(np.uint8).squeeze()).save(path)


def train_one_epoch(epoch: int, state, step_fn, loader, mesh, rng,
                    log_interval: int = 50, saver=None, recovery_interval: int = 0,
                    lr_fn: Optional[Callable] = None, mixup_off: bool = False,
                    steps_per_epoch: Optional[int] = None,
                    profile_steps: int = 0, profile_dir: str = "",
                    save_images_dir: str = ""):
    if mixup_off and getattr(loader, "mixup_enabled", False):
        loader.mixup_enabled = False
    profiling = False

    batch_time = AverageMeter()
    data_time = AverageMeter()
    losses = AverageMeter()
    pending = []  # (batch_idx, metrics) awaiting async fetch

    spe = steps_per_epoch or len(loader)
    end = time.time()
    last_idx = len(loader) - 1
    for batch_idx, (images, targets) in enumerate(loader):
        data_time.update(time.time() - end)
        n = images.shape[0]
        host_images = images  # pre-shard host batch (for --save-images)
        images, targets = shard_batch((images, targets), mesh)
        if profile_steps and epoch == 0:
            # jax.profiler trace hook (SURVEY §5.1 rebuild item)
            if batch_idx == 2 and not profiling:
                jax.profiler.start_trace(profile_dir or "./profile")
                profiling = True
            elif profiling and batch_idx == 2 + profile_steps:
                jax.profiler.stop_trace()
                profiling = False
                _logger.info("profiler trace written to %s", profile_dir or "./profile")
        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, images, targets, step_rng)
        pending.append((batch_idx, metrics, n))

        do_log = batch_idx % log_interval == 0 or batch_idx == last_idx
        if do_log:
            # drain async metrics; NaN watchdog here (amortized device sync)
            for bi, m, bn in pending:
                loss = float(m["loss"])
                if math.isnan(loss) or math.isinf(loss):
                    _logger.error("nan/inf loss at epoch %d batch %d", epoch, bi)
                    raise NaNWatchdog(f"epoch {epoch} batch {bi}")
                losses.update(loss, bn)
            pending.clear()
        # timed AFTER the drain so blocking device syncs are charged to the
        # iteration; with async dispatch the per-interval average is the
        # honest wall rate, the .val of a non-drain iteration is not
        batch_time.update(time.time() - end)
        if do_log:
            rate = n / max(batch_time.avg, 1e-9)
            lr_now = float(lr_fn(epoch + batch_idx / spe)) if lr_fn else float("nan")
            _logger.info(
                "Train: %d [%4d/%d (%3.0f%%)]  Loss: %.4g (%.3g)  "
                "Time: %.3fs, %7.2f/s  LR: %.3e  Data: %.3f (%.3f)",
                epoch, batch_idx, len(loader), 100.0 * batch_idx / max(last_idx, 1),
                losses.val, losses.avg, batch_time.val, rate, lr_now,
                data_time.val, data_time.avg)
        if save_images_dir and batch_idx % log_interval == 0 and jax.process_index() == 0:
            # debug batch dumps every log interval (GA/train.py:803-808);
            # dumped from the host batch (this process's rows) — the
            # post-shard_batch array spans non-addressable devices multi-host
            save_image_grid(host_images, os.path.join(
                save_images_dir, f"train-batch-{batch_idx}.jpg"))

        if saver is not None and recovery_interval and (
                batch_idx == last_idx or (batch_idx + 1) % recovery_interval == 0):
            saver.save_recovery(state, epoch, batch_idx,
                                epoch_complete=batch_idx == last_idx)

        if _preempt_agreed(do_log or batch_idx == last_idx):
            if saver is not None:
                saver.save_recovery(state, epoch, batch_idx,
                                    epoch_complete=batch_idx == last_idx)
                _logger.warning("preemption recovery checkpoint saved "
                                "(epoch %d batch %d)", epoch, batch_idx)
            raise Preempted(f"epoch {epoch} batch {batch_idx}")

        end = time.time()

    return state, rng, OrderedDict([("loss", losses.avg)])


def _fetch_local_rows(x):
    """np.asarray for single-process runs; under multi-host the per-sample
    outputs are sharded over 'data' and only this process's rows are
    addressable — concatenate its shards in global-index order (they
    round-trip the loader's process-local block)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    shards = sorted(x.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])


def validate(state, eval_step, loader, mesh, log_interval: int = 50,
             log_suffix: str = "", tta: int = 0):
    """Top-1/top-5 over the loader; multi-head logits are averaged inside the
    eval step (reference: MAP/validate.py:275-279). tta>1: the step returns
    one flag per group of tta samples (MAP/train.py:1009-1012). Multi-host:
    each process meters its own shard, then sum/count are all-gathered at the
    end (the reference's distributed meter reduce, MAP/train.py:762-763)."""
    tta = max(int(tta), 1)
    batch_time = AverageMeter()
    top1 = AverageMeter()
    top5 = AverageMeter()

    end = time.time()
    last_idx = len(loader) - 1
    for batch_idx, (images, targets) in enumerate(loader):
        n = images.shape[0]
        pad = 0
        want = getattr(loader, "batch_size", n)
        if n < want:  # static shapes: pad the tail batch, mask in the metric
            pad = want - n
            images = np.concatenate([images, np.zeros((pad,) + images.shape[1:], images.dtype)])
            targets = np.concatenate([targets, np.full((pad,), -1, targets.dtype)])
        images, targets = shard_batch((images, targets), mesh)
        _, c1, c5 = eval_step(state, images, targets)
        c1, c5 = _fetch_local_rows(c1), _fetch_local_rows(c5)
        n_eff = n // tta  # groups fully inside the real samples (pad is at the end)
        if n_eff == 0:
            continue  # tail smaller than one tta group; reference unfold drops it
        if len(c1) > n_eff:
            c1, c5 = c1[:n_eff], c5[:n_eff]
        top1.update(float(c1.mean()) * 100.0, n_eff)
        top5.update(float(c5.mean()) * 100.0, n_eff)
        batch_time.update(time.time() - end)
        end = time.time()
        if batch_idx % log_interval == 0 or batch_idx == last_idx:
            _logger.info("Test%s: [%4d/%d]  Time: %.3f (%.3f)  Acc@1: %.3f (%.3f)  Acc@5: %.3f (%.3f)",
                         log_suffix, batch_idx, len(loader), batch_time.val,
                         batch_time.avg, top1.val, top1.avg, top5.val, top5.avg)

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        local = np.array([top1.sum, top5.sum, float(top1.count)], np.float64)
        tot = np.asarray(multihost_utils.process_allgather(local)).sum(axis=0)
        return OrderedDict([("top1", float(tot[0] / max(tot[2], 1.0))),
                            ("top5", float(tot[1] / max(tot[2], 1.0)))])
    return OrderedDict([("top1", top1.avg), ("top5", top5.avg)])
