"""Checkpoint saver/resume with timm CheckpointSaver semantics on orbax
(reference: /root/reference/GA/train.py:649-653,690-693 — model+optimizer+EMA
+epoch+args, best-metric tracking, bounded history, recovery snapshots;
resume restores optimizer state and epoch, GA/train.py:488-493).

Also exports reference-compatible .pth.tar via the torch converter, so
checkpoints remain interchangeable with the PyTorch stack (BASELINE.md)."""

from __future__ import annotations

import glob
import json
import logging
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_logger = logging.getLogger("imagenet_models_tpu")


def _to_host(tree):
    """Fetch a state tree to host numpy. Multi-host: leaves that are not
    fully addressable (ZeRO-1-sharded optimizer/EMA state) are all-gathered
    first — a collective, so _to_host must run on EVERY process even though
    only process 0 writes the files afterwards."""
    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(get, tree)


def _is_writer() -> bool:
    """File writes are master-only under multi-host (the checkpoint dir is
    assumed shared — GCS/NFS — as with the reference's rank-0 torch.save,
    GA/train.py:649-653; single-process is always the writer)."""
    return jax.process_index() == 0


class CheckpointSaver:
    """timm-CheckpointSaver semantics on orbax.

    async_save=True (single-process only): the device→host snapshot stays
    synchronous (it must capture THIS step's state), but serialization +
    last/model_best copies + history pruning run on a write-behind thread so
    the train loop overlaps them with the next steps — this is where the
    reference's blocking `torch.save` burns step time on every
    `--recovery-interval` snapshot (GA/train.py:810-812). At most one save is
    in flight (the next save waits for the previous write), bounding host
    memory to two state copies. Multi-host saves are collective (allgather +
    orbax barrier) and stay synchronous."""

    def __init__(self, checkpoint_dir: str, max_history: int = 10,
                 decreasing: bool = False, args_text: str = "",
                 async_save: bool = False):
        self.dir = os.path.abspath(checkpoint_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.max_history = max_history
        self.decreasing = decreasing
        self.best_metric: Optional[float] = None
        self.best_epoch: Optional[int] = None
        self._ckpt = ocp.PyTreeCheckpointer()
        self._executor = None
        self._inflight = None
        if async_save:
            if jax.process_count() > 1:
                raise ValueError("async_save is single-process only: multi-host "
                                 "saves are collective (allgather + orbax "
                                 "barrier) and must run on the caller")
            from concurrent.futures import ThreadPoolExecutor

            self._executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="imtpu-ckpt")
        if args_text and _is_writer():
            with open(os.path.join(self.dir, "args.yaml"), "w") as f:
                f.write(args_text)

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def _submit(self, fn):
        """Run fn now (sync mode) or enqueue it on the single writer thread
        (submission order == execution order)."""
        if self._executor is None:
            fn()
            return

        def logged():
            try:
                fn()
            except BaseException:
                _logger.exception("async checkpoint write failed")
                raise

        self._inflight = self._executor.submit(logged)

    def wait_until_finished(self):
        """Block until every queued write has landed; re-raises a failed
        write's exception (so a run never ends believing a checkpoint exists
        that was silently lost)."""
        if self._inflight is not None:
            fut, self._inflight = self._inflight, None
            fut.result()

    def _save(self, state, epoch: int, name: str, metric: Optional[float] = None):
        # Back-pressure: one save in flight — a queued write must land (or
        # raise) before we snapshot more state.
        self.wait_until_finished()
        # _to_host and _ckpt.save are BOTH collective under multi-host
        # (allgather of sharded leaves; orbax's internal save barrier), so
        # every process runs them — orbax writes from the primary only.
        # Plain filesystem prep/meta stays rank-0.
        host = _to_host(state)
        multi = jax.process_count() > 1
        if multi:
            if _is_writer() and os.path.exists(self._path(name)):
                shutil.rmtree(self._path(name))
            from jax.experimental import multihost_utils

            # the stale dir must be gone everywhere before save's own
            # existence check runs on any process
            multihost_utils.sync_global_devices(f"imtpu:saver:{name}:{epoch}")

        def write():
            path = self._path(name)
            if not multi and os.path.exists(path):
                shutil.rmtree(path)
            self._ckpt.save(path, host)
            if _is_writer():
                meta = {"epoch": epoch,
                        "metric": None if metric is None else float(metric)}
                with open(os.path.join(path, "meta.json"), "w") as f:
                    json.dump(meta, f)

        self._submit(write)

    def save_checkpoint(self, state, epoch: int, metric: Optional[float] = None
                        ) -> Tuple[Optional[float], Optional[int]]:
        self._save(state, epoch, f"checkpoint-{epoch}", metric)
        # best-tracking is decided NOW (metric is a reduced host float and
        # must stay consistent on every process); only the file copies are
        # deferred behind the checkpoint write
        better = metric is not None and (
            self.best_metric is None or
            (metric < self.best_metric if self.decreasing else metric > self.best_metric))
        if better:
            self.best_metric, self.best_epoch = metric, epoch

        def post():
            if not _is_writer():
                return
            # 'last' is a file copy of checkpoint-N, not a second serialize —
            # the _save path costs a full cross-host allgather of the
            # (ZeRO-1-sharded) optimizer/EMA tree plus an orbax write
            last = self._path("last")
            if os.path.exists(last):
                shutil.rmtree(last)
            shutil.copytree(self._path(f"checkpoint-{epoch}"), last)
            # prune history
            ckpts = sorted(glob.glob(self._path("checkpoint-*")),
                           key=lambda p: int(p.rsplit("-", 1)[1]))
            while len(ckpts) > self.max_history:
                shutil.rmtree(ckpts.pop(0))
            if better:
                best = self._path("model_best")
                if os.path.exists(best):
                    shutil.rmtree(best)
                shutil.copytree(self._path(f"checkpoint-{epoch}"), best)

        self._submit(post)
        return self.best_metric, self.best_epoch

    def save_recovery(self, state, epoch: int, batch_idx: int,
                      epoch_complete: bool = False):
        """Mid-epoch snapshots record `epoch - 1` so a `--resume` restart
        (start_epoch = saved + 1) re-runs the interrupted epoch from its
        start — no batch is ever silently skipped; the re-trained prefix is
        the conservative cost. Only a snapshot taken at the epoch's last
        batch records the epoch itself."""
        self._save(state, epoch if epoch_complete else epoch - 1, "recovery", None)

    def restore(self, name: str, target) -> Tuple[Any, int]:
        self.wait_until_finished()
        path = self._path(name)
        state = self._ckpt.restore(path, item=_to_host(target))
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return state, int(meta.get("epoch", -1))


def resume_checkpoint(path: str, target, use_ema: bool = False) -> Tuple[Any, int]:
    """Resume from a saved orbax dir (last/recovery/checkpoint-N).

    The saver writes full TrainState trees (step/params/batch_stats/opt_state/
    ema_*). A bare variables-dict target ({params[, batch_stats]} — the
    validate.py / --initial-checkpoint path) extracts just the model weights
    from such a checkpoint (EMA weights with use_ema, mirroring timm
    load_checkpoint(use_ema=...), /root/reference/MAP/validate.py:168-169)
    instead of failing on the tree-structure mismatch."""
    ckpt = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    meta_path = os.path.join(path, "meta.json")
    epoch = -1
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            epoch = int(json.load(f).get("epoch", -1))

    target_is_state = hasattr(target, "opt_state")
    if target_is_state:
        state = ckpt.restore(path, item=_to_host(target))
        return state, epoch

    # variables-dict target: restore structure-free, then adapt
    raw = ckpt.restore(path)
    if isinstance(raw, dict) and "opt_state" in raw:  # a saved TrainState
        params = raw.get("params")
        batch_stats = raw.get("batch_stats") or {}
        if use_ema:
            if not raw.get("ema_params"):
                raise ValueError(f"--use-ema: checkpoint {path} has no EMA weights")
            params = raw["ema_params"]
            batch_stats = raw.get("ema_batch_stats") or batch_stats
        restored = {"params": params}
        if batch_stats:
            restored["batch_stats"] = batch_stats
        # validate against the target structure (catches wrong-model loads)
        t_struct = jax.tree_util.tree_structure(_to_host(dict(target)))
        r_struct = jax.tree_util.tree_structure(restored)
        if t_struct != r_struct:
            raise ValueError(
                f"checkpoint {path} params tree does not match the model: "
                f"{r_struct} vs {t_struct}")
        return restored, epoch
    return ckpt.restore(path, item=_to_host(target)), epoch


def export_pth_tar(variables: Dict[str, Any], model_name: str, out_path: str,
                   use_ema: bool = False):
    """Write a reference-compatible .pth.tar from flax variables.

    `variables` may be a bare {params[, batch_stats]} dict or a saved
    TrainState tree (as restored by orbax); with use_ema the EMA weights are
    exported (timm's --use-ema semantics)."""
    import torch

    if "opt_state" in variables:  # TrainState-shaped tree
        params = variables.get("ema_params") if use_ema else variables.get("params")
        if use_ema and not params:
            raise ValueError("use_ema: checkpoint has no EMA weights")
        bs = (variables.get("ema_batch_stats") if use_ema else None) \
            or variables.get("batch_stats") or {}
        variables = {"params": params, **({"batch_stats": bs} if bs else {})}
    elif use_ema:
        raise ValueError("use_ema needs a TrainState-shaped checkpoint")

    from imagenet_models_tpu.ckpt.torch_convert import export_torch_state_dict

    # invert the forward rules by round-trip: build reverse map from the
    # model's own torch key list is not available here, so we export with an
    # identity-ish back-translation (flax path -> torch dotted path) that each
    # model's forward rules were designed to be invertible over.
    from imagenet_models_tpu.ckpt.reverse_rules import reverse_translator

    translate_back = reverse_translator(model_name)
    sd = export_torch_state_dict(variables, translate_back)
    torch.save({"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in sd.items()}}, out_path)
    _logger.info("exported %d tensors to %s", len(sd), out_path)
