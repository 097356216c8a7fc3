"""Async (write-behind) checkpoint saves: same on-disk layout and semantics
as the synchronous path, with serialization off the train-step path.

The reference blocks the loop on torch.save for every --recovery-interval
snapshot (GA/train.py:810-812); here the device->host snapshot stays
synchronous (state capture) and the file writes land on a single writer
thread, ordered, with one save in flight."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp
import optax

from imagenet_models_tpu.ckpt.saver import CheckpointSaver, resume_checkpoint
from imagenet_models_tpu.train.state import create_train_state


def _state(v: float):
    variables = {"params": {"w": jnp.full((2, 2), v)}}
    return create_train_state(variables, optax.sgd(1e-3))


def test_async_matches_sync_layout(tmp_path):
    """A sequence of epoch saves through the async saver produces the exact
    file set + meta + best/last tracking of the sync saver."""
    metrics = [10.0, 30.0, 20.0, 40.0]
    dirs = {}
    for mode, async_save in (("sync", False), ("async", True)):
        root = tmp_path / mode
        saver = CheckpointSaver(str(root), max_history=2, async_save=async_save)
        for ep, m in enumerate(metrics):
            best, best_ep = saver.save_checkpoint(_state(float(ep)), ep, metric=m)
        saver.wait_until_finished()
        assert (best, best_ep) == (40.0, 3)
        dirs[mode] = sorted(os.listdir(root))
    assert dirs["async"] == dirs["sync"]
    # history pruned to 2, best/last point at epoch 3
    assert "checkpoint-0" not in dirs["async"] and "checkpoint-3" in dirs["async"]
    for name, want_ep in (("last", 3), ("model_best", 3)):
        with open(tmp_path / "async" / name / "meta.json") as f:
            assert json.load(f)["epoch"] == want_ep


def test_async_best_not_overwritten_by_worse_epoch(tmp_path):
    saver = CheckpointSaver(str(tmp_path), async_save=True)
    saver.save_checkpoint(_state(1.0), 0, metric=50.0)
    saver.save_checkpoint(_state(2.0), 1, metric=10.0)  # worse
    saver.wait_until_finished()
    got, ep = resume_checkpoint(str(tmp_path / "model_best"), _state(0.0))
    assert ep == 0
    np.testing.assert_array_equal(np.asarray(got.params["w"]), np.ones((2, 2)))
    # 'last' tracks the newest epoch regardless
    _, ep_last = resume_checkpoint(str(tmp_path / "last"), _state(0.0))
    assert ep_last == 1


def test_async_snapshot_is_point_in_time(tmp_path):
    """The device->host capture happens at save time: mutating the state
    object afterwards must not leak into the queued write."""
    saver = CheckpointSaver(str(tmp_path), async_save=True)
    state = _state(7.0)
    saver.save_recovery(state, epoch=3, batch_idx=5)
    state = state.replace(params={"w": jnp.zeros((2, 2))})  # noqa: F841
    saver.wait_until_finished()
    got, ep = resume_checkpoint(str(tmp_path / "recovery"), _state(0.0))
    assert ep == 2  # mid-epoch snapshot carries epoch-1
    np.testing.assert_array_equal(np.asarray(got.params["w"]),
                                  np.full((2, 2), 7.0))


def test_async_restore_waits_for_queue(tmp_path):
    """saver.restore drains the queue first — a save/restore pair in one
    process never reads a half-written dir."""
    saver = CheckpointSaver(str(tmp_path), async_save=True)
    saver.save_checkpoint(_state(4.0), 9)
    got, ep = saver.restore("checkpoint-9", _state(0.0))
    assert ep == 9
    np.testing.assert_array_equal(np.asarray(got.params["w"]),
                                  np.full((2, 2), 4.0))


def test_async_write_failure_surfaces(tmp_path):
    """A failed write must raise at the next sync point, not vanish."""
    saver = CheckpointSaver(str(tmp_path), async_save=True)
    saver.save_checkpoint(_state(1.0), 0)
    saver.wait_until_finished()
    # poison the next write: replace the checkpointer with one that raises
    class Boom:
        def save(self, *a, **k):
            raise IOError("disk gone")

    saver._ckpt = Boom()
    saver.save_recovery(_state(2.0), epoch=1, batch_idx=1)
    with pytest.raises(IOError, match="disk gone"):
        saver.wait_until_finished()
    # the saver stays usable for a retry after the error is consumed
    saver._ckpt = __import__("orbax.checkpoint", fromlist=["x"]).PyTreeCheckpointer()
    saver.save_recovery(_state(3.0), epoch=1, batch_idx=2)
    saver.wait_until_finished()
    _, ep = resume_checkpoint(str(tmp_path / "recovery"), _state(0.0))
    assert ep == 0
