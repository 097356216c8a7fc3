"""Host-side engine logic: NaN watchdog, LR schedule values, WD mask,
EMA/update bookkeeping helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagenet_models_tpu.parallel.mesh import data_mesh
from imagenet_models_tpu.train.engine import NaNWatchdog, train_one_epoch
from imagenet_models_tpu.train.optim import wd_mask
from imagenet_models_tpu.train.scheduler import cosine_schedule


class _FakeLoader:
    batch_size = 4
    mixup_enabled = False

    def __len__(self):
        return 3

    def __iter__(self):
        for _ in range(3):
            yield np.zeros((4, 8, 8, 3), np.float32), np.zeros((4,), np.int64)


def test_nan_watchdog_fires():
    mesh = data_mesh(jax.devices("cpu")[:1])

    calls = {"n": 0}

    def step_fn(state, images, targets, rng):
        calls["n"] += 1
        loss = jnp.nan if calls["n"] == 2 else jnp.float32(1.0)
        return state, {"loss": jnp.float32(loss), "grad_norm": jnp.float32(0.0)}

    with pytest.raises(NaNWatchdog):
        train_one_epoch(0, {}, step_fn, _FakeLoader(), mesh, jax.random.PRNGKey(0),
                        log_interval=1)


def test_cosine_schedule_timm_semantics():
    lr = cosine_schedule(5e-3, epochs=300, warmup_epochs=5, warmup_lr=1e-6, min_lr=1e-5)
    assert float(lr(0)) == pytest.approx(1e-6)
    assert float(lr(2.5)) == pytest.approx((1e-6 + 5e-3) / 2, rel=1e-3)
    # warmup_prefix=False: cosine argument is the raw epoch
    assert float(lr(5)) == pytest.approx(
        1e-5 + 0.5 * (5e-3 - 1e-5) * (1 + np.cos(np.pi * 5 / 300)), rel=1e-6)
    assert float(lr(300)) == pytest.approx(1e-5, rel=1e-6)
    # monotone decreasing after warmup
    vals = [float(lr(e)) for e in range(5, 300, 10)]
    assert all(a > b for a, b in zip(vals, vals[1:]))


def test_wd_mask_excludes_1d_and_tokens():
    params = {
        "dense": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))},
        "norm": {"scale": jnp.zeros((4,)), "bias": jnp.zeros((4,))},
        "cap": {"x_cls": jnp.zeros((1, 2, 8))},
        "pit": {"pos_embed": jnp.zeros((1, 3, 3, 8))},
        "blk": {"gamma": jnp.zeros((8,))},
        # MaxViT no_weight_decay() name exclusion (map_maxvit.py:1271-1274)
        "attn": {"rel_pos": {"relative_position_bias_table": jnp.zeros((13, 13, 4))}},
    }
    mask = wd_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["norm"]["scale"] is False
    assert mask["cap"]["x_cls"] is False
    assert mask["pit"]["pos_embed"] is False
    assert mask["blk"]["gamma"] is False
    assert mask["attn"]["rel_pos"]["relative_position_bias_table"] is False


def test_cosine_schedule_cooldown_holds_min_lr():
    # timm: epochs beyond t_initial (the cooldown tail) run at min_lr
    lr = cosine_schedule(5e-3, epochs=300, warmup_epochs=5, warmup_lr=1e-6, min_lr=1e-5)
    for e in (300, 303, 310):
        assert float(lr(e)) == pytest.approx(1e-5, rel=1e-6)


def test_truncate_wrapper_delegates_attribute_writes():
    # --mixup-off-epoch flips mixup_enabled on the wrapper; the write must
    # reach the wrapped DataLoader whose __iter__ applies mixup
    from train import _truncate

    loader = _FakeLoader()
    loader.mixup_enabled = True
    wrapped = _truncate(loader, 2)
    assert wrapped.mixup_enabled is True
    assert wrapped.batch_size == 4
    wrapped.mixup_enabled = False
    assert loader.mixup_enabled is False
    assert len(wrapped) == 2 and len(list(wrapped)) == 2


def test_cosine_schedule_cycles_and_k_decay():
    """timm CosineLRScheduler restart semantics: --lr-cycle-mul/-decay/-limit
    and --lr-k-decay (GA/train.py:153-160)."""
    import numpy as np

    # cycle_mul=1: cycle i restarts every `epochs`; peak decays by cycle_decay
    lr = cosine_schedule(1e-2, epochs=10, warmup_epochs=0, warmup_lr=1e-6,
                         min_lr=1e-5, cycle_mul=1.0, cycle_decay=0.5,
                         cycle_limit=3)
    assert np.isclose(float(lr(0)), 1e-2)                      # cycle-0 peak
    assert np.isclose(float(lr(10)), 5e-3)                     # cycle-1 peak decayed
    assert np.isclose(float(lr(20)), 2.5e-3)                   # cycle-2 peak
    assert np.isclose(float(lr(30)), 1e-5)                     # past cycle_limit -> min
    # mid-cycle value equals the single-cycle cosine scaled to the cycle peak
    single = cosine_schedule(5e-3, epochs=10, warmup_epochs=0, warmup_lr=1e-6,
                             min_lr=1e-5)
    assert np.isclose(float(lr(15)), float(single(5)), rtol=1e-6)

    # cycle_mul=2: cycle lengths 10, 20, 40 -> restarts at t=10, 30
    lr2 = cosine_schedule(1e-2, epochs=10, warmup_epochs=0, warmup_lr=1e-6,
                          min_lr=1e-5, cycle_mul=2.0, cycle_decay=1.0,
                          cycle_limit=10)
    assert np.isclose(float(lr2(10)), 1e-2)
    assert np.isclose(float(lr2(30)), 1e-2)
    assert float(lr2(29)) < 1e-4  # end of cycle-1 is near min_lr

    # k_decay reshapes the curve but keeps the endpoints
    lrk = cosine_schedule(1e-2, epochs=10, warmup_epochs=0, warmup_lr=1e-6,
                          min_lr=1e-5, k_decay=2.0)
    assert np.isclose(float(lrk(0)), 1e-2)
    assert np.isclose(float(lrk(10)), 1e-5)
    assert float(lrk(5)) > float(cosine_schedule(
        1e-2, epochs=10, warmup_epochs=0, warmup_lr=1e-6, min_lr=1e-5)(5))


def test_lr_noise_table_bounded_and_ranged():
    import numpy as np

    from imagenet_models_tpu.train.scheduler import lr_noise_table

    t = lr_noise_table(100, [50], noise_pct=0.2, noise_std=1.0, seed=7)
    assert t.shape == (100,)
    assert np.all(t[:50] == 0)                   # before the noise range
    assert np.any(t[50:] != 0)                   # noise active after
    assert np.all(np.abs(t) < 0.2)               # rejection-bounded
    t2 = lr_noise_table(100, [50], noise_pct=0.2, noise_std=1.0, seed=7)
    assert np.array_equal(t, t2)                 # seeded-deterministic
    assert lr_noise_table(100, None) is None
    ranged = lr_noise_table(100, [20, 40], noise_pct=0.5, seed=1)
    assert np.all(ranged[:20] == 0) and np.all(ranged[40:] == 0)
    assert np.any(ranged[20:40] != 0)
    # schedule applies the table multiplicatively
    lr = cosine_schedule(1e-2, epochs=100, warmup_epochs=0, warmup_lr=1e-6,
                         min_lr=1e-5, noise_table=t)
    base = cosine_schedule(1e-2, epochs=100, warmup_epochs=0, warmup_lr=1e-6,
                           min_lr=1e-5)
    assert np.isclose(float(lr(60)), float(base(60)) * (1 + t[60]), rtol=1e-6)
    assert np.isclose(float(lr(10)), float(base(10)), rtol=1e-6)


def test_save_image_grid(tmp_path):
    """--save-images batch dumps (GA/train.py:803-808): tiled grid, min-max
    normalized, written as jpg."""
    import numpy as np
    from PIL import Image

    from imagenet_models_tpu.train.engine import save_image_grid

    batch = np.random.default_rng(0).normal(0, 2, (10, 16, 16, 3)).astype(np.float32)
    p = tmp_path / "train-batch-0.jpg"
    save_image_grid(batch, str(p))
    img = Image.open(p)
    assert img.size == (8 * 16, 2 * 16)  # 8 cols x 2 rows


def test_validate_tta_group_averaging():
    """--tta N: eval logits averaged over groups of N consecutive samples,
    targets strided (MAP/train.py:1009-1012). Fake a loader where each pair's
    logits disagree individually but agree after averaging."""
    from imagenet_models_tpu.train.engine import validate
    from imagenet_models_tpu.train.state import make_eval_step

    class _M:
        def apply(self, variables, images, training=False):
            # logits: images' first pixel channel encodes them directly
            return images[:, 0, 0, :]

    class _L:
        batch_size = 4

        def __len__(self):
            return 1

        def __iter__(self):
            # sample logits (4 samples, 6 classes; >=6 so top-5 works):
            # pair means argmax to cls 1 and cls 2, singles disagree
            x = np.full((4, 1, 1, 6), -10.0, np.float32)
            x[0, 0, 0, :3] = [3.0, 2.0, 0.0]
            x[1, 0, 0, :3] = [0.0, 3.0, 2.5]   # mean [1.5, 2.5, 1.25] => cls 1
            x[2, 0, 0, :3] = [0.0, 1.0, 4.0]
            x[3, 0, 0, :3] = [3.5, 0.0, 0.0]   # mean [1.75, .5, 2.0] => cls 2
            yield x, np.array([1, -1, 2, -1], np.int64)

    from imagenet_models_tpu.train.state import TrainState

    state = TrainState(step=jnp.zeros((), jnp.int32), params={},
                       batch_stats={}, opt_state=None)
    mesh = data_mesh(jax.devices("cpu")[:1])
    step = make_eval_step(_M(), mesh=None, tta=2)
    metrics = validate(state, step, _L(), mesh, tta=2)
    assert metrics["top1"] == 100.0
    step1 = make_eval_step(_M(), mesh=None, tta=0)
    metrics1 = validate(state, step1, _L(), mesh, tta=0)
    assert metrics1["top1"] < 100.0


def test_set_schedule_count_repoints_lr_only():
    """--no-resume-opt/--start-epoch: the LR-schedule counter must follow the
    engine epoch while Adam/LAMB bias-correction counts stay fresh (timm
    steps its scheduler by epoch outside the optimizer, MAP/train.py:552)."""
    import optax

    from imagenet_models_tpu.train.optim import create_optimizer, set_schedule_count

    seen = []

    def lr(step):
        seen.append(int(step))
        return 1e-3

    tx = create_optimizer("lamb", learning_rate=lr, weight_decay=0.05)
    params = {"w": jnp.zeros((4, 4))}
    st = set_schedule_count(tx.init(params), 1234)

    sched = [s for s in jax.tree_util.tree_leaves(
        st, is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState))
        if isinstance(x := s, optax.ScaleByScheduleState)]
    assert sched and all(int(s.count) == 1234 for s in sched)
    from imagenet_models_tpu.train.optim import TimmLambState

    adam = [s for s in jax.tree_util.tree_leaves(
        st, is_leaf=lambda x: isinstance(x, TimmLambState))
        if isinstance(s, TimmLambState)]
    assert adam and all(int(s.count) == 0 for s in adam)

    seen.clear()
    _updates, _ = tx.update({"w": jnp.ones((4, 4))}, st, params)
    assert 1234 in seen  # the applied LR was evaluated at the repointed step


def test_preemption_saves_recovery_and_raises():
    """SIGTERM → recovery checkpoint at the next step boundary → Preempted
    (preemption-safe training, engine.install_preemption_handler)."""
    from imagenet_models_tpu.train import engine

    mesh = data_mesh(jax.devices("cpu")[:1])
    calls = {"n": 0}
    saved = []

    class _Saver:
        def save_recovery(self, state, epoch, batch_idx, epoch_complete=False):
            saved.append((epoch, batch_idx, epoch_complete))

    def step_fn(state, images, targets, rng):
        calls["n"] += 1
        if calls["n"] == 2:  # signal lands mid-step
            engine._PREEMPT["signaled"] = True
        return state, {"loss": jnp.float32(1.0), "grad_norm": jnp.float32(0.0)}

    try:
        with pytest.raises(engine.Preempted):
            train_one_epoch(0, {}, step_fn, _FakeLoader(), mesh,
                            jax.random.PRNGKey(0), log_interval=1, saver=_Saver())
        # boundary right after batch 1, flagged mid-epoch (epoch_complete=False
        # unless it was the final batch)
        assert saved and saved[-1] == (0, 1, False)
        assert calls["n"] == 2  # batch 2 never dispatched
    finally:
        engine._PREEMPT["signaled"] = False


def test_preemption_handler_installs_and_fires():
    import os
    import signal

    from imagenet_models_tpu.train import engine

    engine.install_preemption_handler()
    try:
        os.kill(os.getpid(), signal.SIGTERM)
        assert engine._PREEMPT["signaled"]
    finally:
        engine._PREEMPT["signaled"] = False
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
