"""Checkpoint interchangeability: flax -> torch .pth.tar export must
round-trip key- and value-identically through the forward converter
(BASELINE.md hard requirement)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagenet_models_tpu.ckpt.pretrained import translator_for
from imagenet_models_tpu.ckpt.reverse_rules import reverse_translator
from imagenet_models_tpu.ckpt.torch_convert import (
    convert_torch_state_dict,
    export_torch_state_dict,
    flatten_dict,
)
from imagenet_models_tpu.models.convnext import ConvNeXt


@pytest.mark.parametrize("mmcap", [False, True])
def test_convnext_export_roundtrip(mmcap):
    model = ConvNeXt(depths=(1, 1, 2, 1), dims=(8, 8, 16, 16), num_classes=7,
                     global_pool="mmcap" if mmcap else "avg", last_dim=16,
                     n_groups=2, n_tokens=2, gram_group=2, bp_dim=16, ca_dim=16,
                     num_heads=2)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x, training=False)

    name = "map_convnext_tiny" if mmcap else "convnext_tiny"
    sd = export_torch_state_dict(variables, reverse_translator(name))
    assert sd, "empty export"
    # import it back through the forward converter
    variables2 = convert_torch_state_dict(sd, variables, translator_for(name), strict=True)
    for col in ("params", "batch_stats"):
        a, b = flatten_dict(variables.get(col, {})), flatten_dict(variables2.get(col, {}))
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)

    # and the torch-side key names follow the reference layout
    keys = set(sd)
    assert "downsample_layers.0.0.weight" in keys
    assert "stages.0.0.dwconv.weight" in keys
    if mmcap:
        assert any(k.startswith("head.mmcap.mmcap.0.gram_token_extraction.ch_reduction.0.") for k in keys)
        assert "head.self_dt_heads.0.norm.weight" in keys


def test_ga_cswin_export_roundtrip():
    """GA-CSWin reverse rules (were missing in round 1, VERDICT weak #7)."""
    from imagenet_models_tpu.models.ga_cswin import GA_CSWinTransformer

    # gram_dim must be divisible by 12 (the gram_layer CSWinBlock hardcodes 6
    # heads over two half-channel stripe branches, ga_cswin.py:569) and its
    # triu count by the grouped-conv group width 8
    model = GA_CSWinTransformer(embed_dim=16, depth=(1, 1, 2, 1),
                                dims=(16, 32, 64, 128), num_heads=(2, 2, 4, 4, 4),
                                split_size=(1, 2, 2, 2, 2), branches=2, gram_dim=48,
                                stage3_naggre=1, num_classes=7)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, training=False)

    sd = export_torch_state_dict(variables, reverse_translator("ga_cswin_tiny"))
    assert sd, "empty export"
    variables2 = convert_torch_state_dict(sd, variables, translator_for("ga_cswin_tiny"),
                                          strict=True)
    for col in ("params", "batch_stats"):
        a, b = flatten_dict(variables.get(col, {})), flatten_dict(variables2.get(col, {}))
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)

    keys = set(sd)
    assert "stage1_conv_embed.0.weight" in keys       # deep stem conv
    assert any(k.startswith("gram_contraction.0.0.") for k in keys)
    assert any(k.startswith("gram_contraction.0.1.") for k in keys)  # BN
    assert any(k.startswith("ga.0.") for k in keys)
    assert "fc.0.weight" in keys
    assert any(k.startswith("stage5.2.") for k in keys)  # stage-5 CSWin block


def test_resume_checkpoint_extracts_variables_from_train_state(tmp_path):
    """Orbax checkpoints hold full TrainStates; validate.py restores into a
    bare variables dict — the mismatch raised in round 1 (ADVICE #3)."""
    import optax

    from imagenet_models_tpu.ckpt.saver import CheckpointSaver, resume_checkpoint
    from imagenet_models_tpu.train.state import create_train_state

    variables = {"params": {"w": jnp.ones((2, 2))},
                 "batch_stats": {"bn": {"mean": jnp.zeros((2,))}}}
    tx = optax.sgd(1e-3)
    state = create_train_state(variables, tx, ema_decay=0.9)
    state = state.replace(params={"w": jnp.full((2, 2), 2.0)},
                          ema_params={"w": jnp.full((2, 2), 3.0)})
    saver = CheckpointSaver(str(tmp_path / "ckpt"))
    saver.save_checkpoint(state, epoch=4, metric=1.0)

    path = str(tmp_path / "ckpt" / "last")
    # full-state resume target still round-trips
    restored_state, epoch = resume_checkpoint(path, state)
    assert epoch == 4
    np.testing.assert_array_equal(np.asarray(restored_state.params["w"]), 2.0 * np.ones((2, 2)))

    # bare-variables target extracts params (+ EMA with use_ema)
    got, _ = resume_checkpoint(path, variables)
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]), 2.0 * np.ones((2, 2)))
    assert "batch_stats" in got
    got_ema, _ = resume_checkpoint(path, variables, use_ema=True)
    np.testing.assert_array_equal(np.asarray(got_ema["params"]["w"]), 3.0 * np.ones((2, 2)))


def test_recovery_epoch_semantics(tmp_path):
    """Mid-epoch recovery snapshots carry epoch-1 so a --resume restart
    (start_epoch = saved + 1) re-runs the interrupted epoch from its start —
    no data silently skipped; only a snapshot at the epoch's final batch
    records the epoch itself (CheckpointSaver.save_recovery)."""
    import optax

    from imagenet_models_tpu.ckpt.saver import CheckpointSaver, resume_checkpoint
    from imagenet_models_tpu.train.state import create_train_state

    variables = {"params": {"w": jnp.ones((2, 2))}}
    state = create_train_state(variables, optax.sgd(1e-3))
    saver = CheckpointSaver(str(tmp_path / "ckpt"))
    path = str(tmp_path / "ckpt" / "recovery")

    saver.save_recovery(state, epoch=5, batch_idx=100)  # mid-epoch
    _, ep = resume_checkpoint(path, state)
    assert ep == 4  # start_epoch = 5: the interrupted epoch re-runs

    saver.save_recovery(state, epoch=5, batch_idx=999, epoch_complete=True)
    _, ep = resume_checkpoint(path, state)
    assert ep == 5  # epoch finished: start_epoch = 6


def test_maxvit_ckpt_usable_at_new_resolution():
    """change_img_size equivalent (map_maxvit.py:1276-1283): rel-pos tables
    from a checkpoint trained at one resolution are bilinearly re-resolved to
    the new window size on load, instead of failing on shape mismatch."""
    from imagenet_models_tpu.models.maxvit import MaxxVit

    # dims must be >= dim_head (32) for the attention head split
    kw = dict(embed_dim=(32, 64), depths=(1, 1), stem_width=32, num_classes=5,
              partition_ratio=16, global_pool="avg", head_hidden_size=16)
    m64 = MaxxVit(**kw)
    v64 = m64.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False)
    # give the zero-init TF rel-pos tables real values so the resize is exercised
    import jax as _jax

    v64 = _jax.tree.map(
        lambda x: jnp.asarray(np.random.default_rng(0).standard_normal(x.shape),
                              x.dtype) if x.ndim == 3 else x, v64)
    sd = export_torch_state_dict(v64, reverse_translator("maxvit_tiny_tf_224"))

    m96 = MaxxVit(**kw)
    v96 = m96.init(jax.random.PRNGKey(1), jnp.zeros((1, 96, 96, 3)), training=False)
    v96b = convert_torch_state_dict(sd, v96, translator_for("maxvit_tiny_tf_224"),
                                    strict=True)
    out = m96.apply(v96b, jnp.ones((1, 96, 96, 3)), training=False)
    assert np.isfinite(np.asarray(out)).all()
    # the resized tables differ from fresh init (zeros) and have the new shape
    flat96 = flatten_dict(v96b["params"])
    tables = [v for k, v in flat96.items() if "relative_position_bias_table" in k]
    assert tables and all(np.abs(np.asarray(t)).sum() > 0 for t in tables)


def test_export_pth_tar_from_train_state(tmp_path):
    """export_pth_tar accepts a saved TrainState tree and selects EMA weights
    with use_ema (scripts/export_checkpoint.py path)."""
    import optax
    torch = pytest.importorskip("torch")

    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu import create_model
    from imagenet_models_tpu.ckpt.saver import export_pth_tar
    from imagenet_models_tpu.train.state import create_train_state

    model = create_model("mobilenet_v1", num_classes=10)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                               training=False)
    state = create_train_state(variables, optax.sgd(1e-3), ema_decay=0.9)
    ema = jax.tree.map(lambda x: x + 1.0, state.params)
    tree = {"step": 0, "params": state.params, "batch_stats": state.batch_stats,
            "opt_state": (), "ema_params": ema, "ema_batch_stats": state.batch_stats}

    p1 = str(tmp_path / "plain.pth.tar")
    p2 = str(tmp_path / "ema.pth.tar")
    export_pth_tar(tree, "mobilenet_v1", p1)
    export_pth_tar(tree, "mobilenet_v1", p2, use_ema=True)
    sd1 = torch.load(p1, map_location="cpu", weights_only=False)["state_dict"]
    sd2 = torch.load(p2, map_location="cpu", weights_only=False)["state_dict"]
    assert set(sd1) == set(sd2)
    np.testing.assert_allclose(sd2["fc.bias"].numpy(), sd1["fc.bias"].numpy() + 1.0)
