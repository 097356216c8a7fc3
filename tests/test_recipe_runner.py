"""Recipe-runner plumbing: the preset hyper-parameter line must reach run()
as parsed train.py args, with every wrapper-level override applied on top
(reference: MAP/train_with_script.py:56-84 injects these attributes before
calling run; here they are first-class flags assigned the same way)."""

import copy
import sys

import pytest

import train_with_script as tws


@pytest.fixture()
def captured(monkeypatch):
    calls = []

    def fake_run(args, args_text):
        # the runner mutates ONE namespace per setup (reference semantics:
        # MAP/train_with_script.py:67-84) — snapshot at call time
        calls.append((copy.deepcopy(args), args_text))

    monkeypatch.setattr(tws, "run", fake_run)
    return calls


def _main(monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["train_with_script.py"] + argv)
    tws.main()


def test_recipe_values_and_overrides(monkeypatch, captured):
    _main(monkeypatch, [
        "convnext_tiny", "-m", "map_convnext_tiny",
        "--data-dir", "synthetic:64", "--epochs", "2", "-b", "4",
        "-tb", "8", "--max-steps-per-epoch", "3", "-s", "7",
        "--dec-lam", "-0.5", "--distill-tokens", "2",
        "--token-distillation", "0", "-e", "5",
    ])
    assert len(captured) == 1
    args, args_text = captured[0]
    # from the preset line (train_with_script.py recipe strings)
    assert args.opt == "lamb" and args.bce_loss and args.smoothing == 0.1
    assert args.drop_path == 0.1 and args.model_ema_decay == 0.9999
    assert args.aug_repeats == 3 and args.crop_pct == 0.875
    # wrapper overrides win
    assert args.model == "map_convnext_tiny"
    assert args.data_dir == "synthetic:64"
    assert args.epochs == 2 and args.batch_size == 4
    assert args.total_batch_size == 8 and args.max_steps_per_epoch == 3
    assert args.seed == 7 and args.eval_epoch == 5
    assert args.dec_lam == -0.5
    assert args.distill_tokens == 2 and args.token_distillation == 0
    # provenance text is the parsed-args yaml dump, non-empty
    assert "lamb" in args_text


def test_setup_x_model_product(monkeypatch, captured):
    _main(monkeypatch, [
        "mobilenet_v1", "convnext_tiny",
        "-m", "map_mobilenet_v1", "map_convnext_tiny",
        "--data-dir", "synthetic:32",
    ])
    assert [(a.model, a.epochs) for a, _ in captured] == [
        ("map_mobilenet_v1", 100), ("map_convnext_tiny", 100),
        ("map_mobilenet_v1", 300), ("map_convnext_tiny", 300),
    ]
    # mobilenet recipe's distinct knobs survive per-setup re-parse
    mob = captured[0][0]
    assert mob.input_size == [3, 160, 160] and mob.reprob == 0.0


def test_dist_flags_reach_run(monkeypatch, captured):
    """Multi-host launches go through the recipe runner too (the reference's
    true entry point is torchrun'd multi-node; here the jax.distributed
    flags forward to train.py)."""
    _main(monkeypatch, [
        "convnext_tiny", "-m", "map_convnext_tiny", "--data-dir", "synthetic:32",
        "--dist-coordinator", "10.0.0.1:1234",
        "--dist-num-processes", "4", "--dist-process-id", "2",
    ])
    args = captured[0][0]
    assert args.dist_coordinator == "10.0.0.1:1234"
    assert args.dist_num_processes == 4 and args.dist_process_id == 2
    # without the flag the recipe default stays (single-process)
    captured.clear()
    _main(monkeypatch, [
        "convnext_tiny", "-m", "map_convnext_tiny", "--data-dir", "synthetic:32",
    ])
    assert captured[0][0].dist_coordinator == ""


def test_finetune_flags_reach_run(monkeypatch, captured):
    """ADVICE round-1 regression: -fp/-pt must be copied onto run args."""
    _main(monkeypatch, [
        "resnet50", "-m", "map_resnet50",
        "-fp", "/tmp/ft.pth.tar", "-pt", "--data-dir", "synthetic:32",
    ])
    args = captured[0][0]
    assert args.finetuning_checkpoint == "/tmp/ft.pth.tar"
    assert args.in21k_to_in1k is True
