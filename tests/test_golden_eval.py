"""Offline tests of the golden-eval harness logic (scripts/golden_eval.py).

The harness maps the reference's MAP/README.MD §2 golden logs (the de-facto
acceptance tests, SURVEY §4.2) to one command. The real run needs the released
checkpoints (network egress); here the resolution, judging, skip and output
paths are pinned with local fixtures.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import golden_eval  # noqa: E402


def test_golden_table_matches_baseline():
    """All 7 released checkpoints present with the README.MD §2 numbers."""
    assert len(golden_eval.GOLDEN) == 7
    g = golden_eval.GOLDEN["map_convnext_tiny"]
    assert g["top1"] == 83.166 and g["crop_pct"] == 0.875
    assert golden_eval.GOLDEN["map_faster_vit_3_224"]["param_count"] == 187.34


def test_resolve_checkpoint_prefers_env_dir(tmp_path, monkeypatch):
    env_dir = tmp_path / "pre"
    env_dir.mkdir()
    (env_dir / "map_pit_s.pth.tar").write_bytes(b"x")
    monkeypatch.setenv("IMTPU_PRETRAINED_DIR", str(env_dir))
    assert golden_eval.resolve_checkpoint("map_pit_s") == str(
        env_dir / "map_pit_s.pth.tar")
    assert golden_eval.resolve_checkpoint("map_resnet50") is None


@pytest.mark.parametrize("top1,top5,expect", [
    (83.166, 96.272, "PASS"),        # exact
    (83.366, 96.472, "PASS"),        # +0.2 boundary inclusive
    (83.40, 96.272, "FAIL"),         # top1 out
    (83.166, 95.9, "FAIL"),          # top5 out
])
def test_judge_tolerance(top1, top5, expect):
    v = golden_eval.judge("map_convnext_tiny",
                          {"top1": top1, "top5": top5}, tol=0.2)
    assert v["status"] == expect


def test_main_skips_offline_with_command(tmp_path, monkeypatch, capsys):
    """No checkpoints + --no-download => every model SKIPPED, each with the
    exact ready-to-run command."""
    monkeypatch.setenv("IMTPU_PRETRAINED_DIR", str(tmp_path / "none"))
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "verdict.json"
    rc = golden_eval.main(["/data/imagenet", "--no-download",
                           "--out", str(out)])
    assert rc == 0  # skips are not failures
    summary = json.loads(out.read_text())
    assert summary["n_skipped"] == 7 and summary["n_fail"] == 0
    for v in summary["verdicts"]:
        assert v["status"] == "SKIPPED"
        assert "--crop-pct" in v["command"] and v["model"] in v["command"]
    assert "SKIPPED" in capsys.readouterr().out


def test_parse_result_json_robust():
    """The --result JSON may be followed by trailing log lines containing
    '}' (ADVICE r3: the old greedy DOTALL regex corrupted the capture)."""
    result = {"top1": 83.1, "top5": 96.2, "param_count": 47.83}
    out = ("noise\n--result\n" + json.dumps(result, indent=4)
           + "\ntrailing log {with: braces} and }\n{\"not\": \"the result\"}\n")
    assert golden_eval.parse_result_json(out, "m") == result
    with pytest.raises(RuntimeError, match="no --result"):
        golden_eval.parse_result_json("no marker here", "m")
    with pytest.raises(RuntimeError, match="no --result JSON"):
        golden_eval.parse_result_json("--result\nnot json {{{", "m")


def test_data_config_parity_offline():
    """Every golden model's resolved eval data config must match the golden
    log header (README.MD §2: bicubic, ImageNet mean/std, center crop,
    224 input) — so a future networked golden run can't silently use the
    wrong preprocessing."""
    for name in golden_eval.GOLDEN:
        c = golden_eval.check_data_config(name)
        assert c["data_config_ok"], (name, c["mismatches"])
    # the check must actually read the POPULATED registry (not the base
    # fallback — an unknown name must fail loudly, and a per-model override
    # must be visible)
    with pytest.raises(KeyError):
        golden_eval.check_data_config("map_not_a_model")
    from imagenet_models_tpu.core.registry import default_cfg

    assert default_cfg("map_faster_vit_3_224")["crop_pct"] == 1.0  # != base .875


def test_main_judges_with_fixture_validate(tmp_path, monkeypatch):
    """With a checkpoint present, main() runs validate and judges: one PASS
    (within tol) and one FAIL wired through a stubbed run_validate."""
    pre = tmp_path / "pre"
    pre.mkdir()
    (pre / "map_mobilenet_v1.pth.tar").write_bytes(b"x")
    (pre / "map_pit_s.pth.tar").write_bytes(b"x")
    monkeypatch.setenv("IMTPU_PRETRAINED_DIR", str(pre))
    monkeypatch.chdir(tmp_path)

    def fake_validate(name, ckpt, data, batch_size=256, extra=()):
        assert os.path.isfile(ckpt)
        if name == "map_mobilenet_v1":
            return {"top1": 73.43, "top5": 91.364}   # golden exact
        return {"top1": 80.0, "top5": 95.0}          # way off

    monkeypatch.setattr(golden_eval, "run_validate", fake_validate)
    out = tmp_path / "verdict.json"
    rc = golden_eval.main(["/data/imagenet", "--no-download",
                           "--model", "map_mobilenet_v1", "--out", str(out)])
    assert rc == 0
    assert json.loads(out.read_text())["n_pass"] == 1

    rc = golden_eval.main(["/data/imagenet", "--no-download",
                           "--model", "map_pit_s", "--out", str(out)])
    assert rc == 1
    assert json.loads(out.read_text())["n_fail"] == 1
