"""--split-bn: per-aug-split BN batch statistics (timm convert_splitbn_model,
/root/reference/GA/train.py:439-441).

Semantics pinned vs torch: feeding each split's rows through its own
torch.nn.BatchNorm2d (timm routes split 0 through the "main" BN, the rest
through aux BNs) must equal our interleaved-layout split-BN output, and only
the clean split's statistics may move the running stats eval consumes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagenet_models_tpu.nn.layers import (  # noqa: E402
    BatchNorm, bn_splits, set_bn_splits)


@pytest.fixture(autouse=True)
def _reset_bn_splits():
    yield
    set_bn_splits(1)


def _interleave(splits):
    """Stack per-split NHWC batches sample-major (row k*s+j = sample k,
    split j) — the loader's aug-splits layout."""
    s = len(splits)
    b = splits[0].shape[0]
    out = np.empty((b * s,) + splits[0].shape[1:], splits[0].dtype)
    for j, sp in enumerate(splits):
        out[j::s] = sp
    return out


def test_split_bn_matches_torch_per_split_bn():
    rng = np.random.default_rng(0)
    b, h, w, c, s = 4, 5, 5, 3, 2
    clean = rng.standard_normal((b, h, w, c)).astype(np.float32)
    aug = (rng.standard_normal((b, h, w, c)) * 3 + 1).astype(np.float32)
    x = _interleave([clean, aug])

    set_bn_splits(s)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        use_running_average=False)
    out, mutated = bn.apply(variables, jnp.asarray(x),
                            use_running_average=False,
                            mutable=["batch_stats"])
    out = np.asarray(out)

    # torch: main BN on the clean split, aux BN on the augmented split
    # (identical affine — see the documented deviation in nn/layers.py)
    tmain, taux = torch.nn.BatchNorm2d(c), torch.nn.BatchNorm2d(c)
    tmain.train(), taux.train()
    ref0 = tmain(torch.from_numpy(clean.transpose(0, 3, 1, 2)))
    ref1 = taux(torch.from_numpy(aug.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(out[0::s], ref0.detach().numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out[1::s], ref1.detach().numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)

    # running stats must carry ONLY the clean split (the stats eval reads)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               tmain.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               tmain.running_var.numpy(), rtol=1e-4, atol=1e-4)


def test_split_bn_eval_path_unchanged():
    """Eval (use_running_average=True) ignores the split gate entirely."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 3, 3, 2)).astype(np.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(bn.apply(variables, jnp.asarray(x),
                              use_running_average=True))
    set_bn_splits(2)
    out = np.asarray(bn.apply(variables, jnp.asarray(x),
                              use_running_average=True))
    np.testing.assert_array_equal(out, ref)


def test_split_bn_guard_on_indivisible_batch():
    """A batch not divisible by the split count falls back to whole-batch
    stats instead of miscomputing."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, 3, 3, 2)).astype(np.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(bn.apply(variables, jnp.asarray(x),
                              use_running_average=False,
                              mutable=["batch_stats"])[0])
    set_bn_splits(2)
    out = np.asarray(bn.apply(variables, jnp.asarray(x),
                              use_running_average=False,
                              mutable=["batch_stats"])[0])
    np.testing.assert_array_equal(out, ref)


def test_cli_split_bn_requires_aug_splits():
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "train.py", "synthetic:64", "--split-bn",
         "--epochs", "1"],
        capture_output=True, text=True, cwd=str(
            __import__("pathlib").Path(__file__).parent.parent),
        env={**__import__("os").environ, "IMTPU_PLATFORM": "cpu"},
        timeout=240)
    assert proc.returncode != 0
    assert "--aug-splits" in proc.stderr + proc.stdout
