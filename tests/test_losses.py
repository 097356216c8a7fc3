"""Loss parity vs the reference's torch formulas: timm BCE / soft-target CE /
label smoothing, the MAP multi_group_loss (self-distill + decorrelation KLs,
MAP/train.py:792-839) and GA's branch-sum + decorrelation (GA/train.py:735-745).
The torch side re-implements the exact reference math inline."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from imagenet_models_tpu.train import losses as L  # noqa: E402


def _rand_logits(b=8, c=13, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, c)).astype(np.float32) * 2


def test_bce_with_smoothing_matches_torch():
    x = _rand_logits()
    t = np.random.default_rng(1).integers(0, 13, (8,))
    mine = float(L.binary_cross_entropy(jnp.asarray(x), jnp.asarray(t), smoothing=0.1))
    # timm BinaryCrossEntropy: dense smoothed targets + BCEWithLogits mean
    off = 0.1 / 13
    on = 1.0 - 0.1 + off
    dense = torch.full((8, 13), off)
    dense[torch.arange(8), torch.from_numpy(t)] = on
    ref = F.binary_cross_entropy_with_logits(torch.from_numpy(x), dense).item()
    assert abs(mine - ref) < 1e-5


def test_bce_target_thresh():
    x = _rand_logits()
    soft = np.random.default_rng(2).random((8, 13)).astype(np.float32)
    mine = float(L.binary_cross_entropy(jnp.asarray(x), jnp.asarray(soft),
                                        target_threshold=0.2))
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(x), (torch.from_numpy(soft) > 0.2).float()).item()
    assert abs(mine - ref) < 1e-5


def test_soft_target_ce_matches_torch():
    x = _rand_logits()
    soft = np.random.default_rng(3).random((8, 13)).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)
    mine = float(L.soft_target_cross_entropy(jnp.asarray(x), jnp.asarray(soft)))
    ref = torch.sum(-torch.from_numpy(soft) * F.log_softmax(torch.from_numpy(x), -1),
                    -1).mean().item()
    assert abs(mine - ref) < 1e-5


def test_label_smoothing_ce_matches_torch():
    x = _rand_logits()
    t = np.random.default_rng(4).integers(0, 13, (8,))
    mine = float(L.cross_entropy(jnp.asarray(x), jnp.asarray(t), smoothing=0.1))
    ref = F.cross_entropy(torch.from_numpy(x), torch.from_numpy(t),
                          label_smoothing=0.1).item()
    assert abs(mine - ref) < 1e-5


def _torch_map_loss(outputs, target, dec_lam):
    """Verbatim math of MAP/train.py multi_group_loss (:792-839), CE base."""
    loss = 0
    y_hat_aggre = 0
    for output in outputs:
        if isinstance(output, (tuple, list)):
            y_hat, y_mean_hat = output
            y_hat_aggre = y_hat_aggre + y_hat
            adv = F.kl_div(F.log_softmax(y_mean_hat, dim=1),
                           F.log_softmax(y_hat, dim=1).detach(),
                           reduction="sum", log_target=True) / y_hat.numel()
            loss = loss + F.cross_entropy(y_hat, target) + adv
        else:
            y_hat_aggre = y_hat_aggre + output
            loss = loss + F.cross_entropy(output, target)
    if len(outputs) > 1:
        for output in outputs:
            y_hat = output[0] if isinstance(output, (tuple, list)) else output
            loss = loss + F.kl_div(F.log_softmax(y_hat, dim=1),
                                   F.log_softmax(y_hat_aggre.detach() / len(outputs), dim=1),
                                   reduction="mean", log_target=True) * dec_lam
    return loss


def _torch_map_loss_distill(outputs, target, dec_lam):
    """Verbatim KL math of the distill_tokens>0 branch (MAP/train.py:797-806,
    825-837). The reference's cls term on that branch is not executable (see
    losses.multi_head_loss docstring); ours is the mean of the two branch
    losses, reproduced here."""
    loss = 0
    y_hat_aggre = 0
    for y_hat, y_distill, y_mean_hat in outputs:
        y_hat_aggre = y_hat_aggre + y_hat
        adv1 = F.kl_div(F.log_softmax(y_mean_hat, dim=1),
                        F.log_softmax(y_hat, dim=1).detach(),
                        reduction="sum", log_target=True) / y_hat.numel()
        adv2 = F.kl_div(F.log_softmax(y_mean_hat, dim=1),
                        F.log_softmax(y_distill, dim=1).detach(),
                        reduction="sum", log_target=True) / y_distill.numel()
        cls = 0.5 * (F.cross_entropy(y_hat, target) + F.cross_entropy(y_distill, target))
        loss = loss + cls + adv1 + adv2
    if len(outputs) > 1:
        for y_hat, _, _ in outputs:
            loss = loss + F.kl_div(F.log_softmax(y_hat, dim=1),
                                   F.log_softmax(y_hat_aggre.detach() / len(outputs), dim=1),
                                   reduction="mean", log_target=True) * dec_lam
    return loss


def test_multi_head_loss_distill_tokens_matches_reference():
    rng = np.random.default_rng(11)
    t = rng.integers(0, 13, (8,))
    heads = [tuple(rng.standard_normal((8, 13)).astype(np.float32) for _ in range(3))
             for _ in range(3)]

    base = lambda x, y: L.cross_entropy(x, y, smoothing=0.0)
    jheads = tuple(tuple(jnp.asarray(a) for a in h) for h in heads)
    mine = float(L.multi_head_loss(jheads, jnp.asarray(t), base, dec_lam=-0.8))

    theads = [tuple(torch.from_numpy(a) for a in h) for h in heads]
    ref = _torch_map_loss_distill(theads, torch.from_numpy(t), -0.8).item()
    assert abs(mine - ref) < 2e-4, (mine, ref)

    # token_distillation=0: only y_hat trains, plain branch semantics
    # (MAP/train.py:807-809)
    mine0 = float(L.multi_head_loss(jheads, jnp.asarray(t), base, dec_lam=-0.8,
                                    token_distillation=False))
    ref0 = _torch_map_loss([h[0] for h in theads], torch.from_numpy(t), -0.8).item()
    assert abs(mine0 - ref0) < 2e-4, (mine0, ref0)


@pytest.mark.parametrize("pairs", [False, True])
def test_multi_head_loss_matches_reference(pairs):
    rng = np.random.default_rng(7)
    t = rng.integers(0, 13, (8,))
    heads = []
    for g in range(3):
        org = rng.standard_normal((8, 13)).astype(np.float32)
        if pairs:
            avg = rng.standard_normal((8, 13)).astype(np.float32)
            heads.append((org, avg))
        else:
            heads.append(org)

    base = lambda x, y: L.cross_entropy(x, y, smoothing=0.0)
    jheads = tuple((jnp.asarray(h[0]), jnp.asarray(h[1])) if pairs else jnp.asarray(h)
                   for h in heads)
    mine = float(L.multi_head_loss(jheads, jnp.asarray(t), base, dec_lam=-0.8))

    theads = [(torch.from_numpy(h[0]), torch.from_numpy(h[1])) if pairs
              else torch.from_numpy(h) for h in heads]
    ref = _torch_map_loss(theads, torch.from_numpy(t), -0.8).item()
    assert abs(mine - ref) < 2e-4, (mine, ref)
