"""Reference-semantics torch optimizers for trajectory twinning.

`RefLamb` is a fresh implementation of the LAMB variant the reference trains
with — timm 0.9.2's `Lamb` (the pin at /root/reference/MAP/README.MD:15,
instantiated via create_optimizer_v2 at GA/train.py:466) — written from the
published algorithm semantics:

  1. every gradient is pre-divided by max(1, global_grad_norm/max_grad_norm)
     (max_grad_norm defaults to 1.0 — an implicit global-norm clip);
  2. bias-corrected Adam moments with eps (default 1e-6) added OUTSIDE the
     bias-corrected sqrt: denom = sqrt(v)/sqrt(1-beta2^t) + eps;
  3. the layer-wise trust ratio ||p||/||update|| is applied only to params in
     groups with weight_decay != 0 (unless always_adapt); no-decay groups get
     the plain Adam update;
  4. p <- p - lr * update.

`ref_param_groups` reproduces timm's param_groups_weight_decay split: 1-D
params / *.bias / model.no_weight_decay() names go into a weight_decay=0
group (timm optim_factory; consulted by create_optimizer_v2).
"""

import math

import torch


class RefLamb(torch.optim.Optimizer):
    def __init__(self, params, lr=1e-3, betas=(0.9, 0.999), eps=1e-6,
                 weight_decay=0.01, max_grad_norm=1.0, trust_clip=False,
                 always_adapt=False):
        defaults = dict(lr=lr, betas=betas, eps=eps, weight_decay=weight_decay,
                        max_grad_norm=max_grad_norm, trust_clip=trust_clip,
                        always_adapt=always_adapt)
        super().__init__(params, defaults)

    @torch.no_grad()
    def step(self, closure=None):
        if closure is not None:
            with torch.enable_grad():
                closure()
        sq = torch.zeros((), dtype=torch.float32)
        for group in self.param_groups:
            for p in group["params"]:
                if p.grad is not None:
                    sq = sq + p.grad.float().pow(2).sum()
        gnorm = torch.sqrt(sq)
        clip = torch.clamp(gnorm / self.defaults["max_grad_norm"], min=1.0)
        for group in self.param_groups:
            beta1, beta2 = group["betas"]
            group["step"] = group.get("step", 0) + 1
            bc1 = 1.0 - beta1 ** group["step"]
            bc2 = 1.0 - beta2 ** group["step"]
            for p in group["params"]:
                if p.grad is None:
                    continue
                grad = p.grad / clip
                st = self.state[p]
                if not st:
                    st["m"] = torch.zeros_like(p)
                    st["v"] = torch.zeros_like(p)
                st["m"].mul_(beta1).add_(grad, alpha=1.0 - beta1)
                st["v"].mul_(beta2).addcmul_(grad, grad, value=1.0 - beta2)
                update = (st["m"] / bc1) / (st["v"].sqrt() / math.sqrt(bc2)
                                            + group["eps"])
                wd = group["weight_decay"]
                if wd != 0:
                    update = update + wd * p
                if wd != 0 or group["always_adapt"]:
                    w_norm = p.norm(2.0)
                    g_norm = update.norm(2.0)
                    one = torch.ones_like(w_norm)
                    trust = torch.where(
                        w_norm > 0,
                        torch.where(g_norm > 0, w_norm / g_norm, one), one)
                    if group["trust_clip"]:
                        trust = torch.clamp(trust, max=1.0)
                    update = update * trust
                p.add_(update, alpha=-group["lr"])


def ref_param_groups(model, weight_decay, extra_no_decay=()):
    """timm param_groups_weight_decay: no decay for ndim<=1 / .bias /
    model.no_weight_decay() names."""
    skip = set(extra_no_decay)
    if hasattr(model, "no_weight_decay"):
        skip |= set(model.no_weight_decay())
    decay, no_decay = [], []
    for name, p in model.named_parameters():
        if not p.requires_grad:
            continue
        if p.ndim <= 1 or name.endswith(".bias") or name in skip:
            no_decay.append(p)
        else:
            decay.append(p)
    return [
        {"params": no_decay, "weight_decay": 0.0},
        {"params": decay, "weight_decay": weight_decay},
    ]
