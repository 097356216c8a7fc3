"""ConvNeXt family: parameter-count acceptance (golden values from
MAP/README.MD §2 validate logs), output structure, and backbone numerical
parity against a minimal hand-built torch twin (timm is unavailable here, so
the torch side of the backbone is reconstructed inline with the reference's
exact op sequence, map_convnext.py:14-40,58-137)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagenet_models_tpu import create_model
from imagenet_models_tpu.ckpt import RuleTranslator, convert_torch_state_dict
from imagenet_models_tpu.models.convnext import CONVNEXT_RULES


def n_params(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def _init(model, hw=224, training=False):
    x = jnp.zeros((1, hw, hw, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x, training=training)


@pytest.mark.parametrize("name,expected_m", [
    ("convnext_tiny", 28.59),
    ("map_convnext_tiny", 47.83),
    ("map_convnext_small", 82.84),
])
def test_param_counts(name, expected_m):
    model = create_model(name)
    variables = _init(model)
    count_m = n_params(variables) / 1e6
    assert abs(count_m - expected_m) < 0.02, f"{name}: {count_m:.3f}M vs {expected_m}M"


def test_map_convnext_tiny_outputs():
    model = create_model("map_convnext_tiny", num_classes=10)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    out = model.apply(variables, x, training=False)
    assert isinstance(out, tuple) and len(out) == 4
    assert all(o.shape == (2, 10) for o in out)
    out, _ = model.apply(variables, x, training=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    assert len(out) == 4 and all(len(pair) == 2 for pair in out)


def test_backbone_parity_vs_torch(parity_tol):
    """Tiny ConvNeXt (avg head) vs a hand-built torch twin of the reference ops."""
    torch = pytest.importorskip("torch")
    from torch import nn as tnn

    depths, dims = (1, 1, 2, 1), (8, 16, 24, 32)

    class TBlock(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dwconv = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
            self.norm = tnn.LayerNorm(dim, eps=1e-6)
            self.pwconv1 = tnn.Linear(dim, 4 * dim)
            self.pwconv2 = tnn.Linear(4 * dim, dim)
            self.gamma = tnn.Parameter(1e-6 * torch.ones(dim))

        def forward(self, x):
            inp = x
            x = self.dwconv(x).permute(0, 2, 3, 1)
            x = self.norm(x)
            x = self.pwconv2(tnn.functional.gelu(self.pwconv1(x)))
            x = (self.gamma * x).permute(0, 3, 1, 2)
            return inp + x

    class TLN2d(tnn.Module):  # channels_first LayerNorm (map_convnext.py:166-170)
        def __init__(self, c):
            super().__init__()
            self.weight = tnn.Parameter(torch.ones(c))
            self.bias = tnn.Parameter(torch.zeros(c))

        def forward(self, x):
            u = x.mean(1, keepdim=True)
            s = (x - u).pow(2).mean(1, keepdim=True)
            x = (x - u) / torch.sqrt(s + 1e-6)
            return self.weight[:, None, None] * x + self.bias[:, None, None]

    class TNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.downsample_layers = tnn.ModuleList()
            self.downsample_layers.append(tnn.Sequential(tnn.Conv2d(3, dims[0], 4, 4), TLN2d(dims[0])))
            for i in range(3):
                self.downsample_layers.append(
                    tnn.Sequential(TLN2d(dims[i]), tnn.Conv2d(dims[i], dims[i + 1], 2, 2)))
            self.stages = tnn.ModuleList([
                tnn.Sequential(*[TBlock(dims[i]) for _ in range(depths[i])]) for i in range(4)])
            self.norm = tnn.LayerNorm(dims[-1], eps=1e-6)
            self.head = tnn.Linear(dims[-1], 5)

        def forward(self, x):
            for i in range(4):
                x = self.downsample_layers[i](x)
                x = self.stages[i](x)
            return self.head(self.norm(x.mean([-2, -1])))

    tnet = TNet().eval()
    gen = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in tnet.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)

    from imagenet_models_tpu.models.convnext import ConvNeXt
    jnet = ConvNeXt(depths=depths, dims=dims, num_classes=5, global_pool="avg")
    a = np.random.default_rng(4).standard_normal((2, 3, 32, 32)).astype(np.float32)
    variables = jnet.init(jax.random.PRNGKey(0), jnp.asarray(a.transpose(0, 2, 3, 1)))
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = convert_torch_state_dict(sd, variables, RuleTranslator(CONVNEXT_RULES), strict=True)

    with torch.no_grad():
        t = tnet(torch.from_numpy(a)).numpy()
    j = np.asarray(jnet.apply(variables, jnp.asarray(a.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(j, t, **parity_tol)
