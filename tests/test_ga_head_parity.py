"""GA head parity vs torch: the CaiT-style class-attention block with layer
scale + GroupConvMlp (ga_convnext.py:153-248) and the gram-triu-normalize
pipeline (ga_convnext.py:452-467), through the checkpoint converter."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagenet_models_tpu.ckpt import RuleTranslator, convert_torch_state_dict  # noqa: E402
from imagenet_models_tpu.nn.ga_head import LayerScaleBlockClassAttn  # noqa: E402
from imagenet_models_tpu.nn.heads import gram_triu_normalize  # noqa: E402


def torch_channel_shuffle(x, group):
    b, c, h, w = x.shape
    x = x.reshape(b, c // group, group, h, w).permute(0, 2, 1, 3, 4)
    return x.reshape(b, c, h, w)


class TClassAttn(tnn.Module):
    """verbatim math of ga_convnext.py:153-187"""

    def __init__(self, dim, num_heads=8, dim_embed=128):
        super().__init__()
        self.num_heads, self.dim_embed = num_heads, dim_embed
        self.scale = (dim_embed // num_heads) ** -0.5
        self.q = tnn.Linear(dim, dim_embed, bias=False)
        self.k = tnn.Linear(dim, dim_embed, bias=False)
        self.v = tnn.Linear(dim, dim_embed, bias=False)
        self.proj = tnn.Linear(dim_embed, dim)

    def forward(self, x):
        B, N, _ = x.shape
        C, h = self.dim_embed, self.num_heads
        q = self.q(x[:, 0]).unsqueeze(1).reshape(B, 1, h, C // h).permute(0, 2, 1, 3)
        k = self.k(x).reshape(B, N, h, C // h).permute(0, 2, 1, 3)
        q = q * self.scale
        v = self.v(x).reshape(B, N, h, C // h).permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        x_cls = (attn @ v).transpose(1, 2).reshape(B, 1, C)
        return self.proj(x_cls)


class TGroupConvMlp(tnn.Module):
    """ga_convnext.py:190-222 (GELU act as used by LayerScaleBlockClassAttn)"""

    def __init__(self, dim, hidden, groups):
        super().__init__()
        self.groups = groups
        self.fc1 = tnn.Conv2d(dim, hidden, 1, bias=True, groups=groups)
        self.act = tnn.GELU()
        self.fc2 = tnn.Conv2d(hidden, dim, 1, bias=True, groups=groups)

    def forward(self, x):
        x = x.permute(0, 2, 1).unsqueeze(-1)
        x = self.act(self.fc1(x))
        x = torch_channel_shuffle(x, self.groups)
        x = self.fc2(x).squeeze(-1).permute(0, 2, 1)
        return x


class TBlock(tnn.Module):
    """ga_convnext.py:225-248"""

    def __init__(self, dim, heads, dim_embed, mlp_groups):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TClassAttn(dim, heads, dim_embed)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = TGroupConvMlp(dim, 4 * dim, mlp_groups)
        self.gamma_1 = tnn.Parameter(1e-4 * torch.ones(dim))
        self.gamma_2 = tnn.Parameter(1e-4 * torch.ones(dim))

    def forward(self, x, x_cls):
        u = torch.cat((x_cls, x), dim=1)
        x_cls = x_cls + self.gamma_1 * self.attn(self.norm1(u))
        x_cls = x_cls + self.gamma_2 * self.mlp(self.norm2(x_cls))
        return x_cls


def test_layer_scale_class_attn_parity(parity_tol):
    dim, heads, dim_embed, groups = 64, 8, 32, 4
    tb = TBlock(dim, heads, dim_embed, groups).eval()
    gen = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for p in tb.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)

    jb = LayerScaleBlockClassAttn(dim, num_heads=heads, mlp_block_groups=groups,
                                  dim_embed=dim_embed)
    rng = np.random.default_rng(6)
    img = rng.standard_normal((2, 49, dim)).astype(np.float32)
    cls = rng.standard_normal((2, 1, dim)).astype(np.float32)
    variables = jb.init(jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(cls))
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    variables = convert_torch_state_dict(sd, variables, RuleTranslator([]), strict=True)

    with torch.no_grad():
        ref = tb(torch.from_numpy(img), torch.from_numpy(cls)).numpy()
    out = np.asarray(jb.apply(variables, jnp.asarray(img), jnp.asarray(cls)))
    np.testing.assert_allclose(out, ref, **parity_tol)


def test_gram_triu_normalize_matches_reference():
    """get_gram (ga_convnext.py:452-467) in fp64 vs our fp32-HIGHEST path."""
    rng = np.random.default_rng(8)
    B, C, H, W = 2, 48, 14, 14
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)

    # torch reference (fp64 branch, training & B<128)
    xb = torch.from_numpy(x) / H
    xb = xb.to(torch.float64).reshape(B, C, H * W)
    g = torch.bmm(xb, xb.transpose(1, 2)) / (H * W)
    g = g.reshape(B, C * C)
    idx = [i * C + j for i in range(C) for j in range(C) if j >= i]
    g = g[:, idx]
    ref = torch.nn.functional.normalize(g).float().numpy()

    tokens = jnp.asarray(x.transpose(0, 2, 3, 1).reshape(B, H * W, C))
    out = np.asarray(gram_triu_normalize(tokens, scale=1.0 / H))
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-5)


def test_gram_bf16_fast_path_matches_highest():
    """The single-pass bf16 gram (production dtype) must equal the fp32
    HIGHEST 6-pass path on the same bf16-valued inputs: bf16*bf16 products
    are exact in fp32, so only accumulation-order noise remains."""
    rng = np.random.default_rng(9)
    B, N, C = 2, 49, 96
    xb = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
    fast = np.asarray(gram_triu_normalize(xb, scale=1.0 / 7))
    slow = np.asarray(gram_triu_normalize(xb.astype(jnp.float32), scale=1.0 / 7))
    np.testing.assert_allclose(fast, slow, rtol=2e-6, atol=2e-6)
