"""Parity tests for the fused ConvNeXt LN+MLP Pallas kernel (forward and
custom backward) against the plain-ops composition, in TPU-interpret mode so
they run on any host. The plain path itself is parity-tested against torch in
tests/test_models_convnext.py; these tests pin kernel == plain.

Everything is pinned to a CPU device: interpret-mode pallas_call lowers to
plain JAX ops, and running those over the tunneled TPU hangs (the interpreter
round-trips per op). CPU + highest matmul precision is exact enough here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from imagenet_models_tpu.ops import convnext_block as cb

_CPU = jax.devices("cpu")[0]


@pytest.fixture(autouse=True)
def _on_cpu():
    with jax.default_device(_CPU):
        yield


def _args(c: int, n_tokens: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    hid = 4 * c
    side = int(np.sqrt(n_tokens // 2))
    h = jnp.asarray(rng.standard_normal((2, side, side, c)), jnp.float32)
    return (
        h,
        jnp.asarray(rng.standard_normal(c), jnp.float32),
        jnp.asarray(rng.standard_normal(c), jnp.float32),
        jnp.asarray(rng.standard_normal((c, hid)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(hid) * 0.01, jnp.float32),
        jnp.asarray(rng.standard_normal((hid, c)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32),
        jnp.asarray(rng.standard_normal(c), jnp.float32),
    )


@pytest.mark.parametrize("c", [96, 128])
def test_fused_forward_matches_plain(c):
    args = _args(c, 128)
    with jax.default_matmul_precision("highest"):
        ref = cb.plain_ln_mlp(*args)
        with pltpu.force_tpu_interpret_mode():
            got = cb._fused_ln_mlp_pallas(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n_tokens", [128, 512])
def test_fused_backward_matches_plain_vjp(n_tokens, monkeypatch):
    # small tile forces multi-step grid accumulation on the 512-token case
    monkeypatch.setenv("IMTPU_LNMLP_BWD_TILE", "256")
    c = 96
    args = _args(c, n_tokens, seed=1)
    g = jnp.asarray(np.random.default_rng(2).standard_normal(args[0].shape),
                    jnp.float32)
    with jax.default_matmul_precision("highest"):
        _, vjp = jax.vjp(lambda *a: cb.plain_ln_mlp(*a, eps=1e-6), *args)
        ref = vjp(g)
        with pltpu.force_tpu_interpret_mode():
            got = cb._fused_ln_mlp_bwd_pallas(*args, g, eps=1e-6)
    names = ["dx", "dln_s", "dln_b", "dw1", "db1", "dw2", "db2", "dgamma"]
    for nm, r, o in zip(names, ref, got):
        r, o = np.asarray(r), np.asarray(o)
        assert o.shape == r.shape, nm
        np.testing.assert_allclose(o, r, rtol=3e-5, atol=3e-5, err_msg=nm)


def test_custom_vjp_wires_fused_backward(monkeypatch):
    """jax.grad through fused_ln_mlp (interpret mode) == grad of plain ops."""
    args = _args(96, 128, seed=3)

    def loss_fused(*a):
        return jnp.sum(cb.fused_ln_mlp(*a) ** 2)

    def loss_plain(*a):
        return jnp.sum(cb.plain_ln_mlp(*a) ** 2)

    with jax.default_matmul_precision("highest"):
        ref = jax.grad(loss_plain, argnums=tuple(range(8)))(*args)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=5e-5, atol=5e-5)


def test_fast_gelu_accuracy_and_dispatch():
    """The TRAINING-default fast GELU (single-segment minimax, no
    exp/divide/selects; measured 1266 vs 1215 img/s on the full train step):
    (a) accuracy sits far below bf16 output quantization, (b) the mode
    dispatch keeps eval on exact-erf (checkpoint-interchange contract), and
    (c) fast-impl kernel == fast-impl plain composition (shared impl, so the
    kernel parity guarantee is impl-independent)."""
    x = jnp.asarray(np.linspace(-30.0, 30.0, 400001), jnp.float32)
    xs = np.asarray(x, np.float64)
    erf_err = np.max(np.abs(np.asarray(cb._erf_fast(x), np.float64)
                            - np.vectorize(__import__("math").erf)(xs)))
    assert erf_err < 2e-4, erf_err
    sqrt2 = np.sqrt(2.0)
    phi = np.exp(-0.5 * xs * xs) / np.sqrt(2 * np.pi)
    gg_exact = 0.5 * (1.0 + np.vectorize(__import__("math").erf)(xs / sqrt2)) + xs * phi
    gg_err = np.max(np.abs(np.asarray(cb._gelu_grad_fast(x), np.float64) - gg_exact))
    assert gg_err < 5e-4, gg_err

    # dispatch policy: training -> fast, eval -> exact; IMTPU_GELU overrides
    if not cb._GELU_ENV:
        assert cb.resolve_gelu_impl(True) == "fast"
        assert cb.resolve_gelu_impl(False) == "exact"

    # kernel (interpret) == plain with the SAME fast impl
    args = _args(c=64, n_tokens=32)
    with jax.default_matmul_precision("highest"):
        ref = cb.plain_ln_mlp(*args, gelu_impl="fast")
        with pltpu.force_tpu_interpret_mode():
            got = cb._fused_ln_mlp_pallas(*args, gelu_impl="fast")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_xla_mlp_gelu_mode_resolution():
    """Transformer-family MLPs (nn/layers Mlp/GroupConvMlp) swap exact-erf
    GELU for the fast fit in training only (measured +13% on the
    ga_cswin_tiny train step); eval keeps exact erf bit-for-bit, and an
    explicitly different activation is never touched."""
    from imagenet_models_tpu.nn import layers as L

    if L._XLA_GELU_ENV:
        pytest.skip("IMTPU_XLA_GELU forces one impl for both modes")
    assert L.resolve_act(L.gelu, deterministic=True) is L.gelu
    assert L.resolve_act(L.gelu, deterministic=False) is L.gelu_fast
    assert L.resolve_act(jax.nn.relu, deterministic=False) is jax.nn.relu

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 7, 24)),
                    jnp.float32)
    mlp = L.Mlp(hidden_features=48)
    v = mlp.init(jax.random.PRNGKey(0), x)
    ev = mlp.apply(v, x, deterministic=True)
    tr = mlp.apply(v, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    # same math to ~fit accuracy; not identical (different erf impls)
    np.testing.assert_allclose(np.asarray(tr), np.asarray(ev),
                               rtol=5e-3, atol=5e-3)
    # fast fit == exact gelu to its fitted accuracy on raw values
    g = np.asarray(L.gelu_fast(x))
    np.testing.assert_allclose(g, np.asarray(L.gelu(x)), atol=6e-4)


def test_noexp_gelu_polynomials_match_exact():
    """The exp/divide-free in-kernel GELU polys (opt-in IMTPU_GELU=poly;
    measured slower than exact on the full step, kept as a probe) stay well
    inside the kernel parity tolerances against exact erf."""
    x = jnp.asarray(np.linspace(-30.0, 30.0, 400001), jnp.float32)
    erf_err = jnp.max(jnp.abs(cb._erf_poly_noexp(x) - jax.scipy.special.erf(x)))
    assert float(erf_err) < 2e-6, float(erf_err)

    sqrt2 = np.sqrt(2.0)
    xs = np.asarray(x, np.float64)
    gelu_exact = 0.5 * xs * (1.0 + np.vectorize(__import__("math").erf)(xs / sqrt2))
    gelu_poly = 0.5 * x * (1.0 + cb._erf_poly_noexp(x * (2 ** -0.5)))
    gelu_err = np.max(np.abs(np.asarray(gelu_poly, np.float64) - gelu_exact))
    # absolute error grows as 0.5*|x|*erf_err; bound at |x|<=30
    assert gelu_err < 3e-5, gelu_err

    phi = np.exp(-0.5 * xs * xs) / np.sqrt(2 * np.pi)
    gg_exact = 0.5 * (1.0 + np.vectorize(__import__("math").erf)(xs / sqrt2)) + xs * phi
    gg_err = np.max(np.abs(np.asarray(cb._gelu_grad_noexp(x), np.float64) - gg_exact))
    assert gg_err < 2e-6, gg_err
