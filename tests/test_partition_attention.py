"""Parity tests for the partition-free packed window attention kernel
(ops/partition_attention.py) against its plain-XLA twin — the Pallas paths
run in interpreter mode so this works off-TPU.

Geometry matrix mirrors map_maxvit_tiny_tf_224's stages (7x7 partitions on
56/28/14 grids scaled down): heads 2..4, window packing 1 and 2 (incl. the
interleaved-order permuted bias)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagenet_models_tpu.ops.partition_attention import (
    _bwd_pallas,
    _fwd_pallas,
    _pack_factor,
    plain_partition_attention,
)

CASES = [
    # (b, h, w, c, nh, part_type)
    (2, 14, 14, 64, 2, "block"),
    (2, 14, 14, 64, 2, "grid"),
    (1, 28, 28, 128, 4, "block"),
    (1, 28, 28, 128, 4, "grid"),
    (2, 14, 21, 96, 3, "block"),   # odd window count -> pack falls to 1
    (2, 14, 21, 96, 3, "grid"),
    (3, 21, 14, 64, 2, "block"),   # odd batch, 3 strips
]
PS = (7, 7)


def _mk(b, h, w, c, nh, dtype, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    qkv = jax.random.normal(k1, (b, h, w, 3 * c), dtype)
    t = PS[0] * PS[1]
    bias = 0.1 * jax.random.normal(k2, (nh, t, t), jnp.float32)
    return qkv, bias


@pytest.mark.parametrize("b,h,w,c,nh,part", CASES)
def test_fwd_parity(b, h, w, c, nh, part):
    qkv, bias = _mk(b, h, w, c, nh, jnp.float32)
    pack = _pack_factor(PS, h, w)
    ref = plain_partition_attention(qkv, bias, part_type=part, ps=PS,
                                    nh=nh, pack=pack)
    out = _fwd_pallas(qkv, bias, part_type=part, ps=PS, nh=nh, pack=pack,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,h,w,c,nh,part", CASES[:4])
def test_bwd_parity(b, h, w, c, nh, part):
    qkv, bias = _mk(b, h, w, c, nh, jnp.float32, seed=3)
    pack = _pack_factor(PS, h, w)
    g = jax.random.normal(jax.random.PRNGKey(9), (b, h, w, c), jnp.float32)
    _, vjp = jax.vjp(
        lambda a, bb: plain_partition_attention(a, bb, part_type=part,
                                                ps=PS, nh=nh, pack=pack),
        qkv, bias)
    dq_ref, db_ref = vjp(g)
    dq, db = _bwd_pallas(qkv, bias, g, part_type=part, ps=PS, nh=nh,
                         pack=pack, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref),
                               rtol=2e-5, atol=2e-5)


def test_pack_unpacked_equivalence():
    """Packing windows under the block-diagonal -1e30 bias must not change
    the result vs pack=1."""
    qkv, bias = _mk(2, 14, 14, 64, 2, jnp.float32, seed=5)
    r1 = plain_partition_attention(qkv, bias, part_type="block", ps=PS,
                                   nh=2, pack=1)
    r2 = plain_partition_attention(qkv, bias, part_type="block", ps=PS,
                                   nh=2, pack=2)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=1e-5, atol=1e-5)


def test_plain_matches_attentioncl_composition():
    """The fused formulation (qkv projection on the UNPARTITIONED tensor) is
    the same math as the reference composition: partition -> qkv -> attention
    -> reverse (map_maxvit.py:658-719). Verified through the public
    partition_attention entry on CPU."""
    from imagenet_models_tpu.ops.partition_attention import partition_attention
    from imagenet_models_tpu.ops.window_attention import (
        window_partition,
        window_reverse,
    )

    b, h, w, c, nh = 2, 14, 14, 64, 2
    d = c // nh
    qkv, bias = _mk(b, h, w, c, nh, jnp.float32, seed=7)
    scale = jnp.concatenate([jnp.full((c,), d ** -0.5, jnp.float32),
                             jnp.ones((2 * c,), jnp.float32)])
    out = partition_attention(qkv * scale, bias, part_type="block", ps=PS,
                              num_heads=nh)

    part = window_partition(qkv, PS).reshape(-1, PS[0] * PS[1], 3 * c)
    q = part[..., :c].reshape(part.shape[0], -1, nh, d) * (d ** -0.5)
    k = part[..., c:2 * c].reshape(part.shape[0], -1, nh, d)
    v = part[..., 2 * c:].reshape(part.shape[0], -1, nh, d)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32) + bias[None]
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(-1, PS[0], PS[1], c)
    ref = window_reverse(o, PS, (h, w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
