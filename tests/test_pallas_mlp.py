"""Fused MLP half-block kernel vs the XLA reference expression."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ad_tpu.ops.pallas.mlp import (
    _xla_mlp,
    mlp_block,
    mlp_block_pallas,
    use_pallas_mlp,
)


def _params(rng, d, h):
    return (
        jnp.asarray(rng.uniform(0.5, 1.5, size=(d,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(d, h)).astype(np.float32) * 0.05),
        jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(h, d)).astype(np.float32) * 0.05),
        jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1),
    )


@pytest.mark.parametrize("b,n,d,h", [(2, 12, 16, 64), (1, 5, 8, 32)])
def test_kernel_matches_xla(rng, b, n, d, h):
    ns, nb, w1, b1, w2, b2 = _params(rng, d, h)
    x = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    want = _xla_mlp(x, ns, nb, w1, b1, w2, b2)
    got = mlp_block_pallas(x, ns, nb, w1, b1, w2, b2, row_tile=16,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_row_padding(rng):
    """rows not a multiple of the tile pad+trim correctly."""
    d, h = 8, 16
    ns, nb, w1, b1, w2, b2 = _params(rng, d, h)
    x = jnp.asarray(rng.normal(size=(1, 3, d)).astype(np.float32))
    want = _xla_mlp(x, ns, nb, w1, b1, w2, b2)
    got = mlp_block_pallas(x, ns, nb, w1, b1, w2, b2, row_tile=16,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_flow(rng):
    """custom VJP recomputes through XLA: grads exist and match pure XLA."""
    d, h = 8, 16
    ns, nb, w1, b1, w2, b2 = _params(rng, d, h)
    x = jnp.asarray(rng.normal(size=(2, 4, d)).astype(np.float32))

    g_kernel = jax.grad(lambda *a: mlp_block(*a).sum(), argnums=(0, 3))(
        x, ns, nb, w1, b1, w2, b2
    )
    g_xla = jax.grad(lambda *a: _xla_mlp(*a).sum(), argnums=(0, 3))(
        x, ns, nb, w1, b1, w2, b2
    )
    for a, b_ in zip(g_kernel, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


def test_use_pallas_mlp_gating(monkeypatch):
    monkeypatch.delenv("VITAD_PALLAS_MLP", raising=False)
    assert use_pallas_mlp(768, 3072) is False  # opt-in: off by default
    monkeypatch.setenv("VITAD_PALLAS_MLP", "1")
    # CPU backend in tests: platform gate still rejects
    assert use_pallas_mlp(768, 3072) is False
    monkeypatch.setenv("VITAD_PALLAS_MLP", "0")
    assert use_pallas_mlp(768, 3072) is False
