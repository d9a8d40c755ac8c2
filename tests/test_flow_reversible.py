"""Reversible (O(1)-activation) coupling-pair backward vs stock autodiff.

The primal must be bit-identical (same ops, same order); gradients may
differ only by the f32 roundoff of inverse reconstruction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.flow import NormalizingFlow


def _flow(steps=6, c=12, side=4):
    return NormalizingFlow(
        num_channels=c,
        img_size=32,
        num_patches=side * side,
        hidden_ratio=1.0,
        flow_steps=steps,
        dtypes=DtypePolicy(compute_dtype=jnp.float32),
    )


def _setup(rng, steps=6, c=12, side=4):
    flow = _flow(steps, c, side)
    x = jnp.asarray(rng.normal(size=(3, side, side, c)).astype(np.float32))
    variables = flow.init(jax.random.PRNGKey(0), x)
    return flow, variables, x


def _loss(flow, variables, x):
    out = flow.apply(variables, x)
    return out.loss


@pytest.mark.parametrize("steps", [6, 7])  # 7 exercises the unscanned tail
def test_forward_bit_identical(rng, monkeypatch, steps):
    flow, variables, x = _setup(rng, steps=steps)
    monkeypatch.delenv("VITAD_NF_REVERSIBLE", raising=False)
    z_stock, ld_stock = flow.apply(variables, x, method=flow.transform)
    monkeypatch.setenv("VITAD_NF_REVERSIBLE", "1")
    z_rev, ld_rev = flow.apply(variables, x, method=flow.transform)
    np.testing.assert_array_equal(np.asarray(z_stock), np.asarray(z_rev))
    np.testing.assert_array_equal(np.asarray(ld_stock), np.asarray(ld_rev))


def test_gradients_match_autodiff(rng, monkeypatch):
    flow, variables, x = _setup(rng)

    monkeypatch.delenv("VITAD_NF_REVERSIBLE", raising=False)
    g_stock = jax.grad(lambda v, xx: _loss(flow, v, xx), argnums=(0, 1))(
        variables, x
    )
    monkeypatch.setenv("VITAD_NF_REVERSIBLE", "1")
    g_rev = jax.grad(lambda v, xx: _loss(flow, v, xx), argnums=(0, 1))(
        variables, x
    )

    flat_s, _ = jax.tree_util.tree_flatten(g_stock)
    flat_r, _ = jax.tree_util.tree_flatten(g_rev)
    assert len(flat_s) == len(flat_r)
    for gs, gr in zip(flat_s, flat_r):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), rtol=2e-4, atol=2e-6
        )


def test_gradients_match_under_jit_scan_epoch_shape(rng, monkeypatch):
    """Same check jitted (the production trainers always jit), with a
    bigger map so the reconstruction runs through several pairs."""
    flow, variables, x = _setup(rng, steps=8, c=16, side=7)

    def grads(v, xx):
        return jax.grad(lambda vv: _loss(flow, vv, xx))(v)

    monkeypatch.delenv("VITAD_NF_REVERSIBLE", raising=False)
    g_stock = jax.jit(grads)(variables, x)
    monkeypatch.setenv("VITAD_NF_REVERSIBLE", "1")
    g_rev = jax.jit(grads)(variables, x)
    for gs, gr in zip(
        jax.tree_util.tree_leaves(g_stock), jax.tree_util.tree_leaves(g_rev)
    ):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), rtol=2e-4, atol=2e-6
        )


def test_scoring_path_unaffected(rng, monkeypatch):
    """Anomaly maps/loss (no grad) are identical with the flag on."""
    flow, variables, x = _setup(rng)
    monkeypatch.delenv("VITAD_NF_REVERSIBLE", raising=False)
    out_stock = flow.apply(variables, x)
    monkeypatch.setenv("VITAD_NF_REVERSIBLE", "1")
    out_rev = flow.apply(variables, x)
    np.testing.assert_array_equal(
        np.asarray(out_stock.anomaly_score_map), np.asarray(out_rev.anomaly_score_map)
    )
    np.testing.assert_array_equal(
        np.asarray(out_stock.loss), np.asarray(out_rev.loss)
    )
