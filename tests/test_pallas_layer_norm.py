"""Fused LayerNorm kernel vs the XLA reference expression, plus the
models/layers.LayerNorm routing (param-tree parity across paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.layers import LayerNorm
from vit_ad_tpu.ops.pallas.layer_norm import (
    _xla_layer_norm,
    layer_norm,
    layer_norm_pallas,
    pallas_ln_viable,
)


def _params(rng, d):
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    return scale, bias


@pytest.mark.parametrize(
    "shape", [(2, 16, 196, 96), (4, 196, 768), (16, 8)]
)
def test_kernel_matches_xla_f32(rng, shape):
    scale, bias = _params(rng, shape[-1])
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    want = _xla_layer_norm(x, scale, bias, 1e-6)
    got = layer_norm_pallas(x, scale, bias, eps=1e-6, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
    )


def test_kernel_matches_xla_bf16_storage(rng):
    """bf16 in/out with f32 stats inside the kernel — the production
    configuration: outputs equal the f32 expression's bf16 cast exactly."""
    shape = (2, 8, 196, 96)
    scale, bias = _params(rng, 96)
    x = jnp.asarray(rng.normal(size=shape)).astype(jnp.bfloat16)
    want = _xla_layer_norm(x, scale, bias, 1e-6)
    got = layer_norm_pallas(x, scale, bias, eps=1e-6, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=1e-2,
        atol=1e-2,
    )


def test_row_tile_selection(rng):
    """rows = 6272 picks tile 128 (the largest divisor in the ladder); an
    explicit non-divisible row_tile is a contract violation the viability
    gate prevents — divisible explicit tiles agree with the default."""
    scale, bias = _params(rng, 32)
    x = jnp.asarray(rng.normal(size=(2, 16, 196, 32)).astype(np.float32))
    got_auto = layer_norm_pallas(x, scale, bias, interpret=True)
    got_64 = layer_norm_pallas(x, scale, bias, row_tile=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_auto), np.asarray(got_64))


def test_gradients_flow(rng):
    """custom VJP recomputes through XLA: grads match pure XLA autodiff."""
    scale, bias = _params(rng, 16)
    x = jnp.asarray(rng.normal(size=(4, 8, 16)).astype(np.float32))

    g_wrap = jax.grad(
        lambda *a: layer_norm(*a, 1e-6).sum(), argnums=(0, 1, 2)
    )(x, scale, bias)
    g_xla = jax.grad(
        lambda *a: _xla_layer_norm(*a, 1e-6).sum(), argnums=(0, 1, 2)
    )(x, scale, bias)
    for gw, gx in zip(g_wrap, g_xla):
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(gx), rtol=1e-5, atol=1e-5
        )


def test_viability_gate(monkeypatch):
    bf16 = DtypePolicy(compute_dtype=jnp.bfloat16)
    f32 = DtypePolicy(compute_dtype=jnp.float32)
    shape = (2, 16, 196, 96)

    # default off (no measured win banked yet at authoring time)
    monkeypatch.delenv("VITAD_PALLAS_LN", raising=False)
    assert not pallas_ln_viable(shape, bf16)

    monkeypatch.setenv("VITAD_PALLAS_LN", "1")
    import vit_ad_tpu.ops.pallas.window_attention as wa

    monkeypatch.setattr(wa, "_target_platform", lambda: "tpu")
    assert pallas_ln_viable(shape, bf16)
    assert not pallas_ln_viable(shape, f32)  # f32 keeps exact flax path
    assert not pallas_ln_viable((3, 7, 96), bf16)  # rows % 8 != 0

    monkeypatch.setenv("VITAD_PALLAS_LN", "0")
    assert not pallas_ln_viable(shape, bf16)


def test_module_param_tree_parity(rng, monkeypatch):
    """All three LayerNorm paths create the identical param tree
    (LayerNorm_0/{scale,bias}) so converters and checkpoints are
    path-independent; the bf16 A/B control stays within bf16 rounding of
    the exact path."""
    dtypes = DtypePolicy(compute_dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 196, 96))).astype(jnp.bfloat16)

    monkeypatch.delenv("VITAD_PALLAS_LN", raising=False)
    monkeypatch.delenv("VITAD_BF16_LN", raising=False)
    mod = LayerNorm(dtypes=dtypes)
    v_exact = mod.init(jax.random.PRNGKey(0), x)
    y_exact = mod.apply(v_exact, x)

    monkeypatch.setenv("VITAD_BF16_LN", "1")
    v_ctrl = mod.init(jax.random.PRNGKey(0), x)
    y_ctrl = mod.apply(v_ctrl, x)

    t_exact = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v_exact)
    t_ctrl = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v_ctrl)
    assert t_exact == t_ctrl
    assert y_ctrl.dtype == y_exact.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_ctrl, np.float32),
        np.asarray(y_exact, np.float32),
        rtol=3e-2,
        atol=3e-2,
    )
