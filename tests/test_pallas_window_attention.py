"""Pallas windowed-attention kernel vs the XLA core (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ad_tpu.ops import window_attention as wa
from vit_ad_tpu.ops.pallas.window_attention import window_attention_core_pallas


@pytest.mark.parametrize("shift", [0, 2])
def test_matches_xla_core(rng, shift):
    window, heads, hd = 4, 2, 8
    hp = wp = 8  # 2x2 windows
    n = window * window
    n_windows = (hp // window) * (wp // window)
    b = 3  # batch of images
    b_ = b * n_windows

    q = jnp.asarray(rng.normal(size=(b_, n, heads, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b_, n, heads, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b_, n, heads, hd)).astype(np.float32))
    bias_table = jnp.asarray(
        rng.normal(size=((2 * window - 1) ** 2, heads)).astype(np.float32) * 0.1
    )
    mask_np = wa.shift_attention_mask(hp, wp, window, shift)
    mask = None if mask_np is None else jnp.asarray(mask_np)

    want = wa.window_attention_core(
        q, k, v, bias_table, heads, (window, window), mask
    )
    got = window_attention_core_pallas(
        q, k, v, bias_table, heads, (window, window), mask, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shift", [0, 2])
def test_packed_kernel_matches_xla(rng, shift):
    """The packed-qkv kernel ([B_, N, 3C] blocks, deferred softmax
    division) must match the unpack+core XLA path, masked and unmasked."""
    from vit_ad_tpu.ops.pallas.window_attention import (
        _call_win,
        _xla_attention_windows,
        relative_position_index,
    )

    window, heads, hd = 4, 2, 8
    c = heads * hd
    hp, wp = 8, 12  # 2x3 windows
    n = window * window
    n_w = (hp // window) * (wp // window)
    b_ = 2 * n_w
    qkv3 = jnp.asarray(rng.normal(size=(b_, n, 3 * c)).astype(np.float32))
    bias_table = jnp.asarray(
        rng.normal(size=((2 * window - 1) ** 2, heads)).astype(np.float32) * 0.1
    )
    mask_np = wa.shift_attention_mask(hp, wp, window, shift)
    mask = None if mask_np is None else jnp.asarray(mask_np)

    want = _xla_attention_windows(qkv3, bias_table, heads, window, mask)

    idx = relative_position_index(window, window).reshape(-1)
    bias = jnp.transpose(
        bias_table[idx].reshape(n, n, heads), (2, 0, 1)
    ).astype(jnp.float32)
    got = _call_win(qkv3, bias, mask, heads,
                    1 if mask is None else n_w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_swin_attention_windows_gradients(rng):
    """The packed-windows custom VJP differentiates qkv and the bias
    table."""
    from vit_ad_tpu.ops.pallas.window_attention import (
        _xla_attention_windows,
        swin_attention_windows,
    )

    window, heads, hd = 2, 2, 4
    c = heads * hd
    qkv3 = jnp.asarray(rng.normal(size=(4, 4, 3 * c)).astype(np.float32))
    bt = jnp.asarray(
        rng.normal(size=((2 * window - 1) ** 2, heads)).astype(np.float32)
    )
    g1 = jax.grad(
        lambda t: jnp.sum(swin_attention_windows(t, bt, heads, window) ** 2)
    )(qkv3)
    g2 = jax.grad(
        lambda t: jnp.sum(
            _xla_attention_windows(t, bt, heads, window, None) ** 2
        )
    )(qkv3)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_vit_attention_matches_xla(rng):
    from vit_ad_tpu.ops.pallas.window_attention import vit_attention_pallas

    b, n, h, hd = 2, 10, 3, 8
    q = jnp.asarray(rng.normal(size=(b, n, h, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, h, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, h, hd)).astype(np.float32))
    got = vit_attention_pallas(q, k, v, interpret=True)
    attn = jax.nn.softmax(
        jnp.einsum("bnhd,bmhd->bhnm", q * hd**-0.5, k), axis=-1
    )
    want = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, h * hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_vit_attention_gradients(rng):
    """The custom-VJP wrapper must be differentiable and match XLA grads."""
    from vit_ad_tpu.ops.pallas.window_attention import (
        _xla_plain_attention,
        vit_attention,
    )

    b, n, h, hd = 1, 6, 2, 4
    q = jnp.asarray(rng.normal(size=(b, n, h, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, h, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, h, hd)).astype(np.float32))

    g1 = jax.grad(lambda q_: jnp.sum(vit_attention(q_, k, v) ** 2))(q)
    g2 = jax.grad(lambda q_: jnp.sum(_xla_plain_attention(q_, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_forced_wblk_indivisible_warns(monkeypatch):
    """A forced VITAD_SWIN_WBLK that cannot divide the geometry must warn
    (advisor r4: the old silent fallback made A/Bs measure the default
    while claiming the forced block), and still return the safe W_BLK=1."""
    import warnings

    from vit_ad_tpu.ops.pallas.window_attention import _choose_wblk

    monkeypatch.setenv("VITAD_SWIN_WBLK", "8")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        # masked: mask period 4 is not divisible by 8
        assert _choose_wblk(2048, 196, 96, 3, 4, True) == 1
    assert any("VITAD_SWIN_WBLK=8" in str(w.message) for w in caught)
    # divisible: honored, no warning
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert _choose_wblk(2048, 196, 96, 3, 16, True) == 8
    assert not caught
